"""Named change-feed subscriptions (consumer-group cursors).

`changelog()` gives the net diff between two snapshot versions; this
module adds the subscriber half: each downstream consumer keeps a
named cursor — the last snapshot version it has fully processed —
stored under the table root (`_cursors/<name>.json`) and advanced
atomically only on `ack`. Delivery is therefore **at-least-once**: a
consumer that crashes after reading but before acking sees the same
changes again, and because the feed is a *net* key-level diff (not a
raw event stream), re-applying it is idempotent for any keyed sink.

The reference's downstream consumption model is "re-run the whole
load and let ClickHouse replace the table"
(/root/reference/etl/trade_comtrade_monthly_pipeline.py:120-135);
a cursor on the CDF replaces that with O(changed keys) per pull.

Scale shape: a pull costs one key-bucketed diff of the two snapshot
states (co-located shuffle on the table's own bucket layout); cursor
state is a single JSON scalar per consumer, never data.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oec_etl_spark.streaming.sink import ParquetSnapshotSink


class ChangeFeedCursor:
    """One named consumer's position on one table's change feed."""

    def __init__(self, sink: ParquetSnapshotSink, name: str):
        if "/" in name or name.startswith("."):
            raise ValueError(f"bad cursor name {name!r}")
        self.sink = sink
        self.name = name

    # ------------------------------------------------------------ state
    def _path(self) -> str:
        return os.path.join(self.sink.root, "_cursors", f"{self.name}.json")

    def position(self) -> int | None:
        """Last acked snapshot version; None = brand-new consumer."""
        try:
            with open(self._path()) as f:
                return int(json.load(f)["version"])
        except FileNotFoundError:
            return None

    def ack(self, version: int) -> None:
        """Atomically advance the cursor to ``version`` — call only
        after the delivered changes are durably applied downstream.
        Never moves backwards (a stale duplicate ack is a no-op)."""
        cur = self.position()
        if cur is not None and version <= cur:
            return
        path = self._path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": int(version)}, f)
        os.replace(tmp, path)

    # ------------------------------------------------------------- read
    def read(self, pre_post: bool = False) -> tuple[DataFrame, int]:
        """(changes since the cursor, head version to ack). A new
        cursor bootstraps with the full current state as inserts; a
        cursor at head gets an empty frame (head unchanged, nothing to
        ack). The frame's shape matches ``sink.changelog``:
        payload columns + ``_change_type``."""
        man = self.sink.load_manifest()
        if man is None:
            raise FileNotFoundError(f"no committed snapshot under {self.sink.root}")
        head = int(man["version"])
        pos = self.position()
        if pos is None:
            snap = self.sink.read_table(version=head)
            return snap.withColumn("_change_type", F.lit("insert")), head
        if pos >= head:
            empty = self.sink.read_table(version=head).limit(0)
            return empty.withColumn("_change_type", F.lit("insert")).limit(0), head
        return self.sink.changelog(pos, head, pre_post=pre_post), head

    def deliver_to(self, out_dir: str, pre_post: bool = False) -> dict:
        """Pull-and-ack into a parquet directory sink: write the new
        changes under ``out_dir/v{head}/``, then ack. The write lands
        BEFORE the ack, so a crash between them redelivers into the
        same version-named dir (overwrite = idempotent). Returns
        ``{cursor, from, to, rows}``."""
        pos = self.position()
        changes, head = self.read(pre_post=pre_post)
        rows = 0
        if pos is None or head > pos:
            dest = os.path.join(out_dir, f"v{head:06d}")
            changes = changes.cache()
            rows = changes.count()
            changes.write.mode("overwrite").parquet(dest)
            changes.unpersist()
            self.ack(head)
        return {"cursor": self.name, "from": pos, "to": head, "rows": rows}


def cursors(sink: ParquetSnapshotSink) -> dict[str, int]:
    """name → acked version for every cursor on the table."""
    cdir = os.path.join(sink.root, "_cursors")
    if not os.path.isdir(cdir):
        return {}
    out = {}
    for fn in sorted(os.listdir(cdir)):
        if fn.endswith(".json"):
            with open(os.path.join(cdir, fn)) as f:
                out[fn[: -len(".json")]] = int(json.load(f)["version"])
    return out
