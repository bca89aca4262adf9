"""Persisted materialized views, incrementally maintained off the CDF.

The canonical downstream of a CDC table: an aggregate (counts +
additive measures per group) that must stay current as the base table
absorbs inserts/updates/deletes — WITHOUT rescanning the base on every
refresh. ``operators/ivm.py`` supplies the algebra (signed pre/post
feed → one small delta → full-outer merge); this module adds what makes
it a *view*: persistent state with its own version chain, an atomic
manifest recording exactly which base snapshot the state reflects, and
a ``refresh()`` that is a no-op when the base hasn't moved and exact
after any number of base commits (including rollbacks, which are just
another version to diff against).

Refresh cost shape at 10^10 rows: the first build is one full
aggregate; every refresh after that is O(|changed keys|) — the CDF
diff runs on the base's co-located bucket layout, the signed delta is
one small groupBy, and the merge joins it against state on the group
keys. Neither the base table nor the whole view is rewritten per
refresh beyond the (group-count-sized) state parquet.

Measures are declared as SQL expressions over the base's payload
columns (e.g. ``{"chars": "length(text)"}``) and must be additive —
sums survive retract/add exactly; min/max/distinct do not (use the
sketches module or recompute for those).

Reference parity: the reference's consumers query ClickHouse rollup
tables it fully reloads each run; this is that surface rebuilt as an
exact incremental consumer of the change feed (new-engine category,
SURVEY §2.4/2.5).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from oec_etl_spark.operators import ivm
from oec_etl_spark.streaming.sink import ParquetSnapshotSink


class ViewSpecMismatch(ValueError):
    """The on-disk view was created with different keys/measures than
    this handle — refuse to mix two view identities in one directory."""


class MaterializedView:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        group_keys: list[str],
        sum_exprs: dict[str, str] | None = None,
        count_col: str = "n",
    ):
        self.spark = spark
        self.path = path
        self.group_keys = list(group_keys)
        self.sum_exprs = dict(sum_exprs or {})
        self.count_col = count_col
        os.makedirs(path, exist_ok=True)

    # ------------------------------------------------------------ state
    def _manifest_path(self) -> str:
        return os.path.join(self.path, "MANIFEST.json")

    def _load_manifest(self) -> dict | None:
        p = self._manifest_path()
        if not os.path.exists(p):
            return None
        with open(p) as f:
            man = json.load(f)
        if (
            man["group_keys"] != self.group_keys
            or man["sum_exprs"] != self.sum_exprs
            or man["count_col"] != self.count_col
        ):
            raise ViewSpecMismatch(
                f"view at {self.path} was created with keys={man['group_keys']} "
                f"sum_exprs={man['sum_exprs']}; this handle declares "
                f"keys={self.group_keys} sum_exprs={self.sum_exprs}"
            )
        return man

    def _commit(self, state: DataFrame, base_version: int, prev: dict | None) -> dict:
        """Write the new state dir, then atomically swap the manifest —
        same write-then-publish shape as the sink, so a crashed refresh
        leaves the previous state fully readable and the next refresh
        simply redoes the same (idempotent) diff."""
        view_version = (prev["view_version"] + 1) if prev else 1
        vdir = f"state/v{view_version:06d}"
        # state is group-count-sized (keys + a few longs); one file is
        # the right layout far past 10^7 groups, and repartition (not
        # coalesce) keeps the upstream merge join parallel. A view with
        # truly huge group cardinality should key its own snapshot sink
        # instead of an aggregate file.
        state.repartition(1).write.mode("overwrite").parquet(os.path.join(self.path, vdir))
        man = {
            "view_version": view_version,
            "base_version": int(base_version),
            "state_dir": vdir,
            "group_keys": self.group_keys,
            "sum_exprs": self.sum_exprs,
            "count_col": self.count_col,
        }
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, self._manifest_path())
        # keep the previous state for readers that loaded the old
        # manifest a moment ago; reclaim everything older
        sroot = os.path.join(self.path, "state")
        keep = {f"v{view_version:06d}", f"v{view_version - 1:06d}"}
        for d in sorted(os.listdir(sroot)):
            if d not in keep:
                shutil.rmtree(os.path.join(sroot, d))
        return man

    # ------------------------------------------------------------- read
    def read(self) -> DataFrame:
        man = self._load_manifest()
        if man is None:
            raise FileNotFoundError(f"no materialized state under {self.path} — refresh() first")
        return self.spark.read.parquet(os.path.join(self.path, man["state_dir"]))

    # ---------------------------------------------------------- refresh
    def _with_measures(self, df: DataFrame) -> DataFrame:
        for name, expr in self.sum_exprs.items():
            df = df.withColumn(name, F.expr(expr))
        return df

    def refresh(self, sink: ParquetSnapshotSink) -> dict:
        """Bring the view up to the sink's current head. Returns a
        lineage dict: mode full|incremental|noop, the base version range
        applied, and the state row count."""
        base_man = sink.load_manifest()
        if base_man is None:
            raise FileNotFoundError(f"no committed snapshot under {sink.root}")
        head = int(base_man["version"])
        man = self._load_manifest()
        sum_cols = list(self.sum_exprs)

        if man is None:
            base = self._with_measures(sink.read_table(version=head))
            aggs = [F.count(F.lit(1)).alias(self.count_col)]
            aggs += [F.sum(c).alias(c) for c in sum_cols]
            state = base.groupBy(*self.group_keys).agg(*aggs)
            new_man = self._commit(state, head, None)
            return {"mode": "full", "base_from": None, "base_to": head,
                    "view_version": new_man["view_version"],
                    "groups": self.read().count()}

        last = int(man["base_version"])
        if last == head:
            return {"mode": "noop", "base_from": last, "base_to": head,
                    "view_version": man["view_version"],
                    "groups": self.read().count()}

        feed = self._with_measures(sink.changelog(last, head, pre_post=True))
        state = ivm.maintain(
            self.read(), feed, self.group_keys, sum_cols=sum_cols, count_col=self.count_col
        )
        new_man = self._commit(state, head, man)
        return {"mode": "incremental", "base_from": last, "base_to": head,
                "view_version": new_man["view_version"],
                "groups": self.read().count()}
