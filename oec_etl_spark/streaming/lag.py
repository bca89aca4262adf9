"""Source-lag probe: how far behind the change log is this pipeline?

A tailing CDC job needs a backlog gauge — "how many segment files /
bytes / events are sitting in the watched directory that my checkpoint
has not yet applied" — for alerting and for sizing a catch-up run. The
reference has nothing comparable (each run rewrites wholesale); Kafka
deployments read consumer-group lag off the broker. For a file-source
stream the same signal lives entirely in metadata:

- the watched dir's current listing (one readdir + stat),
- the checkpoint's file-source log (``sources/0/<batchId>[.compact]``,
  JSON-lines of every file each batch discovered),
- the commit log (``commits/<batchId>``): a file only counts as
  processed if its batch actually COMMITTED — Structured Streaming
  writes the offsets/source log when a batch is *planned*, so after a
  mid-batch crash the failed batch's files are in the source log but
  will be reprocessed on resume; counting them as done would
  under-report lag exactly when it matters most.

No Spark job runs: pending-event estimates come from parquet footers
(pyarrow metadata read). Driver cost is O(files), the same order as the
stream's own directory listing.
"""

from __future__ import annotations

import glob
import json
import os
from urllib.parse import unquote, urlparse

from oec_etl_spark.config import EngineConfig

__all__ = ["source_lag"]


def _local_path(uri: str) -> str:
    """file:///x/y (as the source log records) -> /x/y; bare paths pass."""
    p = urlparse(uri)
    return unquote(p.path) if p.scheme else uri


def _last_committed_batch(checkpoint_dir: str) -> int:
    cdir = os.path.join(checkpoint_dir, "commits")
    if not os.path.isdir(cdir):
        return -1
    ids = [int(n) for n in os.listdir(cdir) if n.isdigit()]
    return max(ids, default=-1)


def _committed_files(checkpoint_dir: str) -> set[str]:
    """Paths whose discovering batch committed. Source-log batch files
    are named ``<batchId>`` (or ``<batchId>.compact`` — a rollup of all
    prior entries, each entry still carrying its original batchId)."""
    last = _last_committed_batch(checkpoint_dir)
    sdir = os.path.join(checkpoint_dir, "sources", "0")
    done: set[str] = set()
    if last < 0 or not os.path.isdir(sdir):
        return done
    for name in os.listdir(sdir):
        # only batch-id-named log files ("<n>" / "<n>.compact") — the
        # dir also holds Hadoop .crc checksum siblings (binary)
        if not name.removesuffix(".compact").isdigit():
            continue
        path = os.path.join(sdir, name)
        if not os.path.isfile(path):
            continue
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("v"):  # version header
                    continue
                try:
                    entry = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if entry.get("path") and entry.get("batchId", 0) <= last:
                    done.add(_local_path(entry["path"]))
    return done


def source_lag(cfg: EngineConfig) -> dict:
    """Backlog of the change log vs the checkpoint, from metadata only.

    Returns segment counts/bytes on disk vs committed, the pending file
    list (oldest first by mtime — the order the source will pick them
    up), pending bytes, and for parquet logs a pending-event count read
    from file footers (``pending_events`` is None for json segments —
    counting those would read data, not metadata).
    """
    from oec_etl_spark.streaming.engine import _resolve_source

    src_path, src_format = _resolve_source(cfg)
    ext = ".parquet" if src_format == "parquet" else ".json"
    on_disk = sorted(
        (f for f in glob.glob(os.path.join(src_path, f"*{ext}"))),
        key=lambda f: (os.path.getmtime(f), f),
    )
    done = _committed_files(cfg.checkpoint_dir)
    pending = [f for f in on_disk if os.path.abspath(f) not in done]
    pending_bytes = sum(os.path.getsize(f) for f in pending)
    pending_events = None
    if src_format == "parquet" and pending:
        import pyarrow.parquet as pq

        pending_events = sum(pq.ParquetFile(f).metadata.num_rows for f in pending)
    elif src_format == "parquet":
        pending_events = 0
    return {
        "source": src_path,
        "format": src_format,
        "last_committed_batch": _last_committed_batch(cfg.checkpoint_dir),
        "files_on_disk": len(on_disk),
        "files_committed": len(on_disk) - len(pending),
        "files_pending": len(pending),
        "bytes_pending": pending_bytes,
        "pending_events": pending_events,
        "pending_files": [os.path.basename(f) for f in pending],
    }
