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

__all__ = ["archive_committed", "source_lag"]


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

    src_path, src_format, _opts = _resolve_source(cfg)
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


def archive_committed(cfg: EngineConfig, dest_dir: str | None = None,
                      older_than_s: float = 0.0) -> dict:
    """Binlog retention: move (or with ``dest_dir=None`` delete) change
    segments whose discovering batch COMMITTED out of the watched dir.

    A tailed directory otherwise grows forever — the upstream producer
    appends segments and nothing ever reclaims them (Kafka solves this
    broker-side with retention.ms; a file binlog needs the consumer to
    do it, because only the consumer's commit log knows what is safe).
    Safety properties:

    - only files present in the checkpoint's source log with
      ``batchId <= last committed batch`` move — a pending file, or one
      planned into a batch that crashed before committing, stays put
      and will be (re)processed;
    - the streaming source is unaffected by the move: Structured
      Streaming's file source tracks *seen paths* in its own log and
      never re-lists a processed file, so resuming the same checkpoint
      after archiving continues exactly where it left off;
    - ``older_than_s`` adds an mtime guard (default 0 = age-exempt) for
      belt-and-braces overlap with producers that rewrite a segment in
      place after publishing it (ours never do).

    Returns counts + the archived file names. Idempotent: a second call
    finds nothing left to move.
    """
    from oec_etl_spark.streaming.engine import _resolve_source

    src_path, src_format, _opts = _resolve_source(cfg)
    ext = ".parquet" if src_format == "parquet" else ".json"
    done = _committed_files(cfg.checkpoint_dir)
    now = __import__("time").time()
    moved, kept = [], 0
    for f in sorted(glob.glob(os.path.join(src_path, f"*{ext}"))):
        if os.path.abspath(f) not in done or (
            older_than_s and now - os.path.getmtime(f) < older_than_s
        ):
            kept += 1
            continue
        if dest_dir is None:
            os.remove(f)
        else:
            os.makedirs(dest_dir, exist_ok=True)
            os.replace(f, os.path.join(dest_dir, os.path.basename(f)))
        moved.append(os.path.basename(f))
    return {
        "archived": len(moved),
        "kept": kept,
        "dest": dest_dir,
        "archived_files": moved,
    }
