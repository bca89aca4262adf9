"""Trigger-level metrics: a `StreamingQueryListener` that appends one
JSON line per completed micro-batch to a metrics log.

The engine's lineage log (`BatchLineage`) records MERGE semantics —
rows applied/stale/deleted, watermarks, hot keys. What it cannot see is
the Spark-side latency breakdown of the trigger itself: where the wall
time went (`addBatch` = our foreachBatch body, `latestOffset` /
`walCommit` = source bookkeeping), the source→sink rows/sec, and the
backlog signal (`numInputRows` vs trigger interval). Operating an
unattended 10^10-event tail needs both views; this listener supplies
the second from Spark's own `StreamingQueryProgress`, off the query
thread, with no impact on the plan.

The reference has no metrics surface at all — its pipelines print
counts to stdout (`/root/reference/etl/trade_comtrade_monthly_pipeline.py`);
an always-on CDC ingest replaces that with a machine-readable feed a
monitor can tail.

Scale shape: pure driver-side metadata (one dict per trigger delivered
on the listener bus); zero executor work, zero extra actions.
"""

from __future__ import annotations

import json
import os
import threading

from pyspark.sql.streaming import StreamingQueryListener

from oec_etl_spark.streaming.lineage import append_jsonl


class ProgressLogger(StreamingQueryListener):
    """Append one JSON line per completed trigger to ``path``.

    Listener callbacks arrive on Spark's listener-bus thread, possibly
    after the query object is already stopped — the lock keeps lines
    whole if several queries share one logger. Fields are a stable
    subset of ``StreamingQueryProgress`` (everything a throughput /
    latency monitor needs) rather than the raw blob, so downstream
    parsers don't break when Spark adds fields."""

    def __init__(self, path: str):
        self.path = path
        self._lock = threading.Lock()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    # -- StreamingQueryListener interface --------------------------------
    def onQueryStarted(self, event) -> None:
        self._write({"event": "started", "query_id": str(event.id), "run_id": str(event.runId)})

    def onQueryProgress(self, event) -> None:
        p = json.loads(event.progress.json)
        self._write(
            {
                "event": "progress",
                "query_id": p.get("id"),
                "run_id": p.get("runId"),
                "batch_id": p.get("batchId"),
                "timestamp": p.get("timestamp"),
                "num_input_rows": p.get("numInputRows"),
                "input_rows_per_sec": p.get("inputRowsPerSecond"),
                "processed_rows_per_sec": p.get("processedRowsPerSecond"),
                # where the trigger's wall time went, in ms
                "duration_ms": p.get("durationMs", {}),
                "sources": [
                    {
                        "description": s.get("description"),
                        "start_offset": s.get("startOffset"),
                        "end_offset": s.get("endOffset"),
                        "num_input_rows": s.get("numInputRows"),
                    }
                    for s in p.get("sources", [])
                ],
            }
        )

    def onQueryIdle(self, event) -> None:  # tail between file drops
        self._write({"event": "idle", "query_id": str(event.id), "run_id": str(event.runId)})

    def onQueryTerminated(self, event) -> None:
        self._write(
            {
                "event": "terminated",
                "query_id": str(event.id),
                "run_id": str(event.runId),
                "exception": event.exception,
            }
        )

    def _write(self, record: dict) -> None:
        with self._lock:
            append_jsonl(self.path, record)


def read_progress(path: str) -> list[dict]:
    """Parse a metrics log back into dicts (monitor/test helper)."""
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
