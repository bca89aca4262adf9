"""Per-batch lineage & metrics.

Every micro-batch commit records: source offset range (min/max seq and
source files), rows seen / applied / stale (lost LWW to an existing
row) / quarantined, per-bucket applied-seq watermarks, and wall time.
Records are embedded in the snapshot manifest (so they commit
atomically with the data) and appended to a JSONL log for operators.

Counters are collected with ``pyspark.sql.Observation`` on the merge
plan itself — zero extra passes over the data.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field


@dataclass
class BatchLineage:
    batch_id: int
    rows_in_batch: int = 0
    rows_quarantined: int = 0
    distinct_keys: int = 0
    rows_applied: int = 0  # batch winners that became the stored row
    rows_stale: int = 0  # batch winners that lost to the existing row
    rows_deleted: int = 0  # tombstones now current
    rows_patch: int = 0  # op='P' partial-update rows in the batch
    # patch rows discarded: key unknown to the table (orphan) or its
    # full-row winner is a delete (no resurrection by patch)
    rows_patch_dropped: int = 0
    rows_snapshot: int = 0  # op='R' snapshot-read bootstrap rows in the batch
    # R keys that became rows (were absent); the rest lost to existing
    # data — a snapshot read never overwrites anything
    rows_snapshot_applied: int = 0
    rows_truncate_events: int = 0  # op='T' rows in the batch
    # rows DLQ'd as 'neardup' by the ingest-time suppression gate
    # (EngineConfig.neardup_gate) — also included in rows_quarantined
    # when a quarantine_dir is configured
    rows_neardup: int = 0
    # transaction gate (EngineConfig.transactional) — batch-scoped, so
    # identical across a fan-out batch's route records:
    rows_tx: int = 0  # tx-carrying rows that arrived in this batch
    rows_tx_held: int = 0  # rows pending (incomplete txs) after this batch
    txs_pending: int = 0  # distinct incomplete transactions held
    rows_tx_expired: int = 0  # rows DLQ'd as tx_timeout this batch
    txs_released: int = 0  # transactions whose hold ended this batch
    # table truncate horizon (epoch µs) in force after this commit;
    # rows with ts <= horizon are dead regardless of arrival time
    truncate_ts_us: int | None = None
    seq_min: int | None = None
    seq_max: int | None = None
    source_files: list[str] = field(default_factory=list)
    affected_buckets: list[int] = field(default_factory=list)
    hot_keys: list[dict] = field(default_factory=list)  # [{conv_id, cnt, frac}] over threshold
    salted: bool = False  # two-stage salted reduce used for this batch
    table_mode: str = "cow"  # cow: merged against stored; mor: appended as delta
    # LWW plan actually used: "hash" | "sort" (auto-falls back to sort
    # when the batch lacks row-unique source_file/offset lineage)
    merge_strategy: str | None = None
    watermarks: dict[str, int] = field(default_factory=dict)  # bucket -> applied seq high
    # buckets the streaming loop's housekeeping compacted right after
    # this batch's commit (mor + compact_after_deltas policy); the
    # compaction is its own snapshot version
    compacted_buckets: list[int] = field(default_factory=list)
    skipped_as_committed: bool = False
    route: str | None = None  # fan-out target name (cfg.routes), None = single target
    # rows this batch that matched NO route predicate and were dropped
    # because no '*' catch-all is declared (batch-scoped: identical
    # across the batch's route records; 0 whenever '*' exists)
    rows_unrouted: int = 0
    # opt-in batch quality profile (sink profile=True): per payload
    # column, NULL count among this batch's UPSERT rows (tombstones
    # excluded — their payload is NULL by design). A null-rate spike is
    # the classic upstream-extractor-broke signal.
    column_nulls: dict[str, int] | None = None
    wall_sec: float = 0.0
    committed_at: float = field(default_factory=time.time)

    def to_dict(self) -> dict:
        return asdict(self)


def append_jsonl(path: str, record: dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(record, default=str) + "\n")
