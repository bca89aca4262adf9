"""Engine configuration.

Replaces the reference's conns.yaml + per-pipeline constants
(/root/reference/etl/conns.yaml, /root/reference/etl/trade_comtrade_monthly_pipeline.py:120-135)
with one typed config object.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    """All knobs for one CDC replay job."""

    changes_dir: str  # directory of change-log segment files (parquet)
    target_dir: str  # snapshot-sink root (or Iceberg table ident)
    checkpoint_dir: str  # Structured Streaming checkpointLocation
    n_buckets: int = 16  # conv_id hash buckets in the target layout
    max_files_per_trigger: int | None = None  # None => AvailableNow single batch
    # Continuous tail mode (engine.start_tail): micro-batch cadence for
    # the processingTime trigger. Backfill (run_replay) always uses
    # Trigger.AvailableNow and ignores this.
    processing_interval: str = "1 second"
    # Hot-key handling: a conv_id whose share of a batch exceeds
    # hot_key_threshold (fraction of batch rows) is salted across
    # hot_key_salt sub-partitions for the reduce shuffle.
    hot_key_threshold: float = 0.05
    hot_key_salt: int = 8
    merge_strategy: str = "hash"  # LWW reduce plan: "hash" (slim agg + winner join) | "sort" (max_by)
    # Sub-bucket write fan-out (Iceberg target-file-size analog): with
    # k > 1 every snapshot/delta/compaction write spreads each bucket's
    # rows over ~k tasks (and so ~k files) via a second, independent
    # conv_id hash. Lifts the one-write-task-per-bucket ceiling — at
    # 10^10 rows a bucket's base is tens of GB, far too big for a
    # single task to sort/write (or for compaction to rewrite) alone.
    # A conversation still lands wholly in one file; readers glob the
    # bucket dir and are unaffected, so this is a pure write-side knob.
    files_per_bucket: int = 1
    # Per-file conv_id BLOOM FILTERS in the zone-map sidecars (Iceberg
    # write.bloom-filter analog, readable without opening the file).
    # Bits per file (e.g. 16384 ≈ 2 KiB ≈ 8 bits/key at 2K convs/file
    # → ~2% false-admit rate). Prunes point lookups by membership where
    # the [key_min, key_max] range check is blind: hash-fanned-out
    # sub-files and MOR delta files all span the keyspace. Costs one
    # extra conv_id-only columnar scan of each written version dir.
    # None = off; safe to enable/disable mid-table (readers fall back).
    key_bloom_bits: int | None = None
    # WRITE ORDERED BY analog: physically sort each written data file by
    # (conv_id, turn_idx). Better compression + sequential turn reads at
    # the cost of a per-task sort of the batch winners on every commit.
    write_sorted: bool = False
    table_mode: str = "cow"  # target layout: "cow" (rewrite touched buckets) | "mor" (delta append + compaction)
    # mor only: compact a bucket inside the streaming loop once it has
    # accumulated this many delta files (None = manual compact() only).
    compact_after_deltas: int | None = None
    # mor only: MINOR-compact a bucket inside the streaming loop once it
    # has this many delta files — folds them into one at O(deltas) cost,
    # never touching the base. The cheap steady-state alternative to
    # compact_after_deltas (which majors: rewrites base ∪ deltas);
    # setting both is rejected — after a minor fold the delta count
    # drops to 1, so a count-based major trigger would never fire.
    minor_compact_after: int | None = None
    # Event-time TTL retention inside the streaming loop: after each
    # commit, advance the table's truncate horizon to
    # (max event ts seen) - ttl_seconds. Anchored to EVENT time, never
    # the wall clock, so a replay of the same log produces the same
    # horizons (deterministic, checkpoint-safe). The advance is an O(1)
    # metadata truncate (rows under the horizon die logically; the next
    # compaction reclaims space); ttl_advance_s throttles how often a
    # new snapshot version is cut for it (advance only when the horizon
    # would move at least this much — long tails otherwise mint one
    # truncate version per batch). None = no TTL.
    ttl_seconds: float | None = None
    ttl_advance_s: float = 0.0
    # Snapshot retention inside the streaming loop: after each commit,
    # expire all but the newest N snapshots (None = keep everything /
    # manual expire_snapshots() only). Long-running tails need this or
    # the manifest chain and superseded data versions grow unboundedly.
    expire_keep_last: int | None = None
    # Upstream redelivery dedup (streaming paths only): when set, exact
    # redeliveries — same (conv_id, turn_idx, seq) — are dropped BEFORE
    # the merge via dropDuplicatesWithinWatermark, with dedup state
    # bounded by this event-time horizon. The merge is idempotent either
    # way; this knob trades a little dedup state for not shuffling a
    # duplicate-heavy log's redundant payload rows at all. MUST be ≥ the
    # transport's delivery-disorder bound: an event arriving later than
    # the watermark is dropped as late (standard watermark semantics).
    # Null-ts events bypass dedup and flow to the merge untouched.
    dedup_watermark: str | None = None
    # Transaction-boundary gate (Debezium transaction-metadata analog):
    # when True the stream is read with CHANGE_SCHEMA_TX (tx_id,
    # tx_total appended; non-transactional segments read them as NULL =
    # autocommit) and a transaction's events are applied ATOMICALLY —
    # held in a per-batch state store under target_dir/_tx_state until
    # countDistinct(seq) reaches tx_total, so no snapshot ever shows a
    # torn transaction even when its events straddle micro-batches.
    # Released tx ids are remembered for tx_ledger_batches batches so
    # at-least-once redeliveries of released events flow straight to
    # the idempotent merge instead of forming ghost incomplete txs.
    transactional: bool = False
    # Expire a transaction still incomplete this many batches after its
    # first event arrived: its fragment goes to the DLQ with reason
    # 'tx_timeout' (never force-applied torn). None = hold forever.
    tx_timeout_batches: int | None = None
    tx_ledger_batches: int = 32
    # Change-stream fan-out (Debezium-style table routing): name →
    # boolean SQL predicate over the change columns. Each route merges
    # into its own snapshot table under ``target_dir/<name>``, each with
    # its own committed-batch epoch guard — a crash after route A
    # committed but before route B restarts the batch, A skips it as
    # committed, B applies it: exactly-once per target. Routes may
    # overlap (a row can feed several targets); rows matching no route
    # are counted per batch and dropped (route '*' catches the rest).
    routes: dict[str, str] | None = None
    # Write-audit-publish staging: when set, every merge commits to this
    # branch ref instead of main (create it first with create_branch /
    # the CLI `branch` command). Main readers see nothing until
    # `publish`; a failed audit drops the branch and the same
    # checkpointed replay can re-stage onto a fresh one. Ignored by
    # routed fan-out (each route is its own table; branch them
    # individually).
    branch: str | None = None
    # Merge-time CHECK constraints (Delta table-constraints analog):
    # name → boolean SQL predicate over the change columns. A change
    # row failing any predicate (FALSE or NULL) is diverted to the
    # quarantine side output tagged with the constraint's name in
    # ``__reject`` and never merged. Deletes are exempt (tombstones
    # carry NULL payload by design). Evaluated as one codegen'd CASE
    # inside the existing quarantine pass — zero extra scans.
    constraints: dict[str, str] | None = None
    # Pre-merge declarative transforms (the reference's per-column
    # pandas steps as an in-loop stage): column name → SQL expression
    # over the change columns, applied to VALID rows after the
    # quarantine/constraint pass and before the merge. A name may
    # overwrite an existing payload column (recode) or add a new one
    # (schema evolution picks it up); later entries may reference
    # earlier ones (applied in dict order). Keys, LWW-order columns and
    # the envelope (conv_id, turn_idx, ts, op, seq, source_file,
    # offset) are protected — deriving them would change merge
    # identity/ordering. Tombstones flow through unchanged in effect:
    # their payload is never read. All exprs are codegen'd Columns —
    # zero per-row Python.
    derives: dict[str, str] | None = None
    # In-loop stream-static enrichment (the reference's load-time dim
    # joins as a streaming stage): a small dimension table broadcast-
    # joined (left) onto valid change rows AFTER derives (so a derived
    # column can be the join key) and before the merge:
    #   {"path": parquet dir, "key": change column,
    #    "dim_key": dim column (default = key),
    #    "select": {out_col: dim_col, ...}}
    # The dim must be unique on dim_key — a fanning join would
    # duplicate change rows and break merge row-uniqueness, so the
    # engine verifies uniqueness once at stream build (one tiny agg
    # over the broadcast-sized dim) and refuses otherwise. Added
    # columns flow into the table via normal schema evolution;
    # unmatched rows get NULLs. Zero shuffle: the dim broadcasts.
    enrich: dict | None = None
    quarantine_dir: str | None = None  # malformed-record side output
    lineage_path: str | None = None  # JSONL lineage log (defaults inside target)
    # Trigger-level metrics feed (StreamingQueryProgress subset as
    # JSONL): rows/sec, per-trigger latency breakdown, source offset
    # ranges — the Spark-side view the lineage log can't see. Opt-in.
    metrics_path: str | None = None
    # In-loop binlog retention (streaming-loop policy, like the
    # compaction/expiry policies): after each batch commit, move change
    # segments whose discovering batch COMMITTED into this directory
    # (see streaming/lag.py archive_committed). Inherently safe inside
    # the loop: when batch N's foreachBatch runs, the commit log only
    # reaches N-1, so the in-flight batch's files can never move; the
    # file source tracks seen paths and never re-lists archived ones.
    # With routed fan-out the commit covers ALL routes, so a mid-batch
    # crash (route A committed, B not) still leaves the files in place
    # for the resume. None = no retention (or use the `archive` CLI).
    archive_dir: str | None = None
    # extra mtime guard for archive_dir (seconds; 0 = age-exempt)
    archive_older_than_s: float = 0.0
    # Opt-in per-batch data-quality profile: per payload column, NULL
    # count among the batch's upsert rows (tombstones excluded),
    # recorded in each batch's lineage (`column_nulls`) and summed by
    # the `stats` CLI. Costs one extra O(batch) aggregate per merge —
    # explicit, off by default.
    profile: bool = False
    # Materialized views kept current INSIDE the streaming loop: each
    # entry {"path": dir, "group_keys": [...], "sum_exprs": {name: SQL}}
    # is refreshed right after every batch commit (O(changed keys) per
    # refresh — see streaming/mview.py). A crash between commit and
    # refresh is harmless: the next refresh diffs across both versions.
    # Ignored under routed fan-out (each route is its own table; refresh
    # its views with the standalone CLI/mview API).
    mviews: list[dict] | None = None
    # Derived INDEXES kept current inside the loop, same contract as
    # mviews (built on first sight, O(changed-keys) refresh per commit,
    # crash-safe by refresh idempotence). Entries:
    #   {"kind": "ivf", "path": dir, "centroids": [[id, [floats]], ...],
    #    "embed_expr": SQL-> array<double>}            (streaming/ann_index.py)
    #   {"kind": "minhash", "path": dir, ["text_expr": SQL,
    #    "n_minhash": 8, "n_bands": 4, "shingle_len": 12]}  (streaming/dedup_index.py)
    indexes: list[dict] | None = None
    # Ingest-time near-duplicate suppression (streaming/neardup_gate.py):
    # probe the declared MinHash index before each merge; full-content
    # rows (I/U/R) whose text near-matches a DIFFERENT already-ingested
    # key — or an earlier same-batch row — are DLQ'd as 'neardup'.
    #   {"index_path": <path of a kind='minhash' indexes entry>,
    #    "threshold": 0.5, "max_shingle_df": 50, "within_batch": True}
    # Requires the index in `indexes` (the post-merge sync contract);
    # incompatible with routed fan-out (one gate = one table).
    neardup_gate: dict | None = None
    format: str = "parquet"  # change-log segment format: parquet|json
    # Declarative source binding (connectors.py, the conns.yaml analog):
    # when set, `changes_dir` is a connector NAME in this registry file;
    # its <param> placeholders bind from `source_params`, and its driver
    # overrides `format`.
    connectors_path: str | None = None
    source_params: dict[str, str] = field(default_factory=dict)
    extra_spark_conf: dict[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.compact_after_deltas and self.minor_compact_after:
            raise ValueError(
                "set compact_after_deltas (major) OR minor_compact_after "
                "(minor), not both — a minor fold drops the delta count to "
                "1, so a count-based major trigger would never fire"
            )
        if self.neardup_gate and self.routes:
            raise ValueError(
                "neardup_gate is incompatible with routed fan-out: the gate "
                "probes ONE table's index; gate each route's table with its "
                "own single-target pipeline"
            )
