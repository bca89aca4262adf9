"""The CDC engine loop: change-log tail → quarantine split → MERGE apply.

Replaces the reference's param-grid re-run drivers
(/root/reference/etl/trade_comtrade_monthly_pipeline.py:120-135 and the six
other backfill loops, SURVEY.md §2 S10) with ONE Structured Streaming
query:

  readStream(segment dir, explicit CHANGE_SCHEMA)
    → malformed-event quarantine (side output)
    → foreachBatch( ParquetSnapshotSink.merge )   # LWW MERGE upsert

- Backfill = ``Trigger.AvailableNow`` (+ ``maxFilesPerTrigger`` to get
  bounded micro-batches); tail = a processingTime trigger on the same
  query. Offsets live in ``checkpointLocation`` — a restarted query
  resumes exactly where it stopped; a re-delivered epoch is skipped by
  the sink's committed-batch guard (exactly-once end to end).
- Source-side schema reconciliation is free: the stream is read with
  the *evolved* explicit schema, so epoch-1 segments that predate the
  `tool` column parse with NULLs; target-side evolution (new columns
  appearing later) is handled inside the sink via `evolve_schema`.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.schemas import CHANGE_SCHEMA
from oec_etl_spark.streaming.lineage import BatchLineage, append_jsonl
from oec_etl_spark.streaming.sink import ParquetSnapshotSink

VALID_OPS = ("I", "U", "D", "P", "R", "T")


def _any(cols) -> F.Column:
    out = F.lit(False)
    for c in cols:
        out = out | c
    return out


def _index_view(spark: SparkSession, spec: dict):
    """Instantiate a declared derived index (EngineConfig.indexes)."""
    kind = spec.get("kind")
    if kind == "ivf":
        from oec_etl_spark.streaming.ann_index import IvfIndexView

        return IvfIndexView(
            spark, spec["path"],
            centroids=[(int(i), list(v)) for i, v in spec["centroids"]],
            embed_expr=spec["embed_expr"],
        )
    if kind == "minhash":
        from oec_etl_spark.streaming.dedup_index import MinHashIndexView

        return MinHashIndexView(
            spark, spec["path"],
            text_expr=spec.get("text_expr", "coalesce(text, '')"),
            n_minhash=int(spec.get("n_minhash", 8)),
            n_bands=int(spec.get("n_bands", 4)),
            shingle_len=int(spec.get("shingle_len", 12)),
        )
    raise ValueError(f"unknown index kind {kind!r} (expected 'ivf' or 'minhash')")


def _resolve_source(cfg: EngineConfig) -> tuple[str, str, dict[str, str]]:
    """(path, format, reader options) of the change log. With
    ``cfg.connectors_path`` set, ``changes_dir`` is a connector NAME
    resolved through the declarative registry (conns.yaml analog) with
    ``source_params`` bound into its <param> slots; otherwise it is a
    bare path (no extra options). Connector reader options (header/sep/
    encoding quirks, S3) are forwarded so the engine parses a staged
    csv exactly like ``Connector.read`` would — previously they were
    dropped and a header row replayed as a quarantined malformed row.
    The http payload-format default is 'csv', matching
    ``Connector.read``/``read_stream`` (the two disagreed: engine said
    parquet, connector said csv)."""
    if cfg.connectors_path:
        from oec_etl_spark.connectors import _HTTP_OPTS, fetch

        conn = fetch(cfg.changes_dir, cfg.connectors_path)
        if conn.driver == "http":
            # stage (cache-if-exists, atomic) and tail the staged
            # copy's per-URL directory with the connector's declared
            # payload format
            import os as _os

            staged = conn.stage(cfg.source_params)
            opts = {k: v for k, v in conn.options.items() if k not in _HTTP_OPTS}
            return _os.path.dirname(staged), conn.options.get("format", "csv"), opts
        return conn.resolve(cfg.source_params), conn.driver, dict(conn.options)
    return cfg.changes_dir, cfg.format, {}


def quarantine_split(
    df: DataFrame, constraints: dict[str, str] | None = None
) -> tuple[DataFrame, DataFrame]:
    """(valid, rejected). Rejected rows carry a ``__reject`` column
    naming the first failing rule — the engine's DLQ with reason
    attribution, vs the reference's silent try/except-to-zero
    (/root/reference/etl/countries/sweden/trade_monthly_pipeline.py:80-85).

    Rules, in order: the built-in envelope check (unknown op / null
    key → ``malformed``), then each declared CHECK constraint (Delta
    table-constraints analog) — name → boolean SQL predicate over the
    change columns. A predicate evaluating FALSE **or NULL** rejects
    the row (SQL CHECK semantics would admit NULL; a data gate must
    not let an unparseable row through on a technicality). Deletes
    are exempt from constraints: a tombstone carries NULL payload by
    design and must not be blocked by payload rules. Patches (op 'P')
    carry only the columns they set, so for them a NULL predicate is
    TOLERATED (the rule touches a column the patch doesn't carry) and
    only a definite FALSE rejects. Truncates (op 'T') are table-wide:
    they carry no key and no payload, so the envelope requires only a
    non-null ts (the horizon) and constraints are exempt as for
    deletes. Snapshot reads (op 'R') are full rows and face the full
    gate. One codegen'd CASE over one scan — no per-rule passes."""
    # coalesce: op NULL makes isin() three-valued NULL, and NOT NULL is
    # still NULL — without it a null-op row with valid keys slips past
    # the WHEN and through the gate (the docstring's "unknown op / null
    # key -> malformed" contract requires rejection).
    ok = F.coalesce(
        F.col("op").isin(*VALID_OPS)
        & F.when(
            F.col("op") == "T", F.col("ts").isNotNull() & F.col("seq").isNotNull()
        ).otherwise(
            F.col("conv_id").isNotNull()
            & F.col("turn_idx").isNotNull()
            & F.col("seq").isNotNull()
        ),
        F.lit(False),
    )
    reason = F.when(~ok, F.lit("malformed"))
    for name, pred in (constraints or {}).items():
        viol = (
            F.when(F.col("op").isin("D", "T"), F.lit(False))
            .when(F.col("op") == "P", ~F.coalesce(F.expr(pred), F.lit(True)))
            .otherwise(~F.coalesce(F.expr(pred), F.lit(False)))
        )
        reason = reason.when(viol, F.lit(name))
    df = df.withColumn("__reject", reason)
    return (
        df.filter(F.col("__reject").isNull()).drop("__reject"),
        df.filter(F.col("__reject").isNotNull()),
    )


_PROTECTED_DERIVE = ("conv_id", "turn_idx", "ts", "op", "seq", "source_file", "offset")


def apply_derives(df: DataFrame, derives: dict[str, str] | None) -> DataFrame:
    """Pre-merge declarative transforms: each entry ``name: SQL`` is a
    codegen'd Column over the change columns — overwrite a payload
    column to recode it, or add a new one (merge-side schema evolution
    picks it up). Entries apply in dict order, so later exprs may
    reference earlier derived columns — the reference's chained
    per-column steps (/root/reference/etl/trade_comtrade_monthly_pipeline.py
    transform section) as one narrow projection. Keys, LWW order and
    the envelope are protected: deriving them would silently change
    merge identity or ordering."""
    if not derives:
        return df
    for name in derives:
        if name in _PROTECTED_DERIVE or name.startswith("__"):
            raise ValueError(
                f"cannot derive {name!r}: key/order/envelope columns and the "
                "__* metadata namespace are protected"
            )
    for name, sql in derives.items():
        df = df.withColumn(name, F.expr(sql))
    return df


def build_enricher(spark: SparkSession, enrich: dict | None):
    """Compile ``EngineConfig.enrich`` into a DataFrame→DataFrame stage
    (or identity). The dim loads ONCE per stream build, its key
    uniqueness is verified up front (a fanning enrichment would
    duplicate change rows and corrupt the merge's row-uniqueness
    contract), and every application is a broadcast LEFT join — the
    stream-static join pattern, no shuffle of the change rows."""
    if not enrich:
        return lambda df: df
    sel = dict(enrich.get("select") or {})
    if not sel:
        raise ValueError("enrich.select must map at least one output column")
    for name in sel:
        if name in _PROTECTED_DERIVE or name.startswith("__"):
            raise ValueError(
                f"cannot enrich into {name!r}: key/order/envelope columns and "
                "the __* metadata namespace are protected"
            )
    key = enrich["key"]
    dim_key = enrich.get("dim_key", key)
    dim = spark.read.parquet(enrich["path"])
    dup = (
        dim.groupBy(dim_key).count().filter(F.col("count") > 1).select(dim_key).first()
    )
    if dup is not None:
        raise ValueError(
            f"enrich dim {enrich['path']!r} is not unique on {dim_key!r} "
            f"(e.g. {dup[0]!r}) — a fanning join would duplicate change rows"
        )
    proj = dim.select(
        F.col(dim_key).alias("__enrich_key"),
        *[F.col(src).alias(dst) for dst, src in sel.items()],
    )

    def stage(df: DataFrame) -> DataFrame:
        return df.join(
            F.broadcast(proj), df[key] == F.col("__enrich_key"), "left"
        ).drop("__enrich_key")

    return stage


def _build_query(
    spark: SparkSession,
    cfg: EngineConfig,
    lineages: list[BatchLineage],
    fail_after_batches: int | None = None,
):
    """Shared stream construction for backfill and tail: reader +
    quarantine + MERGE foreachBatch, everything but the trigger."""

    def mk_sink(target_dir: str, branch: str | None = None) -> ParquetSnapshotSink:
        return ParquetSnapshotSink(
            spark, target_dir, cfg.n_buckets,
            hot_key_threshold=cfg.hot_key_threshold, hot_key_salt=cfg.hot_key_salt,
            merge_strategy=cfg.merge_strategy, table_mode=cfg.table_mode,
            write_sorted=cfg.write_sorted, branch=branch,
            files_per_bucket=cfg.files_per_bucket, profile=cfg.profile,
            key_bloom_bits=cfg.key_bloom_bits,
        )

    if cfg.routes:
        # fan-out: one sink (and one epoch guard) per route target;
        # route order is the dict order so a mid-batch crash resumes
        # deterministically — already-committed targets skip the batch
        sinks = {name: mk_sink(f"{cfg.target_dir}/{name}") for name in cfg.routes}
    else:
        sink = mk_sink(cfg.target_dir, branch=cfg.branch)
    lineage_path = cfg.lineage_path or f"{cfg.target_dir}/_lineage/lineage.jsonl"
    enricher = build_enricher(spark, cfg.enrich)  # dim loads + verifies once
    nd_gate = None
    if cfg.neardup_gate:
        from oec_etl_spark.streaming.neardup_gate import NearDupGate

        nd_gate = NearDupGate(spark, cfg)  # validates spec + index binding once
    txn_gate = None
    if cfg.transactional:
        from oec_etl_spark.streaming.txn import TxnGate

        txn_gate = TxnGate(
            spark, f"{cfg.target_dir}/_tx_state",
            timeout_batches=cfg.tx_timeout_batches,
            ledger_batches=cfg.tx_ledger_batches,
        )

    def apply_batch(bdf: DataFrame, batch_id: int) -> None:
        if fail_after_batches is not None and len(lineages) >= fail_after_batches:
            raise RuntimeError("injected failure (test hook)")
        txstats = None
        if txn_gate is not None:
            # atomic-transaction gate FIRST: completeness is a transport
            # property, so held rows face the content gate (quarantine /
            # constraints / derives) when released, exactly once
            bdf, tx_expired, txstats = txn_gate.apply(bdf, batch_id)
        valid, bad = quarantine_split(bdf, cfg.constraints)
        nd_n = 0
        if nd_gate is not None:
            # near-dup suppression on the wire text, BEFORE derives/
            # enrich (keeps the DLQ schema identical to the quarantine
            # split's; the gate's text_expr sees the change columns)
            valid, nd_rej, nd_n = nd_gate.split(sink, valid)
            if nd_n:
                bad = bad.unionByName(nd_rej)
        valid = enricher(apply_derives(valid, cfg.derives))
        if txstats is not None and txstats.rows_tx_expired:
            bad = bad.unionByName(
                tx_expired.withColumn("__reject", F.lit("tx_timeout"))
            )
        n_bad = 0
        if cfg.quarantine_dir is not None:
            bad = bad.cache()
            n_bad = bad.count()
            if n_bad:
                bad.write.mode("append").parquet(cfg.quarantine_dir)
            bad.unpersist()

        def stamp_tx(rec: BatchLineage) -> BatchLineage:
            if txstats is not None:
                rec.rows_tx = txstats.rows_tx
                rec.rows_tx_held = txstats.rows_tx_held
                rec.txs_pending = txstats.txs_pending
                rec.rows_tx_expired = txstats.rows_tx_expired
                rec.txs_released = txstats.txs_released
            return rec
        def housekeep(s: ParquetSnapshotSink) -> list[int]:
            # mor housekeeping: fold a bucket's deltas into its base once
            # the read-amplification bound is hit (Iceberg's
            # rewrite_data_files on a trigger). Runs between commits —
            # crash-safe because compaction is itself an atomic manifest
            # swap and the epoch guard makes the next merge skip nothing.
            compacted: list[int] = []
            bound = cfg.compact_after_deltas or cfg.minor_compact_after
            if cfg.table_mode == "mor" and bound:
                man = s.load_manifest()
                due = [
                    int(b)
                    for b, dd in (man or {}).get("deltas", {}).items()
                    if len(dd) >= bound
                ]
                if due:
                    compacted = (
                        s.compact(due) if cfg.compact_after_deltas
                        else s.compact_minor(due, min_deltas=bound)
                    )
            # event-time TTL: advance the truncate horizon to
            # (max event ts) - ttl. Event-time anchored (replay-
            # deterministic); the horizon read is metadata-only
            # (zone-map sidecars); the advance is an O(1) metadata
            # truncate; ttl_advance_s throttles version churn.
            if cfg.ttl_seconds:
                man = s.load_manifest()
                zs = s.zonemap_summary()
                if zs["ts_max_us"] is not None:
                    new_hz = zs["ts_max_us"] - int(cfg.ttl_seconds * 1_000_000)
                    cur_hz = int((man or {}).get("truncate_ts_us") or 0)
                    if new_hz - cur_hz >= max(1, int(cfg.ttl_advance_s * 1_000_000)):
                        s.truncate_before(int(new_hz))  # integer µs, exact
            # retention: a long-running tail must not accumulate
            # manifests / superseded data versions forever. Expiry never
            # deletes files a kept snapshot references, so readers of
            # kept snapshots are unaffected.
            if cfg.expire_keep_last:
                s.expire_snapshots(keep_last=cfg.expire_keep_last)
            return compacted

        def housekeep_source() -> None:
            # in-loop binlog retention: only segments of ALREADY
            # COMMITTED batches qualify (during batch N the commit log
            # reaches N-1), so this can never move in-flight files
            if cfg.archive_dir:
                from oec_etl_spark.streaming.lag import archive_committed

                archive_committed(
                    cfg, cfg.archive_dir, older_than_s=cfg.archive_older_than_s
                )

        if cfg.routes:
            valid = valid.cache()  # each route re-filters the same batch
            preds = {n: F.expr(p) for n, p in cfg.routes.items() if p != "*"}
            # coalesce: a route predicate evaluating NULL means "not this
            # route" (filter drops it there), so for the declared catch-all
            # it must read as FALSE — bare ~NULL is NULL and the row would
            # vanish from '*' too, silently losing it from every target
            rest = ~_any([F.coalesce(p, F.lit(False)) for p in preds.values()])
            # config contract: rows matching no route are COUNTED, then
            # dropped (when no '*' catch-all consumes them). One count
            # over the cached batch — no extra scan of the source.
            n_unrouted = 0
            if "*" not in cfg.routes.values():
                n_unrouted = valid.filter(rest).count()
            try:
                for name in cfg.routes:  # dict order = commit order
                    if fail_after_batches is not None and len(lineages) >= fail_after_batches:
                        raise RuntimeError("injected failure (test hook, mid-batch)")
                    pred = preds.get(name, rest)
                    rec = stamp_tx(sinks[name].merge(valid.filter(pred), batch_id, quarantined=n_bad))
                    rec.route = name
                    rec.rows_unrouted = n_unrouted
                    rec.compacted_buckets = housekeep(sinks[name])
                    lineages.append(rec)
                    append_jsonl(lineage_path, rec.to_dict())
            finally:
                valid.unpersist()
                if txn_gate is not None:
                    txn_gate.finish()
            housekeep_source()
            return
        try:
            rec = stamp_tx(sink.merge(valid, batch_id, quarantined=n_bad))
        finally:
            if txn_gate is not None:
                txn_gate.finish()
            if nd_gate is not None:
                nd_gate.finish()
        rec.rows_neardup = nd_n
        rec.compacted_buckets = housekeep(sink)
        if cfg.mviews:
            # keep declared downstream aggregates current in the same
            # loop — each refresh is O(changed keys) off the CDF, and
            # idempotent, so a crash here just means the next batch's
            # refresh diffs across two base versions instead of one
            from oec_etl_spark.streaming.mview import MaterializedView

            for spec in cfg.mviews:
                MaterializedView(
                    spark, spec["path"], spec["group_keys"],
                    sum_exprs=spec.get("sum_exprs"),
                ).refresh(sink)
        if cfg.indexes:
            # derived indexes ride the same contract: built on first
            # sight, O(changed keys) per refresh, idempotent across a
            # crash between commit and sync
            for spec in cfg.indexes:
                _index_view(spark, spec).sync(sink)
        lineages.append(rec)
        append_jsonl(lineage_path, rec.to_dict())
        housekeep_source()

    src_path, src_format, src_opts = _resolve_source(cfg)
    read_schema = CHANGE_SCHEMA
    if cfg.transactional:
        from oec_etl_spark.schemas import CHANGE_SCHEMA_TX

        read_schema = CHANGE_SCHEMA_TX  # absent tx columns read as NULL = autocommit
    reader = spark.readStream.schema(read_schema).format(src_format).options(**src_opts)
    if cfg.max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(cfg.max_files_per_trigger))
    stream = reader.load(src_path)
    if cfg.dedup_watermark:
        # Streaming-native redelivery dedup upstream of the merge:
        # state is keyed by (conv_id, turn_idx, seq) and evicted once
        # event time passes the watermark. Null-ts rows can't be
        # watermarked — they bypass dedup (the idempotent merge still
        # neutralizes their duplicates) instead of being dropped.
        with_ts = stream.filter(F.col("ts").isNotNull())
        deduped = with_ts.withWatermark("ts", cfg.dedup_watermark).dropDuplicatesWithinWatermark(
            ["conv_id", "turn_idx", "seq"]
        )
        stream = deduped.unionByName(stream.filter(F.col("ts").isNull()))
    return stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", cfg.checkpoint_dir
    )


def run_replay(
    spark: SparkSession,
    cfg: EngineConfig,
    fail_after_batches: int | None = None,
) -> list[BatchLineage]:
    """Backfill: replay everything currently in the change log
    (Trigger.AvailableNow), block until done; returns per-batch lineage.

    ``fail_after_batches`` is a test hook: raise inside foreachBatch
    after N successful batches to simulate a mid-replay crash; a
    subsequent call with the same config must resume losslessly from
    the checkpoint.
    """
    lineages: list[BatchLineage] = []
    listener = _attach_metrics(spark, cfg)
    try:
        query = _build_query(spark, cfg, lineages, fail_after_batches).trigger(
            availableNow=True
        ).start()
        query.awaitTermination()
    finally:
        if listener is not None:
            _detach_metrics(spark, listener)
    return lineages


def _attach_metrics(spark: SparkSession, cfg: EngineConfig):
    """Register the trigger-metrics listener when cfg.metrics_path is
    set. Driver-side metadata only — no effect on the query plan."""
    if not cfg.metrics_path:
        return None
    from oec_etl_spark.streaming.metrics import ProgressLogger

    listener = ProgressLogger(cfg.metrics_path)
    spark.streams.addListener(listener)
    return listener


def _detach_metrics(spark: SparkSession, listener, timeout_s: float = 10.0) -> None:
    """Unregister after draining: listener events arrive on Spark's bus
    thread AFTER awaitTermination returns, so wait (bounded) for the
    terminated event to land in the log before removing the listener —
    otherwise the final trigger's progress line is silently lost."""
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        try:
            with open(listener.path) as f:
                if any('"event": "terminated"' in line for line in f):
                    break
        except FileNotFoundError:
            pass
        time.sleep(0.1)
    spark.streams.removeListener(listener)


def start_tail(
    spark: SparkSession,
    cfg: EngineConfig,
):
    """Continuous tail: the SAME query as ``run_replay`` on a
    ``processingTime`` trigger (cfg.processing_interval) — the engine
    keeps watching the change-log dir and merges new segment files as
    they land, replacing the reference's cron-style re-runs of a month
    pipeline (/root/reference/etl/trade_comtrade_monthly_pipeline.py:120-135)
    with one long-lived incremental query.

    Returns ``(query, lineages)``: a live StreamingQuery (caller owns
    stop()) and the lineage list, appended to as batches commit.
    Because backfill and tail share one checkpointLocation, a tail can
    take over where a backfill stopped and vice versa.
    """
    lineages: list[BatchLineage] = []
    listener = _attach_metrics(spark, cfg)
    query = _build_query(spark, cfg, lineages).trigger(
        processingTime=cfg.processing_interval
    ).start()
    # caller owns the query lifecycle, so it owns the listener too:
    # after query.stop(), call stop_tail_metrics(spark, query) (no-op
    # when metrics were off)
    query._metrics_listener = listener
    return query, lineages


def stop_tail_metrics(spark: SparkSession, query) -> None:
    """Drain + unregister the metrics listener attached by start_tail
    (call after query.stop()); safe no-op when metrics were off."""
    listener = getattr(query, "_metrics_listener", None)
    if listener is not None:
        _detach_metrics(spark, listener)


def replay_batch(spark: SparkSession, cfg: EngineConfig) -> BatchLineage:
    """One-shot batch apply of the whole change log (no streaming) —
    the degenerate case, also the fastest backfill when no
    incrementality is needed."""
    sink = ParquetSnapshotSink(
        spark, cfg.target_dir, cfg.n_buckets,
        hot_key_threshold=cfg.hot_key_threshold, hot_key_salt=cfg.hot_key_salt,
        merge_strategy=cfg.merge_strategy, table_mode=cfg.table_mode,
        write_sorted=cfg.write_sorted, branch=cfg.branch,
        files_per_bucket=cfg.files_per_bucket, profile=cfg.profile,
        key_bloom_bits=cfg.key_bloom_bits,
    )
    src_path, src_format, src_opts = _resolve_source(cfg)
    df = spark.read.schema(CHANGE_SCHEMA).format(src_format).options(**src_opts).load(src_path)
    if cfg.transactional:
        # one-shot apply: the whole log is one batch, so a transaction
        # can only be incomplete if the LOG is (truncated tail); gate it
        # the same way the stream would at batch 0
        from oec_etl_spark.schemas import CHANGE_SCHEMA_TX
        from oec_etl_spark.streaming.txn import TxnGate

        df = spark.read.schema(CHANGE_SCHEMA_TX).format(src_format).options(**src_opts).load(src_path)
        gate = TxnGate(spark, f"{cfg.target_dir}/_tx_state",
                       timeout_batches=cfg.tx_timeout_batches,
                       ledger_batches=cfg.tx_ledger_batches)
        df, _expired, _ = gate.apply(df, 0)
    valid, bad = quarantine_split(df, cfg.constraints)
    nd_gate, nd_n = None, 0
    if cfg.neardup_gate:
        # one-shot apply: the corpus side is whatever was committed
        # before this call (within-batch covers the log itself); the
        # index is synced at probe time, not after this merge — the
        # next gated call re-syncs first, so nothing is missed
        from oec_etl_spark.streaming.neardup_gate import NearDupGate

        nd_gate = NearDupGate(spark, cfg)
        valid, nd_rej, nd_n = nd_gate.split(sink, valid)
        if nd_n:
            bad = bad.unionByName(nd_rej)
    valid = build_enricher(spark, cfg.enrich)(apply_derives(valid, cfg.derives))
    n_bad = 0
    if cfg.quarantine_dir is not None:
        n_bad = bad.count()
        if n_bad:
            bad.write.mode("append").parquet(cfg.quarantine_dir)
    try:
        rec = sink.merge(valid, batch_id=0, quarantined=n_bad)
    finally:
        if nd_gate is not None:
            nd_gate.finish()
    rec.rows_neardup = nd_n
    return rec


def requeue_quarantined(
    spark: SparkSession,
    quarantine_dir: str,
    changes_dir: str,
    reasons: list[str] | None = None,
    file_format: str = "parquet",
) -> dict:
    """Drain the DLQ back into the change stream — the second half of
    the quarantine story: after the upstream fix (a constraint dropped
    or corrected, a producer patched), the rejected rows should flow
    through the SAME gate as live traffic, not a side door. Selected
    rows lose their ``__reject`` tag and land as one new change segment
    in the watched dir, so the running tail (or the next replay on the
    same checkpoint) merges them with full constraint/derive/enrich
    semantics; rows that STILL fail come straight back to the DLQ with
    their reason.

    Ordering is crash-safe by the merge semilattice: the new segment is
    written BEFORE the DLQ shrinks, so a crash in between at worst
    re-delivers rows whose re-application is an LWW no-op (a doubled
    still-failing row doubles in the DLQ — re-requeue dedups through
    the same path). ``reasons`` limits the drain to named reject
    reasons; default drains everything. ``file_format`` must match the
    pipeline's change-log format (EngineConfig.format): the DLQ itself
    is always parquet, but the re-injected segment is read by the
    stream source, which speaks one format per dir."""
    import glob as _glob
    import os
    import shutil
    import time as _time

    files = sorted(_glob.glob(os.path.join(quarantine_dir, "*.parquet")))
    if not files:
        return {"requeued": 0, "kept": 0, "segment": None}
    df = spark.read.option("mergeSchema", "true").parquet(*files)
    pred = F.col("__reject").isin(list(reasons)) if reasons else F.lit(True)
    out = df.filter(pred).drop("__reject")
    keep = df.filter(~pred)
    n_out, n_keep = out.count(), keep.count()
    segment = None
    if n_out:
        tmp = os.path.join(quarantine_dir, "__requeue_tmp")
        shutil.rmtree(tmp, ignore_errors=True)
        ext = "json" if file_format == "json" else "parquet"
        writer = out.coalesce(1).write.mode("overwrite").format(file_format)
        if file_format == "json":
            # Spark's default json timestampFormat truncates to millis;
            # the binlog wire format (generate.py) carries ISO micros —
            # a truncated requeue copy would diverge from its original
            # by sub-ms and flip LWW comparisons against the oracle.
            writer = writer.option(
                "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
            )
        writer.save(tmp)
        part = next(p for p in os.listdir(tmp) if p.endswith(f".{ext}"))
        segment = os.path.join(
            changes_dir, f"requeue-{int(_time.time() * 1000)}.{ext}"
        )
        os.replace(os.path.join(tmp, part), segment)  # visible to the stream NOW
        shutil.rmtree(tmp, ignore_errors=True)
    # Shrink the DLQ only after the segment is durable — and install the
    # kept rewrite BEFORE removing the originals: a crash in between
    # leaves kept rows doubled (harmless — a later requeue re-dedups
    # through the idempotent merge), never lost.
    if n_out:
        tmp2 = os.path.join(quarantine_dir, "__keep_tmp")
        shutil.rmtree(tmp2, ignore_errors=True)
        installed = []
        if n_keep:
            keep.write.mode("overwrite").parquet(tmp2)
            for i, p in enumerate(sorted(os.listdir(tmp2))):
                if p.endswith(".parquet"):
                    dest = os.path.join(quarantine_dir, f"kept-{int(_time.time() * 1000)}-{i}.parquet")
                    os.replace(os.path.join(tmp2, p), dest)
                    installed.append(dest)
            shutil.rmtree(tmp2, ignore_errors=True)
        for f in files:
            if f not in installed:
                os.remove(f)
    return {"requeued": n_out, "kept": n_keep, "segment": segment}
