"""spark-submit entry point: replay / resume / verify / compact.

Replaces the reference's per-pipeline ``__main__`` grids and the
bamboo-cli subprocess spawner
(/root/reference/etl/trade_comtrade_monthly_pipeline.py:120-135,
/root/reference/etl/countries/brazil/cli_pipeline.py:1-10) with one
idempotent command surface::

    spark-submit --py-files oec_etl_spark.zip -m oec_etl_spark.cli \\
        replay  --changes DIR --target DIR --checkpoint DIR [--buckets N]
        resume  ... (identical to replay: the checkpoint IS the resume point)
        tail    ... [--interval '5 seconds'] [--for-seconds N]  # continuous
                    incremental mode (processingTime trigger, same checkpoint)
        verify  --changes DIR --target DIR   # table == batch oracle?
        lineage --target DIR                 # print per-batch lineage JSONL
        changelog --target DIR --from-version V [--to-version W]  # CDF feed
        rebucket  --target DIR --new-buckets N   # bucket-layout evolution
        history   --target DIR                   # snapshot versions
        schema-history --target DIR              # schema-evolution timeline
        files     --target DIR [--version V]     # per-file metadata table
                                                 # (Iceberg `files` analog)
        lookup    --target DIR --key CONV_ID [--key ...] [--turn N]
                                                 # pruned point read, JSON lines
        doctor    --target DIR                   # read-only health check
                                                 # (refs, storage, orphans, stats)
        vacuum    --target DIR [--older-than-s S]  # crash-orphan cleanup
        rollback  --target DIR --to-version V    # metadata-only undo
        mview     --target DIR --view DIR --keys K[,K] [--sum NAME=EXPR ...]
        index     --target DIR --index DIR --kind ivf|minhash [--op sync|
                  compact|probe|query|stats]     # derived ANN / near-dup index
                                                 # (stats = drift/balance gauge)
        branch    --target DIR --name B          # open a WAP staging branch
        audit     --target DIR [--branch B] [--expect NAME=PRED ...]
        publish   --target DIR --name B          # audit + fast-forward main
        drop-branch --target DIR --name B        # abandon staged commits
        branches  --target DIR                   # list branch refs
        lag       --changes DIR --checkpoint DIR # backlog gauge (no JVM)
        archive   --changes DIR --checkpoint DIR --dest DIR|--delete
                                                 # binlog retention (no JVM)
        export    --target DIR --dest DIR [--version V | --as-of ISO_TS]
                  [--since ISO_TS] [--zorder X,Y [--zorder-files N]]
        rename-column --target DIR --from C --to C2
        delete    --target DIR --where SQL       # predicate DML via the merge
        update    --target DIR --where SQL --set COL=EXPR ...
        truncate  --target DIR --before ISO_TS   # O(1) event-time horizon
        requeue   --quarantine DIR --changes DIR [--reason NAME]
                                                 # drain the DLQ back into the stream
        stats     --target DIR                   # ops rollup (+--profile nulls)

    replay/resume/tail also take: --files-per-bucket K (write fan-out),
    --key-bloom-bits M (per-file key blooms), --ttl-seconds S
    [--ttl-advance-s T] (event-time TTL via the truncate horizon),
    --derive NAME=SQL (pre-merge transforms), --constraint NAME=PRED,
    --profile (per-batch null counts), --table-mode cow|mor, --branch B,
    --transactional [--tx-timeout-batches N] (atomic multi-event
    transactions via Debezium tx metadata); stream-static enrichment
    (`enrich:`) is a pipeline-spec/API knob.

`replay` and `resume` are deliberately the same code path — restarting
the streaming query against the same checkpointLocation continues from
the recorded offsets, and the sink's committed-batch guard absorbs any
re-delivered epoch (north rule: "resumable from checkpoint").
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

from oec_etl_spark.config import EngineConfig


def _cfg(args: argparse.Namespace) -> EngineConfig:
    return EngineConfig(
        changes_dir=args.changes,
        target_dir=args.target,
        checkpoint_dir=args.checkpoint,
        n_buckets=args.buckets,
        max_files_per_trigger=args.max_files_per_trigger,
        files_per_bucket=args.files_per_bucket,
        key_bloom_bits=args.key_bloom_bits,
        ttl_seconds=args.ttl_seconds,
        ttl_advance_s=args.ttl_advance_s,
        quarantine_dir=args.quarantine,
        table_mode=args.table_mode,
        format=args.format,
        branch=args.branch,
        compact_after_deltas=args.compact_after,
        minor_compact_after=args.minor_compact_after,
        metrics_path=args.metrics,
        constraints=_name_sql_pairs(args, "constraint"),
        derives=_name_sql_pairs(args, "derive"),
        profile=args.profile,
        transactional=args.transactional,
        tx_timeout_batches=args.tx_timeout_batches,
    )


def _name_sql_pairs(args: argparse.Namespace, attr: str) -> dict[str, str] | None:
    if not getattr(args, attr, None):
        return None
    out = {}
    for spec in getattr(args, attr):
        name, _, pred = spec.partition("=")
        if not pred:
            raise SystemExit(f"--{attr} wants NAME=SQL_PREDICATE, got {spec!r}")
        out[name] = pred
    return out


def cmd_replay(spark, args) -> int:
    from oec_etl_spark.streaming.engine import run_replay

    recs = run_replay(spark, _cfg(args))
    applied = sum(r.rows_applied for r in recs)
    print(json.dumps({"batches": len(recs), "rows_applied": applied}))
    return 0


def cmd_tail(spark, args) -> int:
    """Long-lived incremental mode: keep merging new change-log segment
    files as they land. ``--for-seconds`` bounds the run (ops/testing);
    default runs until interrupted. Same checkpoint as replay/resume, so
    tail picks up exactly where a backfill stopped."""
    from oec_etl_spark.streaming.engine import start_tail

    cfg = _cfg(args)
    if args.interval:
        cfg = dataclasses.replace(cfg, processing_interval=args.interval)
    query, recs = start_tail(spark, cfg)
    try:
        if args.for_seconds is not None:
            query.awaitTermination(args.for_seconds)
        else:
            query.awaitTermination()
    except KeyboardInterrupt:
        pass
    finally:
        query.stop()
        from oec_etl_spark.streaming.engine import stop_tail_metrics

        stop_tail_metrics(spark, query)
    applied = sum(r.rows_applied for r in recs)
    print(json.dumps({"batches": len(recs), "rows_applied": applied}))
    return 0


def cmd_verify(spark, args) -> int:
    from oec_etl_spark.operators.lww import materialize
    from oec_etl_spark.schemas import CHANGE_SCHEMA
    from oec_etl_spark.streaming.engine import quarantine_split
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    sink = ParquetSnapshotSink(spark, args.target, args.buckets)
    table = sink.read_table()
    # read via format().load() exactly as run_replay does, so a
    # json-format change log verifies instead of reading zero files
    raw = spark.read.schema(CHANGE_SCHEMA).format(args.format).load(args.changes)
    if args.transactional:
        # a transactional replay applies only COMPLETE transactions —
        # the oracle must gate identically or held rows read as a diff
        from pyspark.sql import functions as F

        from oec_etl_spark.schemas import CHANGE_SCHEMA_TX

        tx = spark.read.schema(CHANGE_SCHEMA_TX).format(args.format).load(args.changes)
        ok = (
            tx.filter(F.col("tx_id").isNotNull())
            .groupBy("tx_id")
            .agg((F.countDistinct("seq") >= F.max("tx_total")).alias("__ok"))
        )
        raw = (
            tx.join(ok, "tx_id", "left")
            .filter(F.col("tx_id").isNull() | F.col("__ok"))
            .select(*[f.name for f in CHANGE_SCHEMA.fields])
        )
    valid, _ = quarantine_split(raw)
    oracle = materialize(valid)
    # a committed truncate/TTL horizon is table state, not drift: gate
    # the oracle exactly as the merge does (ts <= horizon dead, NULL-ts
    # retained) or every TTL'd table reads as a spurious diff
    hz = (sink.load_manifest() or {}).get("truncate_ts_us")
    if hz:
        from pyspark.sql import functions as F

        oracle = oracle.filter(
            F.col("ts").isNull()
            | (F.unix_micros("ts") > F.lit(int(hz)))
        )
    cols = sorted(table.columns)
    diff = (
        table.select(*cols).exceptAll(oracle.select(*cols)).count()
        + oracle.select(*cols).exceptAll(table.select(*cols)).count()
    )
    print(json.dumps({"table_rows": table.count(), "oracle_rows": oracle.count(), "diff_rows": diff}))
    return 0 if diff == 0 else 1


def cmd_compact(spark, args) -> int:
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    sink = ParquetSnapshotSink(spark, args.target, args.buckets, table_mode="mor")
    if args.minor:
        if args.tombstone_horizon:
            raise SystemExit("--tombstone-horizon needs a full rewrite; drop --minor")
        if args.ts_split_files > 1:
            raise SystemExit("--ts-split-files needs a full rewrite; drop --minor")
        done = sink.compact_minor(min_deltas=args.min_deltas)
    else:
        horizon = None
        if args.tombstone_horizon:
            import datetime

            horizon = datetime.datetime.fromisoformat(args.tombstone_horizon)
        done = sink.compact(tombstone_horizon=horizon,
                            ts_split_files=args.ts_split_files)
    expired = []
    if args.expire:
        older = None
        if args.expire_before:
            import datetime

            older = datetime.datetime.fromisoformat(args.expire_before).timestamp()
        expired = sink.expire_snapshots(keep_last=args.keep_snapshots, older_than_ts=older)
    print(json.dumps({"compacted_buckets": done, "expired": expired}))
    return 0


def cmd_mview(spark, args) -> int:
    """Create (first run) or incrementally refresh a materialized view
    over the target table: --keys role --sum chars='length(text)'."""
    from oec_etl_spark.streaming.mview import MaterializedView
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    sums = {}
    for spec in args.sum or []:
        name, _, expr = spec.partition("=")
        if not expr:
            raise SystemExit(f"--sum wants NAME=SQL_EXPR, got {spec!r}")
        sums[name] = expr
    mv = MaterializedView(spark, args.view, args.keys.split(","), sum_exprs=sums)
    sink = ParquetSnapshotSink(spark, args.target, args.buckets)
    print(json.dumps(mv.refresh(sink)))
    return 0


def cmd_index(spark, args) -> int:
    """Maintain or query a derived index (streaming/ann_index.py,
    streaming/dedup_index.py) over the target table: --op sync builds
    on first run and O(changed-keys)-refreshes after, compact folds the
    overlay, probe (minhash) near-dup-checks a parquet batch of docs,
    query (ivf) runs a probed-partition top-k."""
    from oec_etl_spark.streaming.engine import _index_view
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    spec = {"kind": args.kind, "path": args.index}
    if args.kind == "ivf":
        if not args.centroids or not args.embed_expr:
            raise SystemExit("--kind ivf wants --centroids JSON_FILE and --embed-expr")
        with open(args.centroids) as f:
            spec["centroids"] = json.load(f)
        spec["embed_expr"] = args.embed_expr
    else:
        if args.text_expr:
            spec["text_expr"] = args.text_expr
        spec.update(n_minhash=args.n_minhash, n_bands=args.n_bands,
                    shingle_len=args.shingle_len)
    view = _index_view(spark, spec)
    sink = ParquetSnapshotSink(spark, args.target, args.buckets)
    if args.op == "sync":
        print(json.dumps(view.sync(sink)))
    elif args.op == "compact":
        print(json.dumps(view.compact()))
    elif args.op == "probe":
        if args.kind != "minhash":
            raise SystemExit("--op probe is a minhash-index operation")
        if not args.docs:
            raise SystemExit("--op probe wants --docs PARQUET_DIR (doc_id, text)")
        hits = view.probe(
            sink, spark.read.parquet(args.docs), threshold=args.threshold,
            max_shingle_df=args.max_shingle_df,
        ).collect()
        print(json.dumps([r.asDict() for r in hits]))
    elif args.op == "stats":
        if args.kind != "ivf":
            raise SystemExit("--op stats is an ivf-index operation")
        print(json.dumps(view.stats()))
    elif args.op == "query":
        if args.kind != "ivf":
            raise SystemExit("--op query is an ivf-index operation")
        if not args.query_vec:
            raise SystemExit("--op query wants --query-vec JSON_ARRAY")
        rows = view.query(
            json.loads(args.query_vec), k=args.k, nprobe=args.nprobe
        ).collect()
        print(json.dumps([r.asDict() for r in rows]))
    return 0


def cmd_rollback(spark, args) -> int:
    """Metadata-only undo: commit the target snapshot's table state as
    the new head. Pair with a fresh checkpoint to re-apply corrected
    batches (undo-and-replay)."""
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    sink = ParquetSnapshotSink(spark, args.target, args.buckets)
    v = sink.rollback(args.to_version)
    print(json.dumps({"rolled_back_to": args.to_version, "new_version": v}))
    return 0


def cmd_vacuum(spark, args) -> int:
    """Reclaim never-committed data dirs (crash leftovers). Keeps every
    snapshot — pair with `compact --expire` for history retention."""
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    sink = ParquetSnapshotSink(spark, args.target, args.buckets)
    deleted = sink.remove_orphans(older_than_s=args.older_than_s)
    print(json.dumps({"deleted": deleted}))
    return 0


def cmd_changelog(spark, args) -> int:
    """Print the net change feed between two snapshot versions (CDF):
    one JSON line per changed key."""
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    sink = ParquetSnapshotSink(spark, args.target, args.buckets)
    feed = sink.changelog(args.from_version, args.to_version)
    for row in feed.toJSON().toLocalIterator():
        print(row)
    return 0


def cmd_rebucket(spark, args) -> int:
    """Bucket-layout evolution: rewrite the table into N buckets."""
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    sink = ParquetSnapshotSink(spark, args.target, args.buckets)
    written = sink.rebucket(args.new_buckets)
    man = sink.load_manifest()
    print(json.dumps({"n_buckets": man["n_buckets"], "buckets_written": written, "version": man["version"]}))
    return 0


def cmd_history(spark, args) -> int:
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    for h in ParquetSnapshotSink(spark, args.target, args.buckets).history():
        print(json.dumps(h))
    return 0


def cmd_lookup(spark, args) -> int:
    """Operational point read: fetch one conversation (or one turn) as
    JSON lines, via the bucket-pruned + zone-map/bloom-pruned path —
    plus a `pruning` summary line on stderr so an operator can see the
    file-skipping working. Multiple --key values batch through
    lookup_many (one probe job, one scan per touched bucket)."""
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    # reader side needs no bloom knob: probes are always computed and
    # pruning follows whatever bitmaps the sidecars recorded
    sink = ParquetSnapshotSink(spark, args.target, args.buckets)
    if len(args.key) == 1:
        df = sink.lookup(args.key[0], turn_idx=args.turn)
    else:
        if args.turn is not None:
            raise SystemExit("--turn is only valid with a single --key")
        df = sink.lookup_many(args.key)
    rows = df.orderBy("conv_id", "turn_idx").collect()
    for r in rows:
        d = r.asDict()
        if d.get("ts") is not None:
            d["ts"] = d["ts"].isoformat()
        print(json.dumps(d))
    kept, total = sink.last_lookup_files
    print(json.dumps({"pruning": {"files_read": kept, "files_total": total},
                      "rows": len(rows)}), file=sys.stderr)
    return 0


def cmd_doctor(spark, args) -> int:
    """Read-only table health check: ref/storage integrity, orphan
    count, stats/bloom coverage — one JSON line, exit 1 on issues."""
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    rep = ParquetSnapshotSink(spark, args.target, args.buckets).fsck()
    print(json.dumps(rep))
    return 0 if rep["ok"] else 1


def cmd_files(spark, args) -> int:
    """Iceberg `files` metadata-table analog: one JSON line per live
    data file of a snapshot (bucket, base/delta kind, size, row count,
    ts/key zone-map ranges, bloom presence) — assembled metadata-only
    from the manifest + sidecars, no data reads. The operator's view
    for spotting delta buildup, size skew, or stats gaps."""
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    sink = ParquetSnapshotSink(spark, args.target, args.buckets)
    for r in sink.files_df(version=args.version).collect():
        print(json.dumps(r.asDict()))
    return 0


def cmd_schema_history(spark, args) -> int:
    """One JSON line per snapshot whose schema differs from its
    predecessor: the table's evolution timeline (added columns, type
    widenings) straight off the manifest chain — the audit trail for
    the engine's schema-reconciliation decisions."""
    from pyspark.sql import types as T

    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    sink = ParquetSnapshotSink(spark, args.target, args.buckets)
    prev: dict[str, str] = {}
    for h in sink.history():
        man = sink.load_manifest(h["version"])
        cur = {
            f.name: f.dataType.simpleString()
            for f in T.StructType.fromJson(man["schema"]).fields
        }
        if cur != prev:
            print(json.dumps({
                "version": man["version"],
                "committed_at": man.get("committed_at"),
                "added": sorted(set(cur) - set(prev)),
                "retyped": {k: f"{prev[k]} -> {cur[k]}" for k in cur
                            if k in prev and cur[k] != prev[k]},
                "schema": cur,
            }))
        prev = cur
    return 0


def cmd_lag(args) -> int:
    """Backlog gauge for a tailing pipeline: change-log segment files /
    bytes / events the checkpoint has not yet COMMITTED (a planned but
    crashed batch still counts as pending — it reprocesses on resume).
    Pure metadata: directory listing + checkpoint logs + parquet
    footers; no Spark session starts."""
    from oec_etl_spark.streaming.lag import source_lag

    cfg = EngineConfig(
        changes_dir=args.changes, target_dir="", checkpoint_dir=args.checkpoint,
        format=args.format,
    )
    print(json.dumps(source_lag(cfg)))
    return 0


def cmd_archive(args) -> int:
    """Binlog retention: move (--dest) or delete (--delete) change
    segments whose batch committed, leaving pending / crashed-batch
    files in place. The streaming source tracks seen paths in its own
    log, so the same checkpoint resumes unaffected."""
    from oec_etl_spark.streaming.lag import archive_committed

    cfg = EngineConfig(
        changes_dir=args.changes, target_dir="", checkpoint_dir=args.checkpoint,
        format=args.format,
    )
    dest = None if args.delete else args.dest
    print(json.dumps(archive_committed(cfg, dest, older_than_s=args.older_than_s)))
    return 0


def cmd_export(spark, args) -> int:
    """Materialize a committed snapshot (head, --version N, or --as-of
    ISO_TS) as a plain parquet dataset for downstream consumers that
    speak only vanilla parquet — the escape hatch out of the engine's
    manifest format. Reads are snapshot-isolated (immutable files), so
    the export is consistent even under live ingest; MOR deltas are
    merged on the way out."""
    import datetime

    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    sink = ParquetSnapshotSink(spark, args.target, args.buckets)
    version = args.version
    if args.as_of:
        version = sink.version_as_of(
            datetime.datetime.fromisoformat(args.as_of).timestamp()
        )
    cols = [c.strip() for c in args.columns.split(",")] if getattr(args, "columns", None) else None
    if getattr(args, "since", None):
        df = sink.scan_since(args.since, version=version, columns=cols)
    else:
        df = sink.read_table(version=version, columns=cols)
    if getattr(args, "zorder", None):
        # OPTIMIZE ZORDER BY on the way out: cluster the export on the
        # z-curve over two expressions so downstream box predicates
        # (e.g. time × conversation) prune files instead of scanning
        import os as _os

        from oec_etl_spark.operators.layout import write_zordered

        if _os.path.exists(args.dest):  # keep plain export's mode("error") contract
            raise FileExistsError(f"export dest already exists: {args.dest}")
        x, y = (s.strip() for s in args.zorder.split(",", 1))
        write_zordered(df, args.dest, x, y, n_files=args.zorder_files)
    else:
        df.write.mode("error").parquet(args.dest)
    n = spark.read.parquet(args.dest).count()
    print(json.dumps({
        "dest": args.dest, "rows": n,
        "version": version if version is not None
        else sink.load_manifest()["version"],
    }))
    return 0


def cmd_requeue(spark, args) -> int:
    """Drain the DLQ back into the watched change dir (optionally only
    named reject reasons) — rows re-enter through the normal gate on
    the next batch; still-failing rows come straight back with their
    reason. See requeue_quarantined for the crash-safety argument."""
    from oec_etl_spark.streaming.engine import requeue_quarantined

    print(json.dumps(requeue_quarantined(
        spark, args.quarantine, args.changes, reasons=args.reason,
        file_format=args.format,
    )))
    return 0


def cmd_stats(spark, args) -> int:
    """Aggregate the lineage log into one operational summary: totals,
    throughput, conflict/duplicate/quarantine counts, hot-key batches."""
    path = f"{args.target}/_lineage/lineage.jsonl"
    try:
        with open(path) as f:
            recs = [json.loads(line) for line in f if line.strip()]
    except FileNotFoundError:
        print(f"no lineage at {path}", file=sys.stderr)
        return 1
    applied = sum(r.get("rows_applied") or 0 for r in recs)
    wall = sum(r.get("wall_sec") or 0.0 for r in recs)
    out = {
        "batches": len(recs),
        "batches_skipped_as_committed": sum(1 for r in recs if r.get("skipped_as_committed")),
        "rows_in": sum(r.get("rows_in_batch") or 0 for r in recs),
        "rows_applied": applied,
        "rows_stale": sum(r.get("rows_stale") or 0 for r in recs),
        "rows_deleted": sum(r.get("rows_deleted") or 0 for r in recs),
        "rows_quarantined": sum(r.get("rows_quarantined") or 0 for r in recs),
        "salted_batches": sum(1 for r in recs if r.get("salted")),
        "wall_sec": round(wall, 2),
        "events_per_sec": round((sum(r.get("rows_in_batch") or 0 for r in recs)) / wall, 1) if wall else None,
        "routes": sorted({r["route"] for r in recs if r.get("route")}) or None,
    }
    # transport-loss probe: the union of every batch's applied [seq_min,
    # seq_max] range should be one contiguous interval for a gapless
    # binlog (redelivery/disorder only OVERLAP ranges, never hole them);
    # holes mean the source skipped sequence numbers → investigate
    spans = sorted(
        (r["seq_min"], r["seq_max"]) for r in recs
        if r.get("seq_min") is not None and r.get("seq_max") is not None
    )
    gaps, hi = [], None
    for lo, up in spans:
        if hi is not None and lo > hi + 1:
            gaps.append([hi + 1, lo - 1])
        hi = up if hi is None else max(hi, up)
    out["seq_coverage"] = {
        "min": spans[0][0] if spans else None,
        "max": hi,
        "gaps": gaps,
    } if spans else None
    # opt-in quality profile rollup: total NULLs per payload column
    # across every profiled batch (absent unless --profile was on)
    nulls: dict[str, int] = {}
    for r in recs:
        for col, n in (r.get("column_nulls") or {}).items():
            nulls[col] = nulls.get(col, 0) + n
    out["column_nulls"] = nulls or None
    print(json.dumps(out))
    return 0


def cmd_describe(spark, args) -> int:
    """Table identity card from metadata alone (no Spark job): head
    version + schema + layout, delta pressure (what minor/major
    compaction and the in-loop policies act on), refs, and consumer
    cursor positions."""
    from pyspark.sql import types as T

    from oec_etl_spark.streaming.feed import cursors
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    sink = ParquetSnapshotSink(spark, args.target, args.buckets)
    man = sink.load_manifest()
    if man is None:
        print(f"no committed snapshot under {args.target}", file=sys.stderr)
        return 1
    schema = T.StructType.fromJson(man["schema"])
    deltas = man.get("deltas", {})
    print(json.dumps({
        "version": man["version"],
        "committed_at": man.get("committed_at"),
        "n_buckets": man.get("n_buckets"),
        "schema": [f"{f.name}:{f.dataType.simpleString()}" for f in schema.fields],
        "snapshots": len(sink.history()),
        "committed_batches": len(man.get("committed_batches", [])),
        "dirty_buckets": sum(1 for dd in deltas.values() if dd),
        "max_deltas_per_bucket": max((len(dd) for dd in deltas.values()), default=0),
        "branches": sink.branches() or None,
        "tags": sink.tags() or None,
        "cursors": cursors(sink) or None,
        "zonemap": sink.zonemap_summary(),
        "truncate_ts_us": man.get("truncate_ts_us"),
    }))
    return 0


def _expectations(args) -> dict[str, str] | None:
    return _name_sql_pairs(args, "expect")


def cmd_branch(spark, args) -> int:
    """Open a write-audit-publish staging branch at main's head (or
    --at-version). Stage into it with replay/tail --branch, or a
    ParquetSnapshotSink(branch=...) handle."""
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    base = ParquetSnapshotSink(spark, args.target, args.buckets).create_branch(
        args.name, args.at_version
    )
    print(json.dumps({"branch": args.name, "base_version": base}))
    return 0


def cmd_branches(spark, args) -> int:
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    print(json.dumps(ParquetSnapshotSink(spark, args.target, args.buckets).branches()))
    return 0


def cmd_drop_branch(spark, args) -> int:
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    deleted = ParquetSnapshotSink(spark, args.target, args.buckets).drop_branch(args.name)
    print(json.dumps({"branch": args.name, "deleted": deleted}))
    return 0


def cmd_audit(spark, args) -> int:
    """Audit a snapshot (branch head by default) without publishing:
    key uniqueness, null keys, schema legality vs the fork base,
    bounded delete drift, user expectations. Exit 0 iff clean."""
    from oec_etl_spark.streaming.audit import audit_snapshot

    report = audit_snapshot(
        spark,
        args.target,
        branch=args.branch,
        n_buckets=args.buckets,
        base_version=args.base_version,
        max_delete_frac=args.max_delete_frac,
        expectations=_expectations(args),
    )
    print(json.dumps(report.to_dict()))
    return 0 if report.ok else 1


def cmd_publish(spark, args) -> int:
    """Publish a staging branch to main — audited by default; a failed
    audit leaves branch and main untouched and exits 1."""
    from oec_etl_spark.streaming.audit import AuditFailed, publish_audited
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    if args.no_audit:
        v = ParquetSnapshotSink(spark, args.target, args.buckets).publish(args.name)
        print(json.dumps({"branch": args.name, "published_version": v, "audited": False}))
        return 0
    try:
        report, v = publish_audited(
            spark,
            args.target,
            args.name,
            n_buckets=args.buckets,
            max_delete_frac=args.max_delete_frac,
            expectations=_expectations(args),
        )
    except AuditFailed as e:
        print(json.dumps(e.report.to_dict()))
        return 1
    out = report.to_dict()
    out["published_version"] = v
    print(json.dumps(out))
    return 0


def cmd_clone(spark, args) -> int:
    """Fork the table: deep-copy a snapshot (default: head) into an
    independent root. Pair with a copied checkpoint to fork the
    pipeline itself (the epoch guard travels with the manifest)."""
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    sink = ParquetSnapshotSink(spark, args.target, args.buckets)
    v = sink.clone(args.dest, version=args.version)
    print(json.dumps({"cloned_version": v, "dest": args.dest}))
    return 0


def cmd_purge(spark, args) -> int:
    """Right-to-be-forgotten: physically erase conversations from every
    retained snapshot (history, deltas, tombstones, lineage hot-keys).
    The source change log and any quarantine dir are caller-owned."""
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    sink = ParquetSnapshotSink(spark, args.target, args.buckets)
    print(json.dumps(sink.purge_keys(args.key)))
    return 0


def cmd_run(spark, args) -> int:
    """Execute a declarative pipeline spec: one YAML = one CDC job
    (mode + every EngineConfig knob). The deployable unit a reviewer
    can read without chasing CLI flags."""
    from oec_etl_spark.pipeline import load_pipeline

    mode, cfg = load_pipeline(args.pipeline)
    if mode == "replay":
        from oec_etl_spark.streaming.engine import run_replay

        recs = run_replay(spark, cfg)
        print(json.dumps({"mode": mode, "batches": len(recs),
                          "rows_applied": sum(r.rows_applied for r in recs)}))
        return 0
    from oec_etl_spark.streaming.engine import start_tail, stop_tail_metrics

    query, recs = start_tail(spark, cfg)
    try:
        if args.for_seconds is not None:
            query.awaitTermination(args.for_seconds)
        else:
            query.awaitTermination()
    except KeyboardInterrupt:
        pass
    finally:
        query.stop()
        stop_tail_metrics(spark, query)
    print(json.dumps({"mode": mode, "batches": len(recs),
                      "rows_applied": sum(r.rows_applied for r in recs)}))
    return 0


def cmd_drop_column(spark, args) -> int:
    """ALTER TABLE DROP COLUMN on the snapshot table (head-state
    rewrite — sound under name-based column mapping; see sink)."""
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    sink = ParquetSnapshotSink(spark, args.target, args.buckets)
    v = sink.alter_drop_column(args.column)
    print(json.dumps({"dropped": args.column, "new_version": v}))
    return 0


def cmd_delete(spark, args) -> int:
    """DELETE FROM table WHERE … — predicate DML routed through the
    merge (tombstones at the matched rows' own ts, seq+1), so lineage,
    watermarks and exactly-once all apply. Current-state DML; for
    historical erasure use `purge`."""
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    sink = ParquetSnapshotSink(spark, args.target, args.buckets,
                               table_mode=args.table_mode)
    rec = sink.delete_where(args.where)
    print(json.dumps({"deleted": rec.rows_applied, "batch_id": rec.batch_id,
                      "version": sink.load_manifest()["version"]}))
    return 0


def cmd_update(spark, args) -> int:
    """UPDATE table SET col=expr … WHERE … through the merge (see
    delete): matched rows re-emitted with the SET exprs applied."""
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    sink = ParquetSnapshotSink(spark, args.target, args.buckets,
                               table_mode=args.table_mode)
    rec = sink.update_where(args.where, _name_sql_pairs(args, "set") or {})
    print(json.dumps({"updated": rec.rows_applied, "batch_id": rec.batch_id,
                      "version": sink.load_manifest()["version"]}))
    return 0


def cmd_truncate(spark, args) -> int:
    """TRUNCATE (event-time horizon): O(1) metadata commit — every row
    with ts <= --before is dead, stored data untouched until the next
    compaction reclaims it; late stragglers under the horizon are
    dropped at merge time. NULL-ts rows are retained."""
    import datetime

    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    sink = ParquetSnapshotSink(spark, args.target, args.buckets,
                               table_mode=args.table_mode)
    rec = sink.truncate_before(datetime.datetime.fromisoformat(args.before))
    print(json.dumps({"truncate_ts_us": rec.truncate_ts_us, "batch_id": rec.batch_id,
                      "version": sink.load_manifest()["version"]}))
    return 0


def cmd_rename_column(spark, args) -> int:
    """ALTER TABLE RENAME COLUMN (head-state rewrite; old snapshots
    keep the old name, the change stream's payload names do not
    follow)."""
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    sink = ParquetSnapshotSink(spark, args.target, args.buckets)
    v = sink.alter_rename_column(getattr(args, "from"), args.to)
    print(json.dumps({"renamed": getattr(args, "from"), "to": args.to, "new_version": v}))
    return 0


def cmd_consume(spark, args) -> int:
    """Pull a named consumer's new changes off the table's change feed.
    With --out: write them as parquet and ack (at-least-once delivery);
    without: peek — report what a pull would deliver, cursor unmoved."""
    from oec_etl_spark.streaming.feed import ChangeFeedCursor
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    cur = ChangeFeedCursor(ParquetSnapshotSink(spark, args.target, args.buckets), args.cursor)
    if args.out:
        print(json.dumps(cur.deliver_to(args.out, pre_post=args.pre_post)))
        return 0
    changes, head = cur.read(pre_post=args.pre_post)
    print(json.dumps({"cursor": args.cursor, "from": cur.position(),
                      "to": head, "rows": changes.count(), "acked": False}))
    return 0


def cmd_lineage(spark, args) -> int:
    path = f"{args.target}/_lineage/lineage.jsonl"
    try:
        with open(path) as f:
            sys.stdout.write(f.read())
        return 0
    except FileNotFoundError:
        print(f"no lineage at {path}", file=sys.stderr)
        return 1


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="oec_etl_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("replay", "resume", "tail", "verify", "lineage", "compact",
                 "changelog", "rebucket", "history", "schema-history", "files",
                 "lookup", "doctor", "stats", "describe",
                 "vacuum", "rollback", "mview", "index", "clone", "purge", "consume", "run",
                 "drop-column", "rename-column", "lag", "archive", "export",
                 "delete", "update", "truncate", "requeue",
                 "branch", "branches", "drop-branch", "audit", "publish"):
        sp = sub.add_parser(name)
        if name in ("branch", "drop-branch", "publish"):
            sp.add_argument("--name", required=True)
        if name == "branch":
            sp.add_argument("--at-version", type=int, default=None)
        if name == "audit":
            sp.add_argument("--branch", default=None)
            sp.add_argument("--base-version", type=int, default=None)
        if name in ("audit", "publish"):
            sp.add_argument("--max-delete-frac", type=float, default=None)
            sp.add_argument("--expect", action="append", default=None,
                            metavar="NAME=SQL_PREDICATE")
        if name == "publish":
            sp.add_argument("--no-audit", action="store_true")
        if name in ("replay", "resume", "tail", "verify", "lag", "archive"):
            sp.add_argument("--changes", required=True)
            sp.add_argument("--format", default="parquet", choices=["parquet", "json"])
        if name in ("lag", "archive"):
            sp.add_argument("--checkpoint", required=True)
        if name == "archive":
            g = sp.add_mutually_exclusive_group(required=True)
            g.add_argument("--dest", default=None,
                           help="move committed segments to this dir")
            g.add_argument("--delete", action="store_true",
                           help="delete committed segments instead of moving")
            sp.add_argument("--older-than-s", type=float, default=0.0,
                            help="additionally require segment mtime older than this")
        if name == "requeue":
            sp.add_argument("--quarantine", required=True,
                            help="DLQ dir written by --quarantine-dir runs")
            sp.add_argument("--changes", required=True,
                            help="watched change dir to re-inject into")
            sp.add_argument("--reason", action="append", default=None,
                            metavar="NAME", help="drain only this reject reason "
                            "(repeatable; default drains everything)")
            sp.add_argument("--format", default="parquet",
                            choices=["parquet", "json"],
                            help="change-log format of the watched dir — the "
                            "re-injected segment must speak it")
        if name == "run":
            sp.add_argument("--pipeline", required=True, metavar="YAML",
                            help="declarative pipeline spec (mode + EngineConfig)")
            sp.add_argument("--for-seconds", type=int, default=None,
                            help="tail mode: stop after N seconds")
        elif name not in ("lag", "archive", "requeue"):  # no table handle needed
            sp.add_argument("--target", required=True)
        if name == "changelog":
            sp.add_argument("--from-version", type=int, required=True)
            sp.add_argument("--to-version", type=int, default=None)
        if name == "rebucket":
            sp.add_argument("--new-buckets", type=int, required=True)
        if name in ("replay", "resume", "tail"):
            sp.add_argument("--checkpoint", required=True)
            sp.add_argument("--max-files-per-trigger", type=int, default=None)
            sp.add_argument("--files-per-bucket", type=int, default=1,
                            help="sub-bucket write fan-out: spread each "
                            "bucket's rows over ~K tasks/files per write")
            sp.add_argument("--ttl-seconds", type=float, default=None,
                            help="event-time TTL: after each commit, advance "
                            "the truncate horizon to max(event ts) - TTL "
                            "(O(1) metadata; compaction reclaims)")
            sp.add_argument("--ttl-advance-s", type=float, default=0.0,
                            help="min horizon advance before cutting a new "
                            "truncate version (throttles version churn)")
            sp.add_argument("--key-bloom-bits", type=int, default=None,
                            help="per-file conv_id bloom filters (bits/file) "
                            "in the zone-map sidecars: membership pruning "
                            "for point lookups where key ranges are blind")
            sp.add_argument("--quarantine", default=None)
            sp.add_argument("--table-mode", default="cow", choices=["cow", "mor"])
            sp.add_argument("--branch", default=None,
                            help="stage merges onto this WAP branch instead of main")
            sp.add_argument("--compact-after", type=int, default=None,
                            help="mor: compact a bucket once it holds this many delta files")
            sp.add_argument("--minor-compact-after", type=int, default=None,
                            help="mor: minor-fold a bucket's deltas at this count "
                                 "(base untouched; mutually exclusive with --compact-after)")
            sp.add_argument("--metrics", default=None, metavar="PATH",
                            help="append per-trigger StreamingQueryProgress metrics as JSONL")
            sp.add_argument("--constraint", action="append", default=None,
                            metavar="NAME=SQL_PREDICATE",
                            help="merge-time CHECK constraint; violating rows "
                                 "go to --quarantine tagged with NAME (deletes exempt)")
            sp.add_argument("--derive", action="append", default=None,
                            metavar="NAME=SQL_EXPR",
                            help="pre-merge transform: recode an existing payload "
                                 "column or add a new one (applied in order, "
                                 "after constraints, before the merge)")
            sp.add_argument("--profile", action="store_true",
                            help="record per-batch payload NULL counts in "
                                 "lineage (one extra aggregate per batch)")
            sp.add_argument("--tx-timeout-batches", type=int, default=None,
                            help="DLQ a transaction still incomplete this "
                                 "many batches after its first event "
                                 "(reason tx_timeout); default: hold forever")
        if name in ("replay", "resume", "tail", "verify"):
            sp.add_argument("--transactional", action="store_true",
                            help="apply (or, for verify, oracle) multi-event "
                                 "transactions atomically: only complete txs "
                                 "count (Debezium transaction metadata)")
        if name == "tail":
            sp.add_argument("--interval", default=None, help="processingTime trigger, e.g. '5 seconds'")
            sp.add_argument("--for-seconds", type=int, default=None, help="stop after N seconds (default: run forever)")
        if name == "compact":
            sp.add_argument("--expire", action="store_true")
            sp.add_argument("--keep-snapshots", type=int, default=2)
            sp.add_argument("--expire-before", default=None, metavar="ISO_TS",
                            help="with --expire: never expire snapshots committed "
                                 "at/after this time (age-based retention floor)")
            sp.add_argument("--tombstone-horizon", default=None, metavar="ISO_TS",
                            help="drop tombstones with ts older than this (must be "
                                 "at most now - max event disorder)")
            sp.add_argument("--minor", action="store_true",
                            help="fold each bucket's delta files into one without "
                                 "rewriting its base (O(deltas), not O(base))")
            sp.add_argument("--min-deltas", type=int, default=2,
                            help="minor: skip buckets with fewer delta files")
            sp.add_argument("--ts-split-files", type=int, default=1,
                            help="write each rewritten bucket as ~N ts-range files "
                                 "(secondary time partitioning) so scan_since/"
                                 "export --since prunes cold slices of the base")
        if name == "vacuum":
            sp.add_argument("--older-than-s", type=float, default=3600.0)
        if name == "rollback":
            sp.add_argument("--to-version", type=int, required=True)
        if name == "clone":
            sp.add_argument("--dest", required=True)
            sp.add_argument("--version", type=int, default=None)
        if name == "files":
            sp.add_argument("--version", type=int, default=None,
                            help="snapshot to list (default: head)")
        if name == "lookup":
            sp.add_argument("--key", action="append", required=True,
                            metavar="CONV_ID", help="conversation id "
                            "(repeatable: batched via lookup_many)")
            sp.add_argument("--turn", type=int, default=None,
                            help="single turn_idx (one --key only)")
        if name == "consume":
            sp.add_argument("--cursor", required=True, help="consumer name")
            sp.add_argument("--out", default=None, metavar="DIR",
                            help="deliver changes as parquet under DIR/v{head} "
                                 "and ack; omit to peek without acking")
            sp.add_argument("--pre-post", action="store_true",
                            help="Delta-CDF shape: updates as pre+post images")
        if name == "drop-column":
            sp.add_argument("--column", required=True,
                            help="payload column to drop (head-state rewrite)")
        if name == "rename-column":
            sp.add_argument("--from", required=True, dest="from",
                            help="payload column to rename")
            sp.add_argument("--to", required=True,
                            help="new column name")
        if name in ("delete", "update"):
            sp.add_argument("--where", required=True,
                            help="SQL predicate over the table's columns")
        if name in ("delete", "update", "truncate"):
            sp.add_argument("--table-mode", default="cow", choices=["cow", "mor"])
        if name == "truncate":
            sp.add_argument("--before", required=True, metavar="ISO_TS",
                            help="event-time horizon: rows with ts <= this die "
                                 "(metadata-only; space reclaimed at compaction)")
        if name == "update":
            sp.add_argument("--set", action="append", required=True,
                            metavar="NAME=SQL_EXPR",
                            help="column assignment (repeatable; keys/ts protected)")
        if name == "export":
            sp.add_argument("--dest", required=True,
                            help="output dir for the plain parquet dataset")
            g = sp.add_mutually_exclusive_group()
            g.add_argument("--version", type=int, default=None)
            g.add_argument("--as-of", default=None, metavar="ISO_TS",
                           help="export the snapshot current at this time")
            sp.add_argument("--since", default=None, metavar="ISO_TS",
                            help="only rows with ts >= this horizon, via the "
                            "zone-map-pruned scan (skips files whose footer "
                            "stats prove them older)")
            sp.add_argument("--columns", default=None, metavar="C1,C2",
                            help="export only these payload columns — the "
                            "projection is pushed into the parquet scans, "
                            "through the merge-on-read path")
            sp.add_argument("--zorder", default=None, metavar="X_EXPR,Y_EXPR",
                            help="cluster the export on the z-curve over two "
                            "SQL expressions (OPTIMIZE ZORDER BY analog)")
            sp.add_argument("--zorder-files", type=int, default=16,
                            help="output file count for --zorder")
        if name == "purge":
            sp.add_argument("--key", action="append", required=True,
                            metavar="CONV_ID", help="conversation to erase "
                            "from every retained snapshot (repeatable)")
        if name == "mview":
            sp.add_argument("--view", required=True, help="view state directory")
            sp.add_argument("--keys", required=True, help="comma-separated group keys")
            sp.add_argument("--sum", action="append", default=None,
                            metavar="NAME=SQL_EXPR", help="additive measure over payload columns")
        if name == "index":
            sp.add_argument("--index", required=True, help="index state directory")
            sp.add_argument("--kind", required=True, choices=["ivf", "minhash"])
            sp.add_argument("--op", default="sync",
                            choices=["sync", "compact", "probe", "query", "stats"])
            sp.add_argument("--centroids", default=None, metavar="JSON_FILE",
                            help="ivf: [[id, [floats]], ...]")
            sp.add_argument("--embed-expr", default=None,
                            help="ivf: SQL expr -> array<double> over the row")
            sp.add_argument("--text-expr", default=None,
                            help="minhash: SQL text expr (default coalesce(text,''))")
            sp.add_argument("--n-minhash", type=int, default=8)
            sp.add_argument("--n-bands", type=int, default=4)
            sp.add_argument("--shingle-len", type=int, default=12)
            sp.add_argument("--docs", default=None, metavar="PARQUET_DIR",
                            help="probe: incoming docs (doc_id, text)")
            sp.add_argument("--threshold", type=float, default=0.5)
            sp.add_argument("--max-shingle-df", type=int, default=None,
                            help="probe: stop-shingle guard — drop shingles "
                            "shared by more than N candidate corpus docs")
            sp.add_argument("--query-vec", default=None, metavar="JSON_ARRAY")
            sp.add_argument("--k", type=int, default=10)
            sp.add_argument("--nprobe", type=int, default=2)
        sp.add_argument("--buckets", type=int, default=16)
    args = p.parse_args(argv)

    if args.cmd == "lag":  # metadata-only: no Spark session needed
        return cmd_lag(args)
    if args.cmd == "archive":  # file moves driven by metadata: no Spark
        return cmd_archive(args)

    from oec_etl_spark.session import get_spark

    spark = get_spark(app_name=f"oec_etl_spark.{args.cmd}")
    try:
        if args.cmd in ("replay", "resume"):
            return cmd_replay(spark, args)
        if args.cmd == "tail":
            return cmd_tail(spark, args)
        if args.cmd == "verify":
            return cmd_verify(spark, args)
        if args.cmd == "requeue":
            return cmd_requeue(spark, args)
        if args.cmd == "compact":
            return cmd_compact(spark, args)
        if args.cmd == "vacuum":
            return cmd_vacuum(spark, args)
        if args.cmd == "rollback":
            return cmd_rollback(spark, args)
        if args.cmd == "clone":
            return cmd_clone(spark, args)
        if args.cmd == "purge":
            return cmd_purge(spark, args)
        if args.cmd == "consume":
            return cmd_consume(spark, args)
        if args.cmd == "run":
            return cmd_run(spark, args)
        if args.cmd == "drop-column":
            return cmd_drop_column(spark, args)
        if args.cmd == "rename-column":
            return cmd_rename_column(spark, args)
        if args.cmd == "export":
            return cmd_export(spark, args)
        if args.cmd == "delete":
            return cmd_delete(spark, args)
        if args.cmd == "update":
            return cmd_update(spark, args)
        if args.cmd == "truncate":
            return cmd_truncate(spark, args)
        if args.cmd == "mview":
            return cmd_mview(spark, args)
        if args.cmd == "index":
            return cmd_index(spark, args)
        if args.cmd == "changelog":
            return cmd_changelog(spark, args)
        if args.cmd == "rebucket":
            return cmd_rebucket(spark, args)
        if args.cmd == "history":
            return cmd_history(spark, args)
        if args.cmd == "files":
            return cmd_files(spark, args)
        if args.cmd == "lookup":
            return cmd_lookup(spark, args)
        if args.cmd == "doctor":
            return cmd_doctor(spark, args)
        if args.cmd == "schema-history":
            return cmd_schema_history(spark, args)
        if args.cmd == "stats":
            return cmd_stats(spark, args)
        if args.cmd == "describe":
            return cmd_describe(spark, args)
        if args.cmd == "branch":
            return cmd_branch(spark, args)
        if args.cmd == "branches":
            return cmd_branches(spark, args)
        if args.cmd == "drop-branch":
            return cmd_drop_branch(spark, args)
        if args.cmd == "audit":
            return cmd_audit(spark, args)
        if args.cmd == "publish":
            return cmd_publish(spark, args)
        return cmd_lineage(spark, args)
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
