"""Replay-equivalence tests (FIXTURES.md F5, SURVEY.md §5).

The batch oracle — read ALL events at once, LWW per key, drop deletes —
is trivially correct by construction. Every engine path (single-batch
merge, multi-batch streaming, duplicate-heavy delivery, crash+resume,
schema evolution) must produce a table exactly equal to it.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.generate import GeneratorConfig, generate_changelog
from oec_etl_spark.operators.lww import materialize
from oec_etl_spark.schemas import CHANGE_SCHEMA
from oec_etl_spark.streaming.engine import quarantine_split, replay_batch, run_replay
from oec_etl_spark.streaming.sink import ParquetSnapshotSink


def _gen(tmp, **kw):
    cfg = GeneratorConfig(out_dir=str(tmp / "changes"), **kw)
    stats = generate_changelog(cfg)
    return cfg, stats


def _oracle(spark, changes_dir):
    df = spark.read.schema(CHANGE_SCHEMA).parquet(f"{changes_dir}/*.parquet")
    valid, _ = quarantine_split(df)
    return materialize(valid)


def _assert_table_equal(a, b, key=("conv_id", "turn_idx")):
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a, b = a.select(*cols), b.select(*cols)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def _engine_cfg(tmp, **kw):
    return EngineConfig(
        changes_dir=str(tmp / "changes"),
        target_dir=str(tmp / "target"),
        checkpoint_dir=str(tmp / "ckpt"),
        n_buckets=8,
        **kw,
    )


# ------------------------------------------------------------ generator
def test_generator_deterministic(tmp_path):
    s1 = generate_changelog(GeneratorConfig(out_dir=str(tmp_path / "a"), seed=7, n_conversations=50))
    s2 = generate_changelog(GeneratorConfig(out_dir=str(tmp_path / "b"), seed=7, n_conversations=50))
    assert s1["events_written"] == s2["events_written"]
    import pyarrow.parquet as pq

    ta = pq.read_table(sorted(glob.glob(str(tmp_path / "a" / "*.parquet")))[0])
    tb = pq.read_table(sorted(glob.glob(str(tmp_path / "b" / "*.parquet")))[0])
    assert ta.equals(tb)


def test_generator_properties(tmp_path):
    _, stats = _gen(tmp_path, seed=3, n_conversations=80, duplicate_rate=0.1)
    assert stats["duplicates"] > 0
    assert stats["events_written"] == stats["distinct_seq"] + stats["duplicates"]
    assert stats["updates"] > 0 and stats["deletes"] > 0


# --------------------------------------------------- single-batch merge
def test_batch_merge_equals_oracle(spark, tmp_path):
    _gen(tmp_path, seed=11, n_conversations=60)
    cfg = _engine_cfg(tmp_path)
    rec = replay_batch(spark, cfg)
    assert rec.rows_applied > 0
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    _assert_table_equal(sink.read_table(), _oracle(spark, cfg.changes_dir))


def test_merge_is_idempotent_same_batch_id(spark, tmp_path):
    _gen(tmp_path, seed=12, n_conversations=30)
    cfg = _engine_cfg(tmp_path)
    replay_batch(spark, cfg)
    rec2 = replay_batch(spark, cfg)  # same batch_id=0 → epoch guard
    assert rec2.skipped_as_committed
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    _assert_table_equal(sink.read_table(), _oracle(spark, cfg.changes_dir))


def test_reapply_under_new_batch_id_is_noop(spark, tmp_path):
    """Semilattice property: re-merging already-applied events (fresh
    epoch id) changes nothing — at-least-once degrades to effectively-once."""
    _gen(tmp_path, seed=13, n_conversations=30)
    cfg = _engine_cfg(tmp_path)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    df = spark.read.schema(CHANGE_SCHEMA).parquet(f"{cfg.changes_dir}/*.parquet")
    valid, _ = quarantine_split(df)
    sink.merge(valid, batch_id=0)
    rec = sink.merge(valid, batch_id=1)  # full duplicate delivery
    assert rec.rows_applied == 0  # every winner ties with stored row → stored wins
    _assert_table_equal(sink.read_table(), _oracle(spark, cfg.changes_dir))


# ------------------------------------------------------ streaming paths
def test_streaming_replay_equals_oracle(spark, tmp_path):
    _gen(tmp_path, seed=21, n_conversations=80, n_segments=6)
    cfg = _engine_cfg(tmp_path, max_files_per_trigger=2)
    recs = run_replay(spark, cfg)
    assert len(recs) >= 3  # multiple micro-batches
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    _assert_table_equal(sink.read_table(), _oracle(spark, cfg.changes_dir))
    assert sum(r.rows_in_batch for r in recs) > 0


def test_duplicate_and_disorder_heavy(spark, tmp_path):
    _gen(tmp_path, seed=22, n_conversations=60, duplicate_rate=0.3, disorder_window=200, tie_ts_frac=0.2)
    cfg = _engine_cfg(tmp_path, max_files_per_trigger=2)
    run_replay(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    _assert_table_equal(sink.read_table(), _oracle(spark, cfg.changes_dir))


def test_upstream_dedup_within_watermark(spark, tmp_path):
    """With cfg.dedup_watermark set, exact redeliveries are dropped
    BEFORE the merge (dropDuplicatesWithinWatermark state), so the
    merge sees fewer rows than were written — and the final table is
    still exactly the oracle."""
    _, stats = _gen(
        tmp_path, seed=23, n_conversations=60, n_segments=6, duplicate_rate=0.3
    )
    assert stats["duplicates"] > 0
    cfg = _engine_cfg(tmp_path, max_files_per_trigger=2, dedup_watermark="6 hours")
    recs = run_replay(spark, cfg)
    merged_rows = sum(r.rows_in_batch for r in recs)
    # strictly fewer rows reached the merge than were delivered; exact
    # equality with distinct_seq isn't guaranteed (a redelivery split
    # across micro-batches can land after its original's state is
    # snapshotted at a batch boundary with no intervening watermark
    # advance), so assert the dedup removed most of the duplicate mass
    assert merged_rows < stats["events_written"]
    assert merged_rows - stats["distinct_seq"] <= stats["duplicates"] * 0.2
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    _assert_table_equal(sink.read_table(), _oracle(spark, cfg.changes_dir))


def test_tail_trigger_applies_new_segments(spark, tmp_path):
    """Continuous tail mode: segment files dropped into the watched dir
    MID-RUN are merged by the live processingTime query; after stop, a
    fresh tail on the same checkpoint resumes and applies later drops
    without reprocessing old ones."""
    import shutil

    from oec_etl_spark.streaming.engine import start_tail

    # full log staged elsewhere; segments are moved into the watched dir
    staged = tmp_path / "staged"
    generate_changelog(GeneratorConfig(out_dir=str(staged), seed=31, n_conversations=60, n_segments=6))
    segs = sorted(glob.glob(str(staged / "*.parquet")))
    watched = tmp_path / "changes"
    os.makedirs(watched)
    for s in segs[:2]:
        shutil.copy(s, watched)

    cfg = _engine_cfg(tmp_path, processing_interval="1 second")
    query, recs = start_tail(spark, cfg)
    try:
        query.processAllAvailable()
        applied_first = sum(r.rows_in_batch for r in recs)
        assert applied_first > 0
        for s in segs[2:4]:  # land mid-run
            shutil.copy(s, watched)
        query.processAllAvailable()
        assert sum(r.rows_in_batch for r in recs) > applied_first
    finally:
        query.stop()

    # resume: a new tail on the same checkpoint sees only segment 5-6
    for s in segs[4:]:
        shutil.copy(s, watched)
    query2, recs2 = start_tail(spark, cfg)
    try:
        query2.processAllAvailable()
    finally:
        query2.stop()
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    _assert_table_equal(sink.read_table(), _oracle(spark, str(watched)))
    # resumed query processed only the two new segments, not the first four
    assert sum(r.rows_in_batch for r in recs2) < applied_first + sum(r.rows_in_batch for r in recs)


def test_crash_and_resume_from_checkpoint(spark, tmp_path):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    _gen(tmp_path, seed=23, n_conversations=80, n_segments=8)
    cfg = _engine_cfg(tmp_path, max_files_per_trigger=1)
    with pytest.raises(StreamingQueryException):
        run_replay(spark, cfg, fail_after_batches=3)
    # restart: resumes from checkpoint, re-delivered epoch skipped by guard
    recs = run_replay(spark, cfg)
    assert any(r.skipped_as_committed for r in recs) or len(recs) > 0
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    _assert_table_equal(sink.read_table(), _oracle(spark, cfg.changes_dir))


@pytest.mark.parametrize("crash_after", [1, 2, 4, 7])
def test_resume_lossless_from_any_checkpoint(spark, tmp_path, crash_after):
    """North rule: 'resumable from ANY checkpoint mid-replay' — crash
    after every prefix length of the batch sequence; each resume must
    reach the identical oracle state."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    _gen(tmp_path, seed=24, n_conversations=60, n_segments=8)
    cfg = _engine_cfg(tmp_path, max_files_per_trigger=1)
    with pytest.raises(StreamingQueryException):
        run_replay(spark, cfg, fail_after_batches=crash_after)
    run_replay(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    _assert_table_equal(sink.read_table(), _oracle(spark, cfg.changes_dir))


# -------------------------------------------------------- edge semantics
def test_delete_semantics_tombstone_vs_late_update(spark, tmp_path):
    """A delete beats earlier updates but loses to a later one (R3)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = {
        "seq": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "op": pa.array(["I", "U", "D", "I", "D"], pa.string()),
        "conv_id": pa.array(["c1", "c1", "c1", "c2", "c2"], pa.string()),
        "turn_idx": pa.array([0, 0, 0, 0, 0], pa.int32()),
        "role": pa.array(["user", "user", None, "user", None], pa.string()),
        "text": pa.array(["a", "b", None, "x", None], pa.string()),
        "tool": pa.array([None] * 5, pa.string()),
        "ts": pa.array([1000, 3000, 2000, 1000, 2000], pa.timestamp("us")),
        "source_file": pa.array(["s"] * 5, pa.string()),
        "offset": pa.array([0, 1, 2, 3, 4], pa.int64()),
    }
    d = tmp_path / "changes"
    d.mkdir()
    pq.write_table(pa.table(rows), str(d / "seg-00000.parquet"))
    cfg = _engine_cfg(tmp_path)
    replay_batch(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    out = {r["conv_id"]: r["text"] for r in sink.read_table().collect()}
    # c1: update at ts=3000 beats delete at ts=2000 → alive with text 'b'
    # c2: delete at ts=2000 beats insert at ts=1000 → gone
    assert out == {"c1": "b"}


def test_quarantine_side_output(spark, tmp_path):
    _gen(tmp_path, seed=24, n_conversations=40, malformed_rate=0.05)
    q = str(tmp_path / "quarantine")
    cfg = _engine_cfg(tmp_path, quarantine_dir=q)
    recs = run_replay(spark, cfg)
    assert sum(r.rows_quarantined for r in recs) > 0
    assert spark.read.parquet(q).count() == sum(r.rows_quarantined for r in recs)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    _assert_table_equal(sink.read_table(), _oracle(spark, cfg.changes_dir))


def test_schema_evolution_epochs(spark, tmp_path):
    """Epoch-1 segments lack `tool`; epoch-2 adds it. Old rows read as
    NULL tool; post-evolution rows carry it; final table == oracle."""
    _gen(tmp_path, seed=25, n_conversations=60, n_segments=10, epoch1_fraction=0.5)
    cfg = _engine_cfg(tmp_path, max_files_per_trigger=2)
    run_replay(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    out = sink.read_table()
    assert "tool" in out.columns
    _assert_table_equal(out, _oracle(spark, cfg.changes_dir))
    assert out.filter(F.col("tool").isNotNull()).count() > 0


def test_hot_key_salting_detects_and_matches_oracle(spark, tmp_path):
    """A conversation hammered with updates (hot_frac of the batch on
    n_hot=1 conv) must trip the frequency sketch, flip the merge to the
    two-stage salted reduce, and still byte-match the oracle."""
    _gen(tmp_path, seed=27, n_conversations=40, update_ratio=3.0, hot_frac=0.8, n_hot=1)
    cfg = _engine_cfg(tmp_path, hot_key_threshold=0.05, hot_key_salt=8)
    rec = replay_batch(spark, cfg)
    assert rec.salted
    assert rec.hot_keys and any(h["frac"] > 0.05 for h in rec.hot_keys)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    _assert_table_equal(sink.read_table(), _oracle(spark, cfg.changes_dir))


def test_salted_reduce_equals_plain(spark, tmp_path):
    """Associativity check: salted two-stage LWW == single-stage LWW."""
    from oec_etl_spark.operators.lww import lww_reduce

    _gen(tmp_path, seed=28, n_conversations=50, update_ratio=2.0, tie_ts_frac=0.2)
    df = spark.read.schema(CHANGE_SCHEMA).parquet(str(tmp_path / "changes" / "*.parquet"))
    _assert_table_equal(lww_reduce(df, salt=8), lww_reduce(df))


# -------------------------------------------------------- merge-on-read
def test_mor_replay_equals_oracle(spark, tmp_path):
    """Merge-on-read: every micro-batch appends a delta (never reads
    stored data); the read-time merge must still equal the oracle."""
    _gen(tmp_path, seed=31, n_conversations=60, n_segments=6, duplicate_rate=0.2)
    cfg = _engine_cfg(tmp_path, max_files_per_trigger=2, table_mode="mor")
    recs = run_replay(spark, cfg)
    assert all(r.table_mode == "mor" for r in recs)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets, table_mode="mor")
    man = sink.load_manifest()
    assert any(man["deltas"].values())  # deltas actually accumulated
    _assert_table_equal(sink.read_table(), _oracle(spark, cfg.changes_dir))


def test_mor_compaction_preserves_table_and_speeds_reads(spark, tmp_path):
    _gen(tmp_path, seed=32, n_conversations=50, n_segments=6)
    cfg = _engine_cfg(tmp_path, max_files_per_trigger=2, table_mode="mor")
    run_replay(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets, table_mode="mor")
    before = sorted(map(tuple, sink.read_table().collect()))
    compacted = sink.compact()
    assert compacted  # some buckets had deltas
    man = sink.load_manifest()
    assert not any(man["deltas"].values())  # all delta lists cleared
    after = sink.read_table()
    assert sorted(map(tuple, after.collect())) == before
    _assert_table_equal(after, _oracle(spark, cfg.changes_dir))
    # post-compaction resumes stay correct: apply more batches on top
    import shutil as _sh, glob as _g, os as _os
    extra = GeneratorConfig(out_dir=str(tmp_path / "more"), seed=33, n_conversations=10, n_segments=2)
    generate_changelog(extra)
    for f in _g.glob(f"{extra.out_dir}/*.parquet"):
        _sh.copy(f, f"{cfg.changes_dir}/tail-{_os.path.basename(f)}")
    run_replay(spark, cfg)
    got = sink.read_table()
    assert got.count() > 0


def test_stream_retention_expires_old_snapshots(spark, tmp_path):
    """expire_keep_last: the streaming loop trims the manifest chain to
    the newest N snapshots after each commit — a long-running tail
    cannot grow manifests/superseded versions unboundedly — and the
    final table still equals the oracle."""
    _gen(tmp_path, seed=71, n_conversations=60, n_segments=6)
    cfg = _engine_cfg(tmp_path, max_files_per_trigger=1, expire_keep_last=2)
    recs = run_replay(spark, cfg)
    assert len(recs) >= 5  # many commits...
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    assert len(sink.history()) <= 2  # ...but only the newest 2 retained
    _assert_table_equal(sink.read_table(), _oracle(spark, cfg.changes_dir))


def test_mor_read_prunes_clean_buckets(spark, tmp_path):
    """Partial compaction: clean buckets must read straight from base
    files (no merge shuffle), only dirty buckets pay the LWW reduce —
    and the table still equals the oracle."""
    _gen(tmp_path, seed=61, n_conversations=80)
    cfg = _engine_cfg(tmp_path, table_mode="mor")
    replay_batch(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets, table_mode="mor")
    dirty = [int(b) for b, dd in sink.load_manifest()["deltas"].items() if dd]
    assert len(dirty) >= 2
    sink.compact(dirty[: len(dirty) // 2])  # compact half the buckets
    table = sink.read_table()
    _assert_table_equal(table, _oracle(spark, cfg.changes_dir))
    plan = table._sc._jvm.PythonSQLUtils.explainString(table._jdf.queryExecution(), "simple")
    # one merge branch (dirty buckets) + one plain-scan branch (clean)
    assert "Union" in plan and plan.count("ShuffledHashJoin") == 1
    sink.compact()  # compact the rest → pure scan, no join at all
    plan2 = sink.read_table()
    p2 = plan2._sc._jvm.PythonSQLUtils.explainString(plan2._jdf.queryExecution(), "simple")
    assert "ShuffledHashJoin" not in p2 and "Join" not in p2
    _assert_table_equal(plan2, _oracle(spark, cfg.changes_dir))


def test_mor_auto_compaction_in_stream(spark, tmp_path):
    """compact_after_deltas triggers compaction inside the streaming
    loop once a bucket accumulates that many deltas; final table still
    equals the oracle and delta counts stay bounded."""
    _gen(tmp_path, seed=34, n_conversations=60, n_segments=8)
    cfg = _engine_cfg(tmp_path, max_files_per_trigger=1, table_mode="mor", compact_after_deltas=3)
    run_replay(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets, table_mode="mor")
    man = sink.load_manifest()
    assert all(len(dd) < 3 + 1 for dd in man["deltas"].values())  # bounded
    assert man["buckets"]  # at least one compaction produced a base
    _assert_table_equal(sink.read_table(), _oracle(spark, cfg.changes_dir))


def test_iceberg_sink_raises_clearly_without_runtime(spark):
    """The Iceberg sink must fail loudly (not silently fake) when no
    Iceberg runtime jar / SQL extensions are on the classpath."""
    from oec_etl_spark.streaming.sink import IcebergMergeSink

    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        IcebergMergeSink(spark, "cat.db.transcripts")


def test_time_travel_history_and_expiry(spark, tmp_path):
    """Snapshot isolation surface: read an older version (time travel),
    list history, expire old snapshots without disturbing the current
    reader — then time travel to an expired version fails cleanly."""
    _gen(tmp_path, seed=30, n_conversations=40, n_segments=4)
    cfg = _engine_cfg(tmp_path, max_files_per_trigger=1)
    run_replay(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    hist = sink.history()
    assert len(hist) >= 4 and [h["version"] for h in hist] == sorted(h["version"] for h in hist)
    v_old = hist[0]["version"]
    old_rows = sink.read_table(version=v_old).count()
    cur_rows = sink.read_table().count()
    assert 0 < old_rows <= cur_rows
    deleted = sink.expire_snapshots(keep_last=1)
    assert deleted
    assert sink.read_table().count() == cur_rows  # current snapshot intact
    with pytest.raises(FileNotFoundError):
        sink.read_table(version=v_old)
    _assert_table_equal(sink.read_table(), _oracle(spark, cfg.changes_dir))


def test_type_widening_across_batches(spark, tmp_path):
    """A later batch delivering a widened type (float→double on a new
    measure column) must widen the target schema losslessly; rows from
    before the column existed read as NULL."""
    from pyspark.sql import functions as F

    def batch(rows, schema):
        return spark.createDataFrame(rows, schema)

    base = "seq long, op string, conv_id string, turn_idx int, role string, text string, ts timestamp"
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), 4)
    sink.merge(batch([(1, "I", "c1", 0, "user", "a", t)], base), batch_id=0)
    sink.merge(
        batch([(2, "I", "c2", 0, "user", "b", t, 1.5)], base + ", score float"), batch_id=1
    )
    sink.merge(
        batch([(3, "I", "c3", 0, "user", "c", t, 2.5)], base + ", score double"), batch_id=2
    )
    out = sink.read_table()
    assert dict(out.dtypes)["score"] == "double"
    got = {r["conv_id"]: r["score"] for r in out.collect()}
    assert got == {"c1": None, "c2": 1.5, "c3": 2.5}


def test_sink_honors_manifest_bucket_count(spark, tmp_path):
    """A sink handle opened with the WRONG n_buckets must follow the
    committed manifest's layout: otherwise a second batch's rows hash
    to different buckets than the stored winners, the merge reads the
    wrong stored rows, and an update survives next to the row it should
    replace."""
    _gen(tmp_path, seed=41, n_conversations=50, n_segments=2)
    cfg = _engine_cfg(tmp_path)  # n_buckets=8
    replay_batch(spark, cfg)
    # reopen with a mismatched constructor value and apply more changes
    import datetime as dt

    sink2 = ParquetSnapshotSink(spark, cfg.target_dir, n_buckets=32)
    existing = sink2.read_table().limit(5).collect()
    assert sink2.n_buckets == 8  # manifest wins (synced on read/merge)
    upd = [
        (10_000_000 + i, "U", r["conv_id"], r["turn_idx"], r["role"], "rewritten", r["tool"],
         dt.datetime(2030, 1, 1))
        for i, r in enumerate(existing)
    ]
    schema = "seq long, op string, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    sink2.merge(spark.createDataFrame(upd, schema), batch_id=999)
    out = sink2.read_table()
    # no duplicate keys, and every updated key shows the new text
    assert out.groupBy("conv_id", "turn_idx").count().filter(F.col("count") > 1).count() == 0
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in out.join(
            spark.createDataFrame([(u[2], u[3]) for u in upd], "conv_id string, turn_idx int"),
            on=["conv_id", "turn_idx"],
        ).collect()
    }
    assert set(got.values()) == {"rewritten"}


def test_rebucket_layout_evolution(spark, tmp_path):
    """rebucket() rewrites the table into a new bucket count atomically;
    time travel to the old layout still works, later merges use the new
    layout, and the final state still equals the oracle."""
    _gen(tmp_path, seed=42, n_conversations=60, n_segments=4)
    cfg = _engine_cfg(tmp_path, max_files_per_trigger=2)
    run_replay(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    before = sink.read_table()
    v_before = sink.load_manifest()["version"]
    n_written = sink.rebucket(32)
    assert n_written > 8
    man = sink.load_manifest()
    assert man["n_buckets"] == 32
    _assert_table_equal(sink.read_table(), before)
    _assert_table_equal(sink.read_table(version=v_before), before)  # time travel intact
    # another merge on the new layout still matches the batch oracle
    import datetime as dt

    row = before.limit(1).collect()[0]
    sink.merge(
        spark.createDataFrame(
            [(99_000_000, "U", row["conv_id"], row["turn_idx"], row["role"], "after-rebucket",
              row["tool"], dt.datetime(2031, 1, 1))],
            "seq long, op string, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
        ),
        batch_id=1000,
    )
    out = sink.read_table()
    assert out.filter(
        (F.col("conv_id") == row["conv_id"]) & (F.col("turn_idx") == row["turn_idx"])
    ).first()["text"] == "after-rebucket"
    assert out.groupBy("conv_id", "turn_idx").count().filter(F.col("count") > 1).count() == 0


def test_write_sorted_orders_files_by_key(spark, tmp_path):
    """write_sorted=True (WRITE ORDERED BY analog): every data file is
    physically ordered by (conv_id, turn_idx), and the table still
    equals the oracle."""
    import pyarrow.parquet as pq

    _gen(tmp_path, seed=61, n_conversations=50, n_segments=3)
    cfg = _engine_cfg(tmp_path)
    df = spark.read.schema(CHANGE_SCHEMA).parquet(f"{cfg.changes_dir}/*.parquet")
    valid, _ = quarantine_split(df)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, 8, write_sorted=True)
    sink.merge(valid, batch_id=0)
    _assert_table_equal(sink.read_table(), _oracle(spark, cfg.changes_dir))
    checked = 0
    for root, _dirs, files in os.walk(cfg.target_dir):
        for f in files:
            if f.endswith(".parquet") and "__bucket=" in root:
                t = pq.read_table(os.path.join(root, f), columns=["conv_id", "turn_idx"])
                keys = list(zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist()))
                assert keys == sorted(keys), f"unsorted file {f}"
                checked += 1
    assert checked >= 4


def test_snapshot_tags_survive_expiry(spark, tmp_path):
    """A tagged snapshot stays readable after expire_snapshots even
    when it falls outside the keep-last horizon; untagged old versions
    are expired as before."""
    _gen(tmp_path, seed=63, n_conversations=40, n_segments=4)
    cfg = _engine_cfg(tmp_path, max_files_per_trigger=1)
    run_replay(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    hist = sink.history()
    assert len(hist) >= 4
    v_tagged, v_untagged = hist[0]["version"], hist[1]["version"]
    rows_tagged = sink.read_table(v_tagged).count()
    sink.tag("baseline", v_tagged)
    assert sink.tags() == {"baseline": v_tagged}
    sink.expire_snapshots(keep_last=1)
    assert sink.read_table(sink.tags()["baseline"]).count() == rows_tagged
    with pytest.raises(FileNotFoundError):
        sink.read_table(v_untagged)
    _assert_table_equal(sink.read_table(), _oracle(spark, cfg.changes_dir))


def test_concurrent_commit_rejected(spark, tmp_path):
    """Optimistic concurrency: a commit derived from a stale manifest
    (another writer advanced CURRENT meanwhile) must raise instead of
    clobbering the other writer's snapshot."""
    from oec_etl_spark.streaming.sink import ConcurrentCommitError

    _gen(tmp_path, seed=62, n_conversations=30, n_segments=2)
    cfg = _engine_cfg(tmp_path)
    replay_batch(spark, cfg)  # commits v1
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    stale = sink.load_manifest()  # derived from v1
    # a second writer advances the table
    import datetime as dt

    other = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    other.merge(
        spark.createDataFrame(
            [(9_000_000, "I", "c-new", 0, "u", "x", None, dt.datetime(2030, 1, 1))],
            "seq long, op string, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
        ),
        batch_id=500,
    )  # commits v2
    stale["version"] += 1  # the stale writer also thinks it commits v2
    with pytest.raises(ConcurrentCommitError):
        sink._commit(stale)
    # the winning writer's snapshot is intact
    assert sink.load_manifest()["version"] == 2
    assert sink.read_table().filter(F.col("conv_id") == "c-new").count() == 1


_EVEN = "CAST(substr(conv_id, length(conv_id), 1) AS INT) % 2 = 0"


def test_routed_fanout_partitions_stream_exactly(spark, tmp_path):
    """cfg.routes fans one change stream out to per-route snapshot
    tables; the union of the targets must equal the single-target
    oracle and each target must satisfy its own predicate."""
    _gen(tmp_path, seed=51, n_conversations=60, n_segments=4)
    cfg = _engine_cfg(tmp_path, max_files_per_trigger=2, routes={"even": _EVEN, "rest": "*"})
    recs = run_replay(spark, cfg)
    assert {r.route for r in recs} == {"even", "rest"}
    even = ParquetSnapshotSink(spark, f"{cfg.target_dir}/even", cfg.n_buckets).read_table()
    rest = ParquetSnapshotSink(spark, f"{cfg.target_dir}/rest", cfg.n_buckets).read_table()
    assert even.filter(~F.expr(_EVEN)).count() == 0
    assert rest.filter(F.expr(_EVEN)).count() == 0
    _assert_table_equal(even.unionByName(rest), _oracle(spark, cfg.changes_dir))


def test_routed_fanout_mid_batch_crash_resumes_exactly_once(spark, tmp_path):
    """Crash AFTER route 'even' committed a batch but BEFORE 'rest'
    did: on resume the batch is redelivered, 'even' skips it via its
    epoch guard, 'rest' applies it — both targets end exactly right."""
    _gen(tmp_path, seed=52, n_conversations=60, n_segments=4)
    cfg = _engine_cfg(tmp_path, max_files_per_trigger=2, routes={"even": _EVEN, "rest": "*"})
    import pytest as _pytest

    with _pytest.raises(Exception):
        run_replay(spark, cfg, fail_after_batches=3)  # 2 routes/batch → dies mid-batch 2
    recs = run_replay(spark, cfg)  # resume from checkpoint
    assert any(r.skipped_as_committed for r in recs)  # the half-committed batch
    even = ParquetSnapshotSink(spark, f"{cfg.target_dir}/even", cfg.n_buckets).read_table()
    rest = ParquetSnapshotSink(spark, f"{cfg.target_dir}/rest", cfg.n_buckets).read_table()
    _assert_table_equal(even.unionByName(rest), _oracle(spark, cfg.changes_dir))


def test_int_to_long_widening_across_batches(spark, tmp_path):
    """int→bigint widening through the real merge (regression: the
    widening lattice was keyed by API type names, not simpleString
    names, so int→bigint raised SchemaConflict)."""
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    base = "seq long, op string, conv_id string, turn_idx int, role string, text string, ts timestamp"
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), 4)
    sink.merge(
        spark.createDataFrame([(1, "I", "c1", 0, "u", "a", t, 7)], base + ", latency_ms int"),
        batch_id=0,
    )
    sink.merge(
        spark.createDataFrame(
            [(2, "I", "c2", 0, "u", "b", t, 5_000_000_000)], base + ", latency_ms long"
        ),
        batch_id=1,
    )
    out = sink.read_table()
    assert dict(out.dtypes)["latency_ms"] == "bigint"
    got = {r["conv_id"]: r["latency_ms"] for r in out.collect()}
    assert got == {"c1": 7, "c2": 5_000_000_000}


def test_incompatible_type_change_raises(spark, tmp_path):
    from oec_etl_spark.streaming.reconcile import SchemaConflict
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    base = "seq long, op string, conv_id string, turn_idx int, role string, text string, ts timestamp"
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), 4)
    sink.merge(spark.createDataFrame([(1, "I", "c1", 0, "u", "a", t, 1.5)], base + ", score double"), batch_id=0)
    with pytest.raises(SchemaConflict):
        sink.merge(
            spark.createDataFrame([(2, "I", "c2", 0, "u", "b", t, "oops")], base + ", score string"),
            batch_id=1,
        )


def test_json_changelog_format(spark, tmp_path):
    """ndjson binlog segments (Debezium-style wire format) replay to
    the same table as the parquet twin of the identical event stream."""
    _gen(tmp_path, seed=29, n_conversations=40, n_segments=3, file_format="json")
    cfg = _engine_cfg(tmp_path, format="json")
    replay_batch(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    got = sink.read_table()
    twin = GeneratorConfig(out_dir=str(tmp_path / "twin"), seed=29, n_conversations=40, n_segments=3)
    generate_changelog(twin)
    oracle = _oracle(spark, twin.out_dir).drop("ts")  # json ts is µs-lossless but tz-naive
    _assert_table_equal(got.drop("ts"), oracle)
    # ts round-trips to the microsecond through the ndjson path
    a = {(r["conv_id"], r["turn_idx"]): r["ts"] for r in got.collect()}
    b = {(r["conv_id"], r["turn_idx"]): r["ts"] for r in _oracle(spark, twin.out_dir).collect()}
    assert a == b


def test_lineage_counters(spark, tmp_path):
    _gen(tmp_path, seed=26, n_conversations=50, n_segments=4)
    cfg = _engine_cfg(tmp_path, max_files_per_trigger=2)
    recs = run_replay(spark, cfg)
    stats = __import__("json").load(open(f"{cfg.changes_dir}/_meta.json"))
    assert sum(r.rows_in_batch for r in recs) == stats["events_written"]
    assert all(r.seq_min is not None and r.seq_max >= r.seq_min for r in recs if r.rows_in_batch)
    assert os.path.exists(f"{cfg.target_dir}/_lineage/lineage.jsonl")
    # watermarks are monotone per bucket across batches
    seen: dict[str, int] = {}
    for r in recs:
        for b, wm in r.watermarks.items():
            assert wm >= seen.get(b, 0)
            seen[b] = wm
