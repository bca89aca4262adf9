"""Transaction-boundary gate (EngineConfig.transactional): atomic apply
of multi-event transactions whose events straddle micro-batches.

Debezium exposes per-event transaction metadata (id + total count) so a
consumer can reassemble commit-atomic units; the gate holds a
transaction's rows in a per-batch state store until all events arrived
(countDistinct(seq) >= tx_total), releases them to the normal
quarantine → merge path, remembers released tx ids so at-least-once
redeliveries stay idempotent, and expires stragglers to the DLQ with
reason 'tx_timeout' — never force-applying a torn fragment.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.generate import GeneratorConfig, generate_changelog
from oec_etl_spark.operators.lww import materialize
from oec_etl_spark.schemas import CHANGE_SCHEMA, CHANGE_SCHEMA_TX
from oec_etl_spark.streaming.engine import run_replay
from oec_etl_spark.streaming.sink import ParquetSnapshotSink

NSCHEMA = T.StructType([T.StructField(f.name, f.dataType, True) for f in CHANGE_SCHEMA_TX.fields])


def _ts(h, m=0):
    return datetime(2024, 1, 1 + h // 24, h % 24, m, tzinfo=timezone.utc)


def _ev(conv, turn, seq, ts, op="U", text="t", tx=None, total=None):
    return {
        "seq": seq, "op": op, "conv_id": conv, "turn_idx": turn,
        "role": "user", "text": text, "tool": None, "ts": ts,
        "source_file": "s", "offset": seq, "tx_id": tx, "tx_total": total,
    }


def _seg(spark, rows, path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    spark.createDataFrame(rows, NSCHEMA).coalesce(1).write.mode("overwrite").parquet(path + ".tmp")
    part = next(p for p in os.listdir(path + ".tmp") if p.endswith(".parquet"))
    os.replace(os.path.join(path + ".tmp", part), path)
    import shutil
    shutil.rmtree(path + ".tmp")


def _state(sink):
    return {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in sink.read_table().collect()
    }


def _cfg(tmp_path, **kw):
    kw.setdefault("max_files_per_trigger", 1)
    return EngineConfig(
        changes_dir=str(tmp_path / "changes"), target_dir=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "ck"), transactional=True,
        quarantine_dir=str(tmp_path / "dlq"), **kw,
    )


def test_tx_straddle_is_held_then_applied_atomically(spark, tmp_path):
    cfg = _cfg(tmp_path)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, 16)
    # tx-1 touches TWO keys; only its first event is in segment 0
    _seg(spark, [
        _ev("a", 0, 1, _ts(1), op="I", text="auto"),
        _ev("b", 0, 2, _ts(2), op="I", text="txb", tx="tx-1", total=2),
    ], str(tmp_path / "changes" / "seg-0.parquet"))
    recs = run_replay(spark, cfg)
    assert _state(sink) == {("a", 0): "auto"}  # no torn transaction
    assert recs[-1].rows_tx_held == 1 and recs[-1].txs_pending == 1
    # the completing event lands later; same checkpoint
    _seg(spark, [_ev("c", 0, 3, _ts(3), op="I", text="txc", tx="tx-1", total=2)],
         str(tmp_path / "changes" / "seg-1.parquet"))
    recs = run_replay(spark, cfg)
    assert _state(sink) == {("a", 0): "auto", ("b", 0): "txb", ("c", 0): "txc"}
    assert recs[-1].rows_tx_held == 0 and recs[-1].txs_released == 1


def test_tx_atomic_at_every_intermediate_batch(spark, tmp_path):
    """Generator log with txs + duplicates + disorder, delivered one
    segment per replay. After EVERY replay the table must equal the
    materialization of exactly (autocommit ∪ complete-tx) delivered
    events — the all-or-nothing oracle."""
    gen = str(tmp_path / "gen")
    generate_changelog(GeneratorConfig(
        out_dir=gen, seed=11, n_conversations=40, n_segments=5,
        tx_rate=0.4, tx_max_events=4, duplicate_rate=0.1, disorder_window=60))
    cfg = _cfg(tmp_path, max_files_per_trigger=None)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, 16)
    os.makedirs(cfg.changes_dir, exist_ok=True)
    segs = sorted(p for p in os.listdir(gen) if p.endswith(".parquet"))
    for k, s in enumerate(segs):
        os.link(os.path.join(gen, s), os.path.join(cfg.changes_dir, s))
        run_replay(spark, cfg)
        delivered = spark.read.schema(CHANGE_SCHEMA_TX).parquet(
            *[os.path.join(cfg.changes_dir, q) for q in segs[: k + 1]])
        verdict = (
            delivered.filter(F.col("tx_id").isNotNull())
            .groupBy("tx_id")
            .agg((F.countDistinct("seq") >= F.max("tx_total")).alias("ok"))
        )
        eligible = delivered.join(verdict, "tx_id", "left").filter(
            F.col("tx_id").isNull() | F.col("ok")
        ).select(*[f.name for f in CHANGE_SCHEMA.fields])
        want = {(r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"])
                for r in materialize(eligible).collect()}
        got = {(r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"])
               for r in sink.read_table().collect()}
        assert got == want, f"torn state after segment {k}"


def test_tx_crash_and_resume_through_gate(spark, tmp_path):
    gen = str(tmp_path / "changes")
    generate_changelog(GeneratorConfig(
        out_dir=gen, seed=13, n_conversations=50, n_segments=6,
        tx_rate=0.35, tx_max_events=5, duplicate_rate=0.08))
    cfg = _cfg(tmp_path)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, 16)
    with pytest.raises(Exception):
        run_replay(spark, cfg, fail_after_batches=2)
    run_replay(spark, cfg)  # resume from the same checkpoint + tx state
    oracle = materialize(spark.read.schema(CHANGE_SCHEMA).parquet(f"{gen}/*.parquet"))
    want = {(r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"])
            for r in oracle.collect()}
    got = {(r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"])
           for r in sink.read_table().collect()}
    assert got == want


def test_tx_timeout_expires_fragment_to_dlq(spark, tmp_path):
    cfg = _cfg(tmp_path, tx_timeout_batches=1)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, 16)
    _seg(spark, [
        _ev("a", 0, 1, _ts(1), op="I", text="auto"),
        _ev("b", 0, 2, _ts(2), op="I", text="frag", tx="tx-9", total=3),
    ], str(tmp_path / "changes" / "seg-0.parquet"))
    run_replay(spark, cfg)
    _seg(spark, [_ev("c", 0, 3, _ts(3), op="I", text="auto2")],
         str(tmp_path / "changes" / "seg-1.parquet"))
    recs = run_replay(spark, cfg)
    assert recs[-1].rows_tx_expired == 1 and recs[-1].rows_tx_held == 0
    # never applied torn; fragment is in the DLQ with its own reason
    assert _state(sink) == {("a", 0): "auto", ("c", 0): "auto2"}
    dlq = spark.read.parquet(str(tmp_path / "dlq"))
    rows = dlq.filter(F.col("__reject") == "tx_timeout").collect()
    assert [(r["conv_id"], r["seq"]) for r in rows] == [("b", 2)]
    assert "tx_id" not in dlq.columns  # requeue re-applies as autocommit


def test_tx_duplicate_after_release_is_idempotent(spark, tmp_path):
    cfg = _cfg(tmp_path)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, 16)
    _seg(spark, [
        _ev("a", 0, 1, _ts(1), op="I", text="one", tx="tx-1", total=2),
        _ev("b", 0, 2, _ts(2), op="I", text="two", tx="tx-1", total=2),
    ], str(tmp_path / "changes" / "seg-0.parquet"))
    recs = run_replay(spark, cfg)
    assert recs[-1].txs_released == 1
    # at-least-once transport redelivers ONE event of the released tx:
    # the ledger matches it straight through to the idempotent merge —
    # no ghost forever-incomplete transaction
    _seg(spark, [_ev("a", 0, 1, _ts(1), op="I", text="one", tx="tx-1", total=2)],
         str(tmp_path / "changes" / "seg-1.parquet"))
    recs = run_replay(spark, cfg)
    assert recs[-1].rows_tx_held == 0 and recs[-1].txs_pending == 0
    assert recs[-1].rows_tx_expired == 0
    assert _state(sink) == {("a", 0): "one", ("b", 0): "two"}


def test_transactional_reader_on_plain_log_is_pure_autocommit(spark, tmp_path):
    """A log written WITHOUT tx columns reads as all-autocommit under
    the transactional schema: the gate must be a pass-through and the
    result identical to a non-transactional replay."""
    gen = str(tmp_path / "changes")
    generate_changelog(GeneratorConfig(out_dir=gen, seed=17, n_conversations=30,
                                       n_segments=3))
    cfg = _cfg(tmp_path)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, 16)
    recs = run_replay(spark, cfg)
    assert all(r.rows_tx == 0 and r.rows_tx_held == 0 for r in recs)
    oracle = materialize(spark.read.schema(CHANGE_SCHEMA).parquet(f"{gen}/*.parquet"))
    assert sink.read_table().count() == oracle.count()
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in sink.read_table().collect()}
    want = {(r["conv_id"], r["turn_idx"]): r["text"] for r in oracle.collect()}
    assert got == want


def test_cli_verify_transactional_gates_oracle(spark, tmp_path, monkeypatch, capsys):
    """With an incomplete tx held, plain verify sees a diff (the held
    rows) but --transactional verify gates its oracle identically to
    the engine and reports zero."""
    import json

    from oec_etl_spark import session
    from oec_etl_spark.cli import main

    monkeypatch.setattr(session, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    cfg = _cfg(tmp_path)
    _seg(spark, [
        _ev("a", 0, 1, _ts(1), op="I", text="auto"),
        _ev("b", 0, 2, _ts(2), op="I", text="frag", tx="tx-1", total=2),
    ], str(tmp_path / "changes" / "seg-0.parquet"))
    run_replay(spark, cfg)
    base = ["verify", "--changes", cfg.changes_dir, "--target", cfg.target_dir,
            "--buckets", "16"]
    assert main(base) == 1  # held row reads as a diff without the gate
    capsys.readouterr()
    assert main([*base, "--transactional"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["diff_rows"] == 0 and out["oracle_rows"] == 1


def test_replay_batch_transactional_holds_incomplete_tail(spark, tmp_path):
    from oec_etl_spark.streaming.engine import replay_batch

    cfg = _cfg(tmp_path, max_files_per_trigger=None)
    _seg(spark, [
        _ev("a", 0, 1, _ts(1), op="I", text="auto"),
        _ev("b", 0, 2, _ts(2), op="I", text="frag", tx="tx-1", total=2),
    ], str(tmp_path / "changes" / "seg-0.parquet"))
    replay_batch(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, 16)
    assert _state(sink) == {("a", 0): "auto"}  # truncated-log tail held


def test_tx_with_routed_fanout_crash_resume(spark, tmp_path):
    """Transactions + routed fan-out + a mid-routes crash: a released
    transaction's events flow to every route in the same batch; a crash
    after route A committed but before B redelivers the batch, A skips
    via its epoch guard, B applies — no target ever ends torn and the
    union of targets equals the single-target oracle."""
    gen = str(tmp_path / "changes")
    generate_changelog(GeneratorConfig(
        out_dir=gen, seed=17, n_conversations=50, n_segments=6,
        tx_rate=0.4, tx_max_events=4, duplicate_rate=0.08))
    even = "CAST(substr(conv_id, length(conv_id), 1) AS INT) % 2 = 0"
    cfg = _cfg(tmp_path, max_files_per_trigger=2,
               routes={"even": even, "rest": "*"})
    with pytest.raises(Exception):
        run_replay(spark, cfg, fail_after_batches=3)  # dies mid-batch 2
    run_replay(spark, cfg)  # resume through gate + routes
    oracle = materialize(
        spark.read.schema(CHANGE_SCHEMA).parquet(f"{gen}/*.parquet")
    )
    want = {(r["conv_id"], r["turn_idx"]): (r["role"], r["text"])
            for r in oracle.collect()}
    e = ParquetSnapshotSink(spark, f"{cfg.target_dir}/even", 16).read_table()
    r = ParquetSnapshotSink(spark, f"{cfg.target_dir}/rest", 16).read_table()
    assert e.filter(~F.expr(even)).count() == 0
    assert r.filter(F.expr(even)).count() == 0
    got = {(x["conv_id"], x["turn_idx"]): (x["role"], x["text"])
           for x in e.unionByName(r).collect()}
    assert got == want
