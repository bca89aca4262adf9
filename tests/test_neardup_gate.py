"""Ingest-time near-dup suppression gate (EngineConfig.neardup_gate).

Covers: corpus-vs-batch rejection through the CDC-maintained MinHash
index (including gate bootstrap over a pre-existing table), the
own-key exemption (editing a turn never trips the gate), within-batch
earlier-row-survives pairs, DLQ reason attribution + lineage counter,
and the spec validation surface.
"""

from __future__ import annotations

import datetime as dt

import pytest

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.schemas import CHANGE_SCHEMA
from oec_etl_spark.streaming.engine import run_replay
from oec_etl_spark.streaming.neardup_gate import NearDupGate
from oec_etl_spark.streaming.sink import ParquetSnapshotSink

from pyspark.sql import functions as F

TEXT_A = (
    "the quick brown fox jumps over the lazy dog while the rain in spain "
    "stays mainly on the plain and the cat sat on the mat watching clouds"
)
TEXT_A_DUP = TEXT_A.replace("watching clouds", "watching planes")
TEXT_B = (
    "an entirely different conversation about compiling kernels on old "
    "hardware with patience and a well worn keyboard under lamplight"
)
TEXT_C = (
    "yet another unique document describing how to braid bread dough into "
    "six strands without losing count halfway through the process"
)
TEXT_REWRITE = (
    "conversation one has been completely rewritten to talk about sailing "
    "ships across the quiet northern sea at dawn with coffee in hand"
)


def _ts(m):
    return dt.datetime(2026, 1, 1, 12, m)


def _seg(spark, rows, path):
    spark.createDataFrame(rows, CHANGE_SCHEMA).coalesce(1).write.parquet(path)


def _cfg(tmp_path, **kw):
    base = dict(
        changes_dir=str(tmp_path / "changes") + "/*",
        target_dir=str(tmp_path / "target"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_buckets=4,
        quarantine_dir=str(tmp_path / "dlq"),
    )
    base.update(kw)
    return EngineConfig(**base)


def _gate_kw(tmp_path, **gate_kw):
    path = str(tmp_path / "mhidx")
    return dict(
        indexes=[{"kind": "minhash", "path": path}],
        neardup_gate={"index_path": path, "threshold": 0.5, **gate_kw},
    )


def test_corpus_dup_rejected_own_key_edit_passes(spark, tmp_path):
    """Batch 1 ingests ungated; the gate then bootstraps its index over
    the pre-existing table and batch 2's cross-key dup is quarantined
    while a same-key rewrite and a fresh doc pass."""
    (tmp_path / "changes").mkdir()
    _seg(spark, [
        (1, "I", "c1", 0, "user", TEXT_A, None, _ts(0), "s", 0),
        (2, "I", "c2", 0, "user", TEXT_B, None, _ts(1), "s", 1),
    ], str(tmp_path / "changes" / "seg-1"))
    run_replay(spark, _cfg(tmp_path))

    _seg(spark, [
        (3, "I", "c3", 0, "user", TEXT_A_DUP, None, _ts(2), "s", 2),
        (4, "I", "c4", 0, "user", TEXT_C, None, _ts(3), "s", 3),
        (5, "U", "c1", 0, "user", TEXT_REWRITE, None, _ts(4), "s", 4),
    ], str(tmp_path / "changes" / "seg-2"))
    lineages = run_replay(spark, _cfg(tmp_path, **_gate_kw(tmp_path)))

    table = {
        r["conv_id"]: r["text"]
        for r in ParquetSnapshotSink(spark, str(tmp_path / "target"), 4)
        .read_table().collect()
    }
    assert set(table) == {"c1", "c2", "c4"}, "dup c3 must not merge"
    assert table["c1"] == TEXT_REWRITE, "own-key edit must pass the gate"
    dlq = spark.read.parquet(str(tmp_path / "dlq")).collect()
    assert [(r["seq"], r["__reject"]) for r in dlq] == [(3, "neardup")]
    assert sum(rec.rows_neardup for rec in lineages) == 1
    assert sum(rec.rows_quarantined for rec in lineages) == 1


def test_within_batch_earlier_row_survives(spark, tmp_path):
    (tmp_path / "changes").mkdir()
    _seg(spark, [
        (10, "I", "c5", 0, "user", TEXT_A, None, _ts(0), "s", 0),
        (11, "I", "c6", 0, "user", TEXT_A_DUP, None, _ts(1), "s", 1),
        (12, "I", "c7", 0, "user", TEXT_B, None, _ts(2), "s", 2),
    ], str(tmp_path / "changes" / "seg-1"))
    lineages = run_replay(spark, _cfg(tmp_path, **_gate_kw(tmp_path)))
    keys = {
        r["conv_id"]
        for r in ParquetSnapshotSink(spark, str(tmp_path / "target"), 4)
        .read_table().collect()
    }
    assert keys == {"c5", "c7"}, "later near-dup c6 rejected, earlier c5 kept"
    dlq = spark.read.parquet(str(tmp_path / "dlq")).collect()
    assert [(r["seq"], r["__reject"]) for r in dlq] == [(11, "neardup")]
    assert sum(rec.rows_neardup for rec in lineages) == 1


def test_within_batch_can_be_disabled(spark, tmp_path):
    (tmp_path / "changes").mkdir()
    _seg(spark, [
        (10, "I", "c5", 0, "user", TEXT_A, None, _ts(0), "s", 0),
        (11, "I", "c6", 0, "user", TEXT_A_DUP, None, _ts(1), "s", 1),
    ], str(tmp_path / "changes" / "seg-1"))
    run_replay(
        spark, _cfg(tmp_path, **_gate_kw(tmp_path, within_batch=False))
    )
    keys = {
        r["conv_id"]
        for r in ParquetSnapshotSink(spark, str(tmp_path / "target"), 4)
        .read_table().collect()
    }
    assert keys == {"c5", "c6"}, "within-batch pairs pass when disabled"


def test_gated_dup_caught_on_next_batch_when_within_batch_disabled(spark, tmp_path):
    """With within_batch off, the same dup IS caught once its anchor is
    committed and indexed — the corpus path alone converges one batch
    later."""
    (tmp_path / "changes").mkdir()
    _seg(spark, [
        (10, "I", "c5", 0, "user", TEXT_A, None, _ts(0), "s", 0),
    ], str(tmp_path / "changes" / "seg-1"))
    run_replay(spark, _cfg(tmp_path, **_gate_kw(tmp_path, within_batch=False)))
    _seg(spark, [
        (11, "I", "c6", 0, "user", TEXT_A_DUP, None, _ts(1), "s", 1),
    ], str(tmp_path / "changes" / "seg-2"))
    run_replay(spark, _cfg(tmp_path, **_gate_kw(tmp_path, within_batch=False)))
    keys = {
        r["conv_id"]
        for r in ParquetSnapshotSink(spark, str(tmp_path / "target"), 4)
        .read_table().collect()
    }
    assert keys == {"c5"}


def test_deletes_and_redeliveries_are_exempt(spark, tmp_path):
    """Tombstones carry no payload and must never be gated; an exact
    redelivery of an already-ingested row matches only its OWN key and
    passes (the idempotent merge neutralizes it)."""
    (tmp_path / "changes").mkdir()
    _seg(spark, [
        (1, "I", "c1", 0, "user", TEXT_A, None, _ts(0), "s", 0),
        (2, "I", "c2", 0, "user", TEXT_B, None, _ts(1), "s", 1),
    ], str(tmp_path / "changes" / "seg-1"))
    run_replay(spark, _cfg(tmp_path, **_gate_kw(tmp_path)))
    _seg(spark, [
        (1, "I", "c1", 0, "user", TEXT_A, None, _ts(0), "s2", 0),  # redelivery
        (3, "D", "c2", 0, None, None, None, _ts(2), "s2", 1),
    ], str(tmp_path / "changes" / "seg-2"))
    lineages = run_replay(spark, _cfg(tmp_path, **_gate_kw(tmp_path)))
    rows = (
        ParquetSnapshotSink(spark, str(tmp_path / "target"), 4)
        .read_table().collect()
    )
    assert {r["conv_id"] for r in rows} == {"c1"}
    assert sum(rec.rows_neardup for rec in lineages) == 0


def test_spec_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="routed fan-out"):
        _cfg(tmp_path, routes={"a": "*"}, neardup_gate={"index_path": "x"})
    cfg = _cfg(tmp_path, neardup_gate={"index_path": str(tmp_path / "mhidx")})
    with pytest.raises(ValueError, match="indexes entry"):
        NearDupGate(spark, cfg)  # gate without the declared index
    gk = _gate_kw(tmp_path)
    gk["neardup_gate"]["typo_knob"] = 1
    with pytest.raises(ValueError, match="unknown neardup_gate keys"):
        NearDupGate(spark, _cfg(tmp_path, **gk))
    bad2 = _cfg(tmp_path, **_gate_kw(tmp_path, threshold=1.5))
    with pytest.raises(ValueError, match="threshold"):
        NearDupGate(spark, bad2)


def test_requeue_reinjects_neardup_rows(spark, tmp_path):
    """The DLQ drain speaks the same reason vocabulary: requeue of
    'neardup' rows re-injects them as a change segment; with the gate
    dropped (policy change) the row then merges."""
    from oec_etl_spark.streaming.engine import requeue_quarantined

    (tmp_path / "changes").mkdir()
    _seg(spark, [
        (1, "I", "c1", 0, "user", TEXT_A, None, _ts(0), "s", 0),
    ], str(tmp_path / "changes" / "seg-1"))
    run_replay(spark, _cfg(tmp_path, **_gate_kw(tmp_path)))
    _seg(spark, [
        (2, "I", "c3", 0, "user", TEXT_A_DUP, None, _ts(1), "s", 1),
    ], str(tmp_path / "changes" / "seg-2"))
    run_replay(spark, _cfg(tmp_path, **_gate_kw(tmp_path)))
    out = requeue_quarantined(
        spark, str(tmp_path / "dlq"), str(tmp_path / "changes"),
        reasons=["neardup"],
    )
    assert out["requeued"] == 1
    run_replay(spark, _cfg(tmp_path))  # gate dropped: row now admitted
    keys = {
        r["conv_id"]
        for r in ParquetSnapshotSink(spark, str(tmp_path / "target"), 4)
        .read_table().collect()
    }
    assert keys == {"c1", "c3"}


def test_pipeline_spec_resolves_gate_paths(tmp_path):
    from oec_etl_spark.pipeline import load_pipeline

    spec = tmp_path / "job.yaml"
    spec.write_text(
        "changes: changes\n"
        "target: target\n"
        "checkpoint: ckpt\n"
        "indexes:\n"
        "  - {kind: minhash, path: mhidx}\n"
        "neardup_gate: {index_path: mhidx, threshold: 0.6}\n"
    )
    _, cfg = load_pipeline(str(spec))
    assert cfg.neardup_gate["index_path"] == str(tmp_path / "mhidx")
    assert cfg.indexes[0]["path"] == str(tmp_path / "mhidx")
    assert cfg.neardup_gate["threshold"] == 0.6
