"""Persisted materialized views maintained incrementally off the CDF:
every refresh must equal a from-scratch recompute on the base head —
across inserts, updates, deletes, no-ops, rollbacks, and restarts —
while doing only O(|changed keys|) work after the first build."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.generate import GeneratorConfig, generate_changelog
from oec_etl_spark.streaming.engine import run_replay
from oec_etl_spark.streaming.mview import MaterializedView, ViewSpecMismatch
from oec_etl_spark.streaming.sink import ParquetSnapshotSink

KEYS = ["role"]
SUMS = {"chars": "length(coalesce(text, ''))", "turns": "1"}


def _recompute(sink):
    base = sink.read_table()
    for name, expr in SUMS.items():
        base = base.withColumn(name, F.expr(expr))
    out = base.groupBy(*KEYS).agg(
        F.count(F.lit(1)).alias("n"), *[F.sum(c).alias(c) for c in SUMS]
    )
    return {tuple(r[k] for k in KEYS): (r["n"], r["chars"], r["turns"]) for r in out.collect()}


def _view_state(mv):
    return {
        tuple(r[k] for k in KEYS): (r["n"], r["chars"], r["turns"]) for r in mv.read().collect()
    }


def test_mview_refresh_equals_recompute_across_batches(spark, tmp_path):
    generate_changelog(
        GeneratorConfig(out_dir=str(tmp_path / "changes"), seed=61,
                        n_conversations=50, n_segments=6, update_ratio=1.5)
    )
    cfg = EngineConfig(
        changes_dir=str(tmp_path / "changes"), target_dir=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "c"), n_buckets=8, max_files_per_trigger=2,
    )
    sink = ParquetSnapshotSink(spark, cfg.target_dir, 8)
    mv = MaterializedView(spark, str(tmp_path / "mv"), KEYS, sum_exprs=SUMS)

    seen_modes = []
    # replay in three slices, refreshing between each — the view sees
    # several base commits per refresh and must stay exact
    for stop_after in (1, 1, None):
        if stop_after is not None:
            with pytest.raises(Exception, match="injected failure"):
                run_replay(spark, cfg, fail_after_batches=stop_after)
        else:
            run_replay(spark, cfg)
        rep = mv.refresh(sink)
        seen_modes.append(rep["mode"])
        assert _view_state(mv) == _recompute(sink)
    assert seen_modes[0] == "full" and "incremental" in seen_modes[1:]


def test_mview_noop_and_rollback(spark, tmp_path):
    generate_changelog(
        GeneratorConfig(out_dir=str(tmp_path / "changes"), seed=62,
                        n_conversations=30, n_segments=4)
    )
    cfg = EngineConfig(
        changes_dir=str(tmp_path / "changes"), target_dir=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "c"), n_buckets=8, max_files_per_trigger=1,
    )
    run_replay(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, 8)
    mv = MaterializedView(spark, str(tmp_path / "mv"), KEYS, sum_exprs=SUMS)
    first = mv.refresh(sink)
    assert first["mode"] == "full"
    again = mv.refresh(sink)
    assert again["mode"] == "noop" and again["view_version"] == first["view_version"]

    # a rollback is just another base version: the next refresh diffs
    # against it and the view converges to the rolled-back state
    sink.rollback(2)
    rep = mv.refresh(sink)
    assert rep["mode"] == "incremental"
    assert _view_state(mv) == _recompute(sink)


def test_mview_spec_mismatch_refuses(spark, tmp_path):
    generate_changelog(
        GeneratorConfig(out_dir=str(tmp_path / "changes"), seed=63,
                        n_conversations=10, n_segments=1)
    )
    cfg = EngineConfig(
        changes_dir=str(tmp_path / "changes"), target_dir=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "c"), n_buckets=8,
    )
    run_replay(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, 8)
    MaterializedView(spark, str(tmp_path / "mv"), KEYS, sum_exprs=SUMS).refresh(sink)
    other = MaterializedView(spark, str(tmp_path / "mv"), ["conv_id"], sum_exprs={})
    with pytest.raises(ViewSpecMismatch):
        other.refresh(sink)


def test_mview_state_pruning_keeps_two_versions(spark, tmp_path):
    generate_changelog(
        GeneratorConfig(out_dir=str(tmp_path / "changes"), seed=64,
                        n_conversations=20, n_segments=4)
    )
    cfg = EngineConfig(
        changes_dir=str(tmp_path / "changes"), target_dir=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "c"), n_buckets=8, max_files_per_trigger=1,
    )
    sink = ParquetSnapshotSink(spark, cfg.target_dir, 8)
    mv = MaterializedView(spark, str(tmp_path / "mv"), KEYS, sum_exprs=SUMS)
    with pytest.raises(Exception, match="injected failure"):
        run_replay(spark, cfg, fail_after_batches=1)
    mv.refresh(sink)
    with pytest.raises(Exception, match="injected failure"):
        run_replay(spark, cfg, fail_after_batches=1)
    mv.refresh(sink)
    run_replay(spark, cfg)
    rep = mv.refresh(sink)
    assert rep["view_version"] == 3
    dirs = sorted(os.listdir(tmp_path / "mv" / "state"))
    assert dirs == ["v000002", "v000003"]  # older state reclaimed
    assert _view_state(mv) == _recompute(sink)


def test_mview_cli_roundtrip(spark, tmp_path, monkeypatch, capsys):
    generate_changelog(
        GeneratorConfig(out_dir=str(tmp_path / "changes"), seed=65,
                        n_conversations=15, n_segments=2)
    )
    cfg = EngineConfig(
        changes_dir=str(tmp_path / "changes"), target_dir=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "c"), n_buckets=8,
    )
    run_replay(spark, cfg)
    from oec_etl_spark import cli, session

    monkeypatch.setattr(session, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    argv = ["mview", "--target", cfg.target_dir, "--view", str(tmp_path / "mv"),
            "--keys", "role", "--sum", "chars=length(coalesce(text, ''))", "--buckets", "8"]
    assert cli.main(argv) == 0
    first = json.loads(capsys.readouterr().out.strip())
    assert first["mode"] == "full" and first["groups"] > 0
    assert cli.main(argv) == 0
    assert json.loads(capsys.readouterr().out.strip())["mode"] == "noop"


def test_engine_maintains_views_inside_the_loop(spark, tmp_path):
    """EngineConfig.mviews: the streaming loop refreshes declared views
    after every batch commit — after an interrupted replay plus resume,
    the view is current with no manual refresh ever issued."""
    generate_changelog(
        GeneratorConfig(out_dir=str(tmp_path / "changes"), seed=66,
                        n_conversations=40, n_segments=5, update_ratio=1.0)
    )
    spec = {"path": str(tmp_path / "mv"), "group_keys": KEYS, "sum_exprs": SUMS}
    cfg = EngineConfig(
        changes_dir=str(tmp_path / "changes"), target_dir=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "c"), n_buckets=8, max_files_per_trigger=1,
        mviews=[spec],
    )
    with pytest.raises(Exception, match="injected failure"):
        run_replay(spark, cfg, fail_after_batches=2)
    run_replay(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, 8)
    mv = MaterializedView(spark, spec["path"], KEYS, sum_exprs=SUMS)
    man = mv._load_manifest()
    assert man["base_version"] == sink.load_manifest()["version"]  # current, not stale
    assert man["view_version"] >= 4  # refreshed per batch, not once at the end
    assert _view_state(mv) == _recompute(sink)
