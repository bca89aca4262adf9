"""Trigger-level metrics feed (StreamingQueryListener → JSONL): the
Spark-side view — rows/sec, per-trigger latency breakdown, source
offset ranges — complementing the merge-semantics lineage log."""

from __future__ import annotations

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.generate import GeneratorConfig, generate_changelog
from oec_etl_spark.streaming.engine import run_replay
from oec_etl_spark.streaming.metrics import read_progress


def test_replay_emits_progress_metrics(spark, tmp_path):
    generate_changelog(
        GeneratorConfig(out_dir=str(tmp_path / "changes"), seed=51,
                        n_conversations=40, n_segments=4)
    )
    metrics = str(tmp_path / "metrics.jsonl")
    cfg = EngineConfig(
        changes_dir=str(tmp_path / "changes"),
        target_dir=str(tmp_path / "target"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_buckets=8,
        max_files_per_trigger=1,
        metrics_path=metrics,
    )
    recs = run_replay(spark, cfg)
    events = read_progress(metrics)
    kinds = [e["event"] for e in events]
    assert kinds[0] == "started"
    # run_replay drains the listener bus before detaching, so the
    # terminated event is guaranteed on disk
    assert kinds[-1] == "terminated" and events[-1]["exception"] is None
    progress = [e for e in events if e["event"] == "progress"]
    # one progress record per data-carrying trigger, same batch count
    # and total rows as the lineage view
    with_rows = [p for p in progress if p["num_input_rows"]]
    assert len(with_rows) == len(recs)
    # numInputRows sums the source scan across every action inside
    # foreachBatch (the merge reads its batch several times: stats agg,
    # source-file scan, slim agg + winner semi-join, write), so it is a
    # multiple of the lineage row count — total scan volume, not
    # distinct rows. Both views are wanted; assert consistency only.
    by_batch = {r.batch_id: r.rows_in_batch for r in recs}
    for p in with_rows:
        rows = by_batch[p["batch_id"]]
        assert p["num_input_rows"] >= rows and p["num_input_rows"] % rows == 0
    p = with_rows[0]
    assert p["duration_ms"].get("addBatch", 0) > 0  # the foreachBatch body
    assert p["sources"] and p["sources"][0]["end_offset"] is not None
    assert p["processed_rows_per_sec"] > 0


def test_metrics_off_by_default(spark, tmp_path):
    generate_changelog(
        GeneratorConfig(out_dir=str(tmp_path / "changes"), seed=52,
                        n_conversations=10, n_segments=1)
    )
    cfg = EngineConfig(
        changes_dir=str(tmp_path / "changes"),
        target_dir=str(tmp_path / "target"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_buckets=8,
    )
    run_replay(spark, cfg)
    assert read_progress(str(tmp_path / "metrics.jsonl")) == []
