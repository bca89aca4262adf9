"""Churn stress for the derived-index views: a delete-heavy,
duplicate-laden, disordered change log replayed in several slices,
with BOTH indexes refreshed between slices — each refresh must stay
exact vs a from-scratch build at that head, and compaction anywhere
in the sequence must not change any later answer."""

from __future__ import annotations

import pytest

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.generate import GeneratorConfig, generate_changelog
from oec_etl_spark.streaming.ann_index import IvfIndexView, hash_embed_expr
from oec_etl_spark.streaming.dedup_index import MinHashIndexView
from oec_etl_spark.streaming.engine import run_replay
from oec_etl_spark.streaming.sink import ParquetSnapshotSink

CENTROIDS = [
    (0, [0.4, 0.0, 0.0, 0.0, 0.3, 0.0, 0.0, 0.1]),
    (1, [0.0, 0.4, 0.0, 0.2, 0.0, 0.0, 0.1, 0.0]),
    (2, [0.0, 0.0, 0.4, 0.0, 0.0, 0.3, 0.0, 0.0]),
    (3, [-0.4, 0.1, 0.0, 0.0, 0.0, 0.0, 0.3, 0.0]),
]
EMBED = hash_embed_expr("coalesce(text, '')", 8)
QVEC = [0.3, -0.1, 0.2, 0.0, 0.1, -0.2, 0.0, 0.3]


def test_indexes_exact_under_heavy_churn(spark, tmp_path):
    generate_changelog(
        GeneratorConfig(
            out_dir=str(tmp_path / "changes"), seed=97, n_conversations=35,
            n_segments=8, update_ratio=2.0, delete_ratio=0.3,
            duplicate_rate=0.15, disorder_window=80, tie_ts_frac=0.1,
        )
    )
    cfg = EngineConfig(
        changes_dir=str(tmp_path / "changes"), target_dir=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "c"), n_buckets=8, max_files_per_trigger=2,
    )
    sink = ParquetSnapshotSink(spark, cfg.target_dir, 8)
    ivf = IvfIndexView(spark, str(tmp_path / "ivf"), CENTROIDS, EMBED)
    mh = MinHashIndexView(spark, str(tmp_path / "mh"))

    step = 0
    for stop_after in (1, 1, 1, None):
        if stop_after is not None:
            with pytest.raises(Exception, match="injected failure"):
                run_replay(spark, cfg, fail_after_batches=stop_after)
        else:
            run_replay(spark, cfg)
        ivf.sync(sink)
        mh.sync(sink)
        if step == 2:  # compact mid-sequence; later slices must still be exact
            ivf.compact()
            mh.compact()
        step += 1

        ref_ivf = IvfIndexView(spark, str(tmp_path / f"ri{step}"), CENTROIDS, EMBED)
        ref_ivf.build(sink)
        assert [tuple(r) for r in ivf.query(QVEC, k=8, nprobe=2).collect()] == [
            tuple(r) for r in ref_ivf.query(QVEC, k=8, nprobe=2).collect()
        ], f"ivf drifted at slice {step}"

        ref_mh = MinHashIndexView(spark, str(tmp_path / f"rm{step}"))
        ref_mh.build(sink)
        assert {tuple(r) for r in mh.bands_current().collect()} == {
            tuple(r) for r in ref_mh.bands_current().collect()
        }, f"minhash drifted at slice {step}"
