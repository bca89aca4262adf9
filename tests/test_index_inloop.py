"""Derived indexes declared on EngineConfig.indexes are maintained
inside the streaming loop: built on first sight, refreshed after every
commit, exact vs a from-scratch build at the final head — for both the
IVF ANN index and the MinHash-LSH near-dup index, including through a
pipeline-spec round trip."""

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
]
EMBED = hash_embed_expr("coalesce(text, '')", 8)
QVEC = [0.3, -0.1, 0.2, 0.0, 0.1, -0.2, 0.0, 0.3]


def test_inloop_indexes_stay_exact(spark, tmp_path):
    generate_changelog(
        GeneratorConfig(out_dir=str(tmp_path / "changes"), seed=91,
                        n_conversations=30, n_segments=4, update_ratio=1.2)
    )
    cfg = EngineConfig(
        changes_dir=str(tmp_path / "changes"), target_dir=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "c"), n_buckets=8, max_files_per_trigger=1,
        indexes=[
            {"kind": "ivf", "path": str(tmp_path / "ivf"),
             "centroids": [[i, v] for i, v in CENTROIDS], "embed_expr": EMBED},
            {"kind": "minhash", "path": str(tmp_path / "mh")},
        ],
    )
    run_replay(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, 8)

    ivf = IvfIndexView(spark, str(tmp_path / "ivf"), CENTROIDS, EMBED)
    man = ivf._load_manifest()
    assert man is not None and man["base_version"] == sink.load_manifest()["version"]
    ref = IvfIndexView(spark, str(tmp_path / "ref_ivf"), CENTROIDS, EMBED)
    ref.build(sink)
    assert [tuple(r) for r in ivf.query(QVEC).collect()] == [
        tuple(r) for r in ref.query(QVEC).collect()
    ]

    mh = MinHashIndexView(spark, str(tmp_path / "mh"))
    ref_mh = MinHashIndexView(spark, str(tmp_path / "ref_mh"))
    ref_mh.build(sink)
    assert {tuple(r) for r in mh.bands_current().collect()} == {
        tuple(r) for r in ref_mh.bands_current().collect()
    }


def test_unknown_index_kind_raises(spark, tmp_path):
    from oec_etl_spark.streaming.engine import _index_view

    with pytest.raises(ValueError, match="unknown index kind"):
        _index_view(spark, {"kind": "btree", "path": str(tmp_path)})


def test_pipeline_spec_carries_indexes(tmp_path):
    from oec_etl_spark.pipeline import load_pipeline as load_spec

    spec = tmp_path / "job.yaml"
    spec.write_text(
        "mode: replay\n"
        "changes_dir: changes\n"
        "target_dir: t\n"
        "checkpoint_dir: c\n"
        "indexes:\n"
        "  - kind: minhash\n"
        "    path: mh_idx\n"
    )
    _mode, cfg = load_spec(str(spec))
    assert cfg.indexes and cfg.indexes[0]["kind"] == "minhash"
    assert cfg.indexes[0]["path"] == str(tmp_path / "mh_idx")
