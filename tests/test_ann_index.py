"""CDC-maintained IVF ANN index: every query under the merge-on-read
overlay must equal a from-scratch index rebuild at the base head;
refresh must be O(changed keys) (base index untouched); compaction
must rewrite only affected partitions and hard-link the rest."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.generate import GeneratorConfig, generate_changelog
from oec_etl_spark.streaming.ann_index import (
    IndexSpecMismatch,
    IvfIndexView,
    hash_embed_expr,
)
from oec_etl_spark.streaming.engine import run_replay
from oec_etl_spark.streaming.sink import ParquetSnapshotSink

# deterministic, well-spread centroids in the hash-embed space
CENTROIDS = [
    (0, [0.4, 0.0, 0.0, 0.0, 0.3, 0.0, 0.0, 0.1]),
    (1, [0.0, 0.4, 0.0, 0.2, 0.0, 0.0, 0.1, 0.0]),
    (2, [0.0, 0.0, 0.4, 0.0, 0.0, 0.3, 0.0, 0.0]),
    (3, [-0.4, 0.1, 0.0, 0.0, 0.0, 0.0, 0.3, 0.0]),
]
EMBED = hash_embed_expr("coalesce(text, '')", 8)
QVEC = [0.3, -0.1, 0.2, 0.0, 0.1, -0.2, 0.0, 0.3]


def _setup(spark, tmp_path, seed, n_conv=40, n_segments=6):
    generate_changelog(
        GeneratorConfig(out_dir=str(tmp_path / "changes"), seed=seed,
                        n_conversations=n_conv, n_segments=n_segments,
                        update_ratio=1.5)
    )
    cfg = EngineConfig(
        changes_dir=str(tmp_path / "changes"), target_dir=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "c"), n_buckets=8, max_files_per_trigger=2,
    )
    sink = ParquetSnapshotSink(spark, cfg.target_dir, 8)
    return cfg, sink


def _rows(df):
    return [
        (r["conv_id"], r["turn_idx"], r["cos"])
        for r in df.collect()
    ]


def _rebuilt_answer(spark, sink, tmp_path, k=10, nprobe=2):
    """The oracle: a fresh full build at the current head, same query."""
    ref = IvfIndexView(spark, str(tmp_path / "ref_idx"), CENTROIDS, EMBED)
    ref.build(sink)
    return _rows(ref.query(QVEC, k=k, nprobe=nprobe))


def test_overlay_query_equals_full_rebuild(spark, tmp_path):
    cfg, sink = _setup(spark, tmp_path, seed=71)
    # slice 1: build the index at an early base version
    with pytest.raises(Exception, match="injected failure"):
        run_replay(spark, cfg, fail_after_batches=1)
    idx = IvfIndexView(spark, str(tmp_path / "idx"), CENTROIDS, EMBED)
    rep = idx.build(sink)
    assert rep["mode"] == "full"
    assert _rows(idx.query(QVEC)) == _rebuilt_answer(spark, sink, tmp_path / "o1")

    # slice 2: more CDC batches (updates move keys between clusters,
    # deletes remove them) — refresh only, never rebuild
    run_replay(spark, cfg)
    rep = idx.refresh(sink)
    assert rep["mode"] == "incremental" and rep["dirty_keys"] > 0
    assert _rows(idx.query(QVEC)) == _rebuilt_answer(spark, sink, tmp_path / "o2")
    # exactness across a different probe width too
    assert _rows(idx.query(QVEC, k=5, nprobe=3)) == _rebuilt_answer(
        spark, sink, tmp_path / "o3", k=5, nprobe=3
    )


def test_refresh_is_o_changed_keys_and_noop(spark, tmp_path):
    cfg, sink = _setup(spark, tmp_path, seed=72)
    with pytest.raises(Exception, match="injected failure"):
        run_replay(spark, cfg, fail_after_batches=1)
    idx = IvfIndexView(spark, str(tmp_path / "idx"), CENTROIDS, EMBED)
    idx.build(sink)
    man0 = idx._load_manifest()
    base_root = tmp_path / "idx" / man0["state_dir"]
    base_files = sorted(
        os.path.join(dp, f) for dp, _d, fs in os.walk(base_root) for f in fs
    )
    v0 = sink.load_manifest()["version"]

    run_replay(spark, cfg)
    v1 = sink.load_manifest()["version"]
    rep = idx.refresh(sink)
    # dirty rows == net changed keys in the base CDF over that range
    changed = sink.changelog(v0, v1).count()
    assert rep["dirty_keys"] == changed > 0
    # the base index was not rewritten: same dir, same files
    man1 = idx._load_manifest()
    assert man1["state_dir"] == man0["state_dir"]
    assert sorted(
        os.path.join(dp, f) for dp, _d, fs in os.walk(base_root) for f in fs
    ) == base_files

    rep2 = idx.refresh(sink)
    assert rep2["mode"] == "noop"


def test_compact_rewrites_affected_partitions_links_rest(spark, tmp_path):
    cfg, sink = _setup(spark, tmp_path, seed=73)
    with pytest.raises(Exception, match="injected failure"):
        run_replay(spark, cfg, fail_after_batches=1)
    idx = IvfIndexView(spark, str(tmp_path / "idx"), CENTROIDS, EMBED)
    idx.build(sink)
    run_replay(spark, cfg)
    idx.refresh(sink)

    before = _rows(idx.query(QVEC, k=15, nprobe=4))
    old_root = tmp_path / "idx" / idx._load_manifest()["state_dir"]
    old_inodes = {
        d: {f: os.stat(os.path.join(old_root, d, f)).st_ino
            for f in os.listdir(os.path.join(old_root, d)) if f.endswith(".parquet")}
        for d in os.listdir(old_root) if d.startswith("centroid_id=")
    }
    rep = idx.compact()
    assert rep["mode"] == "compacted"
    assert rep["partitions_rewritten"] + rep["partitions_linked"] >= len(old_inodes)

    man = idx._load_manifest()
    assert man["dirty_dir"] is None
    # identical answers after folding the overlay in
    assert _rows(idx.query(QVEC, k=15, nprobe=4)) == before
    # linked partitions share inodes with the old state (no copy)
    new_root = tmp_path / "idx" / man["state_dir"]
    linked_seen = 0
    for d in os.listdir(new_root):
        if not d.startswith("centroid_id="):
            continue
        new_inodes = {
            f: os.stat(os.path.join(new_root, d, f)).st_ino
            for f in os.listdir(os.path.join(new_root, d)) if f.endswith(".parquet")
        }
        if d in old_inodes and new_inodes == old_inodes[d] and new_inodes:
            linked_seen += 1
    assert linked_seen == rep["partitions_linked"]
    # a second compact is a no-op
    assert idx.compact()["mode"] == "noop"
    # and refresh continues to work off the compacted base
    assert _rows(idx.query(QVEC)) == _rebuilt_answer(spark, sink, tmp_path / "o4")


def test_spec_mismatch_refused(spark, tmp_path):
    cfg, sink = _setup(spark, tmp_path, seed=74, n_conv=10, n_segments=2)
    run_replay(spark, cfg)
    idx = IvfIndexView(spark, str(tmp_path / "idx"), CENTROIDS, EMBED)
    idx.build(sink)
    other = IvfIndexView(
        spark, str(tmp_path / "idx"), CENTROIDS[:2], EMBED
    )
    with pytest.raises(IndexSpecMismatch):
        other.refresh(sink)


def test_query_plan_prunes_to_probed_partitions(spark, tmp_path):
    cfg, sink = _setup(spark, tmp_path, seed=75, n_conv=20, n_segments=3)
    run_replay(spark, cfg)
    idx = IvfIndexView(spark, str(tmp_path / "idx"), CENTROIDS, EMBED)
    idx.build(sink)
    plan = idx.query(QVEC, nprobe=1)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan


def test_stats_gauge_tracks_drift_and_balance(spark, tmp_path):
    """stats() is consistent with the live index contents at every
    stage (fresh build / dirty overlay / after compaction), and its
    mean_cos equals the live rows' own mean — the recluster signal is
    computed, not estimated."""
    cfg, sink = _setup(spark, tmp_path, seed=77)
    # slice 1: build the index at an early base version
    with pytest.raises(Exception, match="injected failure"):
        run_replay(spark, cfg, fail_after_batches=1)
    idx = IvfIndexView(spark, str(tmp_path / "idx"), CENTROIDS, EMBED)
    idx.build(sink)
    s0 = idx.stats()
    live0 = sink.read_table().count()
    assert s0["n_vectors"] == live0 and s0["n_dirty"] == 0
    assert s0["n_clusters"] >= 1 and s0["cluster_max"] >= s0["cluster_min"]
    assert s0["balance_ratio"] >= 1.0
    # replay the rest -> overlay grows, gauge stays exact
    run_replay(spark, cfg)
    idx.sync(sink)
    s1 = idx.stats()
    assert s1["n_dirty"] > 0
    assert s1["n_vectors"] == sink.read_table().count()
    # oracle the mean: recompute from a fresh full rebuild at head
    ref = IvfIndexView(spark, str(tmp_path / "ref"), CENTROIDS, EMBED)
    ref.build(sink)
    assert abs(s1["mean_cos"] - ref.stats()["mean_cos"]) < 1e-6
    # compaction folds the overlay; the gauge is unchanged except dirty
    idx.compact()
    s2 = idx.stats()
    assert s2["n_dirty"] == 0
    assert s2["n_vectors"] == s1["n_vectors"]
    assert abs(s2["mean_cos"] - s1["mean_cos"]) < 1e-6
