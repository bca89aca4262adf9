"""CDC-maintained MinHash-LSH index: the current band table under the
overlay must equal a from-scratch band build at the base head; refresh
is O(changed keys) (base untouched); probe finds planted near-dups of
live rows and never matches deleted rows; compaction preserves the
logical table."""

from __future__ import annotations

import os

import pytest

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.generate import GeneratorConfig, generate_changelog
from oec_etl_spark.streaming.dedup_index import (
    DedupIndexSpecMismatch,
    MinHashIndexView,
)
from oec_etl_spark.streaming.engine import run_replay
from oec_etl_spark.streaming.sink import ParquetSnapshotSink


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
    return cfg, ParquetSnapshotSink(spark, cfg.target_dir, 8)


def _band_set(df):
    return {
        (r["conv_id"], r["turn_idx"], r["band_idx"], r["band_key"])
        for r in df.collect()
    }


def _rebuilt_bands(spark, sink, tmp_path):
    ref = MinHashIndexView(spark, str(tmp_path / "ref_idx"))
    ref.build(sink)
    return _band_set(ref.bands_current())


def test_overlay_bands_equal_full_rebuild(spark, tmp_path):
    cfg, sink = _setup(spark, tmp_path, seed=81)
    with pytest.raises(Exception, match="injected failure"):
        run_replay(spark, cfg, fail_after_batches=1)
    idx = MinHashIndexView(spark, str(tmp_path / "idx"))
    assert idx.build(sink)["mode"] == "full"
    assert _band_set(idx.bands_current()) == _rebuilt_bands(spark, sink, tmp_path / "o1")

    man0 = idx._load_manifest()
    base_root = tmp_path / "idx" / man0["state_dir"]
    base_files = sorted(
        os.path.join(dp, f) for dp, _d, fs in os.walk(base_root) for f in fs
    )
    run_replay(spark, cfg)
    rep = idx.refresh(sink)
    assert rep["mode"] == "incremental" and rep["dirty_keys"] > 0
    # exact under the overlay, base files untouched
    assert _band_set(idx.bands_current()) == _rebuilt_bands(spark, sink, tmp_path / "o2")
    assert sorted(
        os.path.join(dp, f) for dp, _d, fs in os.walk(base_root) for f in fs
    ) == base_files
    assert idx.refresh(sink)["mode"] == "noop"

    before = _band_set(idx.bands_current())
    assert idx.compact()["mode"] == "compacted"
    assert idx._load_manifest()["dirty_dir"] is None
    assert _band_set(idx.bands_current()) == before
    assert idx.compact()["mode"] == "noop"


def test_probe_finds_planted_neardup_not_unrelated(spark, tmp_path):
    cfg, sink = _setup(spark, tmp_path, seed=82)
    run_replay(spark, cfg)
    idx = MinHashIndexView(spark, str(tmp_path / "idx"))
    idx.build(sink)

    victim = (
        sink.read_table()
        .filter("length(text) > 60")
        .orderBy("conv_id", "turn_idx")
        .limit(1)
        .collect()[0]
    )
    near = victim["text"] + " xx"  # tiny perturbation: high jaccard
    docs = spark.createDataFrame(
        [("p1", near), ("p2", "zz qq ww totally unrelated probe payload 0123456789 zz qq ww")],
        "doc_id string, text string",
    )
    hits = idx.probe(sink, docs, threshold=0.5).collect()
    assert any(
        r["doc_id"] == "p1"
        and r["conv_id"] == victim["conv_id"]
        and r["turn_idx"] == victim["turn_idx"]
        and r["jaccard"] >= 0.5
        for r in hits
    )
    assert not any(r["doc_id"] == "p2" for r in hits)
    # the stop-shingle guard must not lose the planted near-dup
    capped = idx.probe(sink, docs, threshold=0.5, max_shingle_df=20).collect()
    assert any(
        r["doc_id"] == "p1" and r["conv_id"] == victim["conv_id"] for r in capped
    )


def test_probe_tracks_updates_and_deletes(spark, tmp_path):
    cfg, sink = _setup(spark, tmp_path, seed=83)
    with pytest.raises(Exception, match="injected failure"):
        run_replay(spark, cfg, fail_after_batches=1)
    idx = MinHashIndexView(spark, str(tmp_path / "idx"))
    idx.build(sink)
    run_replay(spark, cfg)
    idx.refresh(sink)

    # a key deleted from the table must have no band rows in the index
    v_now = sink.load_manifest()["version"]
    live_keys = {
        (r["conv_id"], r["turn_idx"])
        for r in sink.read_table(version=v_now).select("conv_id", "turn_idx").collect()
    }
    idx_keys = {
        (r["conv_id"], r["turn_idx"])
        for r in idx.bands_current().select("conv_id", "turn_idx").distinct().collect()
    }
    assert idx_keys <= live_keys
    # every live row long enough to shingle is indexed
    shingled = {
        (r["conv_id"], r["turn_idx"])
        for r in sink.read_table().filter("length(coalesce(text,'')) >= 12")
        .select("conv_id", "turn_idx").collect()
    }
    assert shingled <= idx_keys

    # probing a CURRENT text matches its own key through the overlay
    row = (
        sink.read_table().filter("length(text) > 60")
        .orderBy("conv_id", "turn_idx").limit(1).collect()[0]
    )
    hits = idx.probe(
        sink,
        spark.createDataFrame([("q", row["text"])], "doc_id string, text string"),
        threshold=0.9,
    ).collect()
    assert any(
        r["conv_id"] == row["conv_id"] and r["turn_idx"] == row["turn_idx"]
        and r["jaccard"] == 1.0
        for r in hits
    )


def test_spec_mismatch_refused(spark, tmp_path):
    cfg, sink = _setup(spark, tmp_path, seed=84, n_conv=10, n_segments=2)
    run_replay(spark, cfg)
    idx = MinHashIndexView(spark, str(tmp_path / "idx"))
    idx.build(sink)
    other = MinHashIndexView(spark, str(tmp_path / "idx"), n_minhash=16, n_bands=8)
    with pytest.raises(DedupIndexSpecMismatch):
        other.refresh(sink)
