"""Change-data-feed + SCD2 semantics (round-2 CDC table services).

The sink's changelog must satisfy the CDF algebra: applying the feed
emitted for v_a→v_b onto the v_a state reproduces the v_b state exactly
— the invariant a downstream incremental consumer relies on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.generate import GeneratorConfig, generate_changelog
from oec_etl_spark.operators.cdf import CHANGE_TYPE, table_diff, table_diff_pre_post
from oec_etl_spark.operators.scd import scd2
from oec_etl_spark.streaming.engine import run_replay
from oec_etl_spark.streaming.sink import ParquetSnapshotSink


def _frames(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, "d", None)],
        "k int, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", None), (3, "c", 31.0), (4, "d", 40.0), (5, "e", None)],
        "k int, s string, v double",
    )
    return old, new


def test_table_diff_classifies_changes(spark):
    old, new = _frames(spark)
    out = {r["k"]: r for r in table_diff(old, new, keys=("k",)).collect()}
    assert out[1][CHANGE_TYPE] == "delete" and out[1]["v"] == 10.0  # pre-image carried
    assert 2 not in out  # null == null under eqNullSafe → unchanged
    assert out[3][CHANGE_TYPE] == "update_postimage" and out[3]["v"] == 31.0
    assert out[4][CHANGE_TYPE] == "update_postimage" and out[4]["v"] == 40.0  # null→value is a change
    assert out[5][CHANGE_TYPE] == "insert" and out[5]["v"] is None


def test_table_diff_compare_subset(spark):
    old, new = _frames(spark)
    # comparing only `s` (unchanged everywhere) hides the v updates
    out = {r["k"]: r[CHANGE_TYPE] for r in table_diff(old, new, keys=("k",), compare=("s",)).collect()}
    assert out == {1: "delete", 5: "insert"}


def test_table_diff_pre_post_emits_both_images(spark):
    old, new = _frames(spark)
    rows = table_diff_pre_post(old, new, keys=("k",)).collect()
    pre = {r["k"]: r for r in rows if r[CHANGE_TYPE] == "update_preimage"}
    post = {r["k"]: r for r in rows if r[CHANGE_TYPE] == "update_postimage"}
    assert set(pre) == set(post) == {3, 4}
    assert pre[3]["v"] == 30.0 and post[3]["v"] == 31.0
    assert pre[4]["v"] is None and post[4]["v"] == 40.0


def test_scd2_intervals_chain_per_key(spark):
    df = spark.createDataFrame(
        [(1, 10, "x"), (1, 20, "y"), (1, 30, "z"), (2, 5, "q")],
        "k int, ts int, payload string",
    )
    hist = scd2(df, keys=("k",), order=("ts",), ts_col="ts").collect()
    by_key = {}
    for r in sorted(hist, key=lambda r: (r["k"], r["valid_from"])):
        by_key.setdefault(r["k"], []).append(r)
    for _, versions in by_key.items():
        # intervals chain: each valid_to is the next valid_from
        for a, b in zip(versions, versions[1:]):
            assert a["valid_to"] == b["valid_from"]
        assert [v["is_current"] for v in versions] == [False] * (len(versions) - 1) + [True]
        assert versions[-1]["valid_to"] is None


def test_sink_changelog_apply_invariant(spark, tmp_path):
    """old_state ⊕ changelog(old→new) == new_state, where ⊕ deletes the
    feed's delete keys and upserts its insert/update post-images."""
    generate_changelog(GeneratorConfig(out_dir=str(tmp_path / "changes"), seed=77, n_conversations=50))
    cfg = EngineConfig(
        changes_dir=str(tmp_path / "changes"),
        target_dir=str(tmp_path / "target"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_buckets=8,
        max_files_per_trigger=1,
    )
    run_replay(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    hist = sink.history()
    assert len(hist) >= 3
    v_old = hist[1]["version"]  # a mid-replay snapshot
    old_state, new_state = sink.read_table(v_old), sink.read_table()
    feed = sink.changelog(v_old).cache()
    assert feed.count() > 0
    keys = ["conv_id", "turn_idx"]
    changed_keys = feed.select(*keys)
    survivors = old_state.join(changed_keys, on=keys, how="left_anti")
    upserts = feed.filter(F.col(CHANGE_TYPE) != "delete").drop(CHANGE_TYPE)
    rebuilt = survivors.unionByName(upserts.select(*old_state.columns))
    assert rebuilt.exceptAll(new_state).count() == 0
    assert new_state.exceptAll(rebuilt).count() == 0
    feed.unpersist()


def test_ivm_maintain_equals_recompute(spark, tmp_path):
    """Incremental view maintenance: old aggregate ⊕ feed-delta must
    equal the aggregate recomputed from the new table — across a real
    replay's snapshots, including deletes and updates."""
    from oec_etl_spark.operators import ivm

    generate_changelog(GeneratorConfig(out_dir=str(tmp_path / "changes"), seed=78, n_conversations=60))
    cfg = EngineConfig(
        changes_dir=str(tmp_path / "changes"),
        target_dir=str(tmp_path / "target"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_buckets=8,
        max_files_per_trigger=2,
    )
    run_replay(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    v_old = sink.history()[0]["version"]
    keys = ["role"]
    agg_old = sink.read_table(v_old).groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    feed = sink.changelog(v_old, pre_post=True)
    maintained = ivm.maintain(agg_old, feed, keys)
    recomputed = sink.read_table().groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    got = {r["role"]: r["n"] for r in maintained.collect()}
    want = {r["role"]: r["n"] for r in recomputed.collect()}
    assert got == want


def test_ivm_sum_measures_and_group_drop(spark):
    """Signed retract/add on a sum measure; a group whose rows all
    vanish drops out of the maintained aggregate."""
    from oec_etl_spark.operators import ivm
    from oec_etl_spark.operators.cdf import table_diff_pre_post

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 5), (3, "b", 7)], "k int, g string, v long"
    )
    new = spark.createDataFrame(
        [(1, "a", 12), (4, "c", 1)], "k int, g string, v long"  # upd k1, del k2/k3, ins k4
    )
    agg_old = old.groupBy("g").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("v"))
    feed = table_diff_pre_post(old, new, keys=("k",))
    maintained = ivm.maintain(agg_old, feed, ["g"], sum_cols=["v"])
    got = {r["g"]: (r["n"], r["v"]) for r in maintained.collect()}
    assert got == {"a": (1, 12), "c": (1, 1)}  # "b" dropped (count 0)


def test_lookup_reads_single_bucket(spark, tmp_path):
    generate_changelog(GeneratorConfig(out_dir=str(tmp_path / "changes"), seed=79, n_conversations=50))
    cfg = EngineConfig(
        changes_dir=str(tmp_path / "changes"),
        target_dir=str(tmp_path / "target"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_buckets=8,
    )
    run_replay(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    conv = sink.read_table().select("conv_id").first()[0]
    got = sink.lookup(conv)
    want = sink.read_table().filter(F.col("conv_id") == conv)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # pruning: every file the lookup plan reads is in ONE bucket dir
    buckets = {f.split("__bucket=")[1].split("/")[0] for f in got.inputFiles()}
    assert len(buckets) == 1
    # point lookup on one turn
    row = want.first()
    one = sink.lookup(conv, row["turn_idx"]).collect()
    assert len(one) == 1 and one[0]["turn_idx"] == row["turn_idx"]
