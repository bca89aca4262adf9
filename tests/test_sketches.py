"""Sketch aggregates: error bounds vs exact, and the merge law that
makes them usable as stored pre-aggregates (union of per-group sketches
== sketch of the union, within the sketch's error)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oec_etl_spark.functions import sketches as sk

EVENTS = "/root/testdata/sf0.001/events.parquet"


def test_hll_estimate_within_error(spark):
    e = spark.read.parquet(EVENTS)
    exact = e.select(F.count_distinct("user_id")).first()[0]
    est = sk.approx_distinct(e, "user_id").first()[0]
    assert abs(est - exact) / exact < 0.05


def test_hll_merge_law(spark):
    """Store per-day sketches, union them later: the estimate from
    merged stored state must match (±error) both the direct one-pass
    estimate and the exact count."""
    e = spark.read.parquet(EVENTS).withColumn("day", F.to_date("ts"))
    stored = sk.hll_rollup(e, "user_id", by=["day"])
    assert stored.count() >= 2  # genuinely merging multiple sketches
    merged_est = sk.hll_merge(stored).first()[0]
    direct_est = sk.approx_distinct(e, "user_id").first()[0]
    exact = e.select(F.count_distinct("user_id")).first()[0]
    assert abs(merged_est - exact) / exact < 0.05
    assert abs(merged_est - direct_est) / max(direct_est, 1) < 0.02


def test_hll_grouped(spark):
    e = spark.read.parquet(EVENTS)
    got = {
        r["event_type"]: r["approx_distinct_user_id"]
        for r in sk.approx_distinct(e, "user_id", by=["event_type"]).collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type").agg(F.count_distinct("user_id").alias("n")).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) / want[k] < 0.08, k


def test_approx_quantiles_within_rank_error(spark):
    e = spark.read.parquet(EVENTS)
    qs = sk.approx_quantiles(e, "value", probs=(0.5, 0.9, 0.99)).first()["quantiles"]
    n = e.count()
    values = sorted(r["value"] for r in e.select("value").collect())
    for p, got in zip((0.5, 0.9, 0.99), qs):
        # rank of the returned value must be within 1/accuracy + slack of p
        import bisect

        rank = bisect.bisect_right(values, got) / n
        assert abs(rank - p) < 0.005, (p, got, rank)


def test_sketch_plan_has_no_python_udf(spark):
    e = spark.read.parquet(EVENTS)
    plan = sk.approx_distinct(e, "user_id")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
