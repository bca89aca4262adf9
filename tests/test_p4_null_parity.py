"""P4 (`filter_not_in`) NULL parity with the pandas reference.

The reference drops pollution rows with
``df.drop(df[df['partner'] == 'World'].index)``
(/root/reference/etl/trade_comtrade_monthly_pipeline.py:33-36) — a NaN
partner never equals 'World', so NULL rows are KEPT. The Spark
re-expression used bare ``~isin()``, whose three-valued logic silently
DROPPED every NULL row. Found by review in round 4."""

from pyspark.sql import functions as F

from oec_etl_spark.operators.transforms import filter_not_in


def _df(spark):
    return spark.createDataFrame(
        [("World", 1), ("TOTAL", 2), ("Chile", 3), (None, 4), ("Peru", 5)],
        "partner string, v int",
    )


def test_null_rows_kept_like_pandas(spark):
    out = filter_not_in(_df(spark), "partner", ["World", "TOTAL"])
    assert sorted(r.v for r in out.collect()) == [3, 4, 5]


def test_matches_pandas_oracle(spark):
    pdf = _df(spark).toPandas()
    oracle = pdf.drop(pdf[pdf["partner"].isin(["World", "TOTAL"])].index)
    out = filter_not_in(_df(spark), "partner", ["World", "TOTAL"]).toPandas()
    assert sorted(out["v"]) == sorted(oracle["v"])


def test_filter_still_reaches_the_scan(spark, tmp_path):
    """The null-safe form must stay a pushed data filter, not a
    post-scan Filter only: Or(IsNull, Not(In)) is parquet-pushable."""
    p = str(tmp_path / "t.parquet")
    _df(spark).write.parquet(p)
    out = filter_not_in(spark.read.parquet(p), "partner", ["World"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "partner" in plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert sorted(r.v for r in out.collect()) == [2, 3, 4, 5]
