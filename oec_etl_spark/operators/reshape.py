"""Reshape / set / generation operators — SURVEY.md §2.3 (R1-R7).

The reference does all of these with per-row Python (`iterrows`,
module-global accumulators); every one here is a vectorized built-in.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def union_all(dfs: Sequence[DataFrame]) -> DataFrame:
    """R2 — union-accumulate without mutable globals
    (ref: dim_eb_pipeline.py:11-38 uses a module-global pandas df)."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


def dedup_keep_first(df: DataFrame, keys: Sequence[str], order: Sequence[str]) -> DataFrame:
    """R3 — keep-first-per-key (ref: dim_eb_pipeline.py:43-55 iterates rows
    with a seen-set). Expressed as min_by: one shuffle with map-side
    combine — the batch ancestor of the engine's LWW merge."""
    payload = [c for c in df.columns if c not in keys]
    win = F.min_by(F.struct(*payload), F.struct(*[F.col(o) for o in order])).alias("_w")
    out = df.groupBy(*list(keys)).agg(win)
    return out.select(*keys, *[F.col(f"_w.{c}").alias(c) for c in payload])


def melt(
    df: DataFrame, ids: Sequence[str], value_cols: Sequence[str],
    var_name: str = "variable", value_name: str = "value",
) -> DataFrame:
    """R4 — wide→long unpivot (ref: indicators_wdi_annual_pipeline.py:19-30 does
    iterrows × 58 year columns). `stack` is evaluated in codegen; no
    shuffle at all."""
    n = len(value_cols)
    pairs = ", ".join(f"'{c}', `{c}`" for c in value_cols)
    return df.selectExpr(
        *ids, f"stack({n}, {pairs}) as ({var_name}, {value_name})"
    )


def explode_periods(df: DataFrame, period_to_items: dict[str, list], period_col: str, out_col: str) -> DataFrame:
    """R5 — period→rows expansion (ref: countries/sweden/trade_monthly_pipeline.py:59-89
    expands '07-11' to 5 monthly rows via nested Python loops). Here: a
    when-chain to an array literal + explode."""
    expr = F.lit(None).cast("array<int>")
    for period, items in reversed(list(period_to_items.items())):
        expr = F.when(F.col(period_col) == period, F.array(*[F.lit(i) for i in items])).otherwise(expr)
    return df.withColumn(out_col, F.explode(expr))


def generate_time_dim(spark: SparkSession, y0: int, y1: int) -> DataFrame:
    """S4/R6/R7 — generated year×month dimension with quarter + month
    name (ref: dim_time_pipeline.py:10-56 hand-writes month-name and quarter
    lookup tables; native date functions replace both)."""
    return (
        spark.range(y0, y1 + 1)
        .select(F.col("id").cast("int").alias("year"))
        .select("year", F.explode(F.sequence(F.lit(1), F.lit(12))).alias("month"))
        .select(
            (F.col("year") * 100 + F.col("month")).alias("time_id"),
            "year",
            "month",
            F.quarter(F.make_date("year", "month", F.lit(1))).alias("quarter"),
            F.date_format(F.make_date("year", "month", F.lit(1)), "MMMM").alias("month_name"),
        )
    )
