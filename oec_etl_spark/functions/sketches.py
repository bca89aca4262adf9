"""Mergeable approximate aggregates (sketches).

At 10^10 rows, exact COUNT(DISTINCT) is a full shuffle of every
distinct value, and exact percentiles need a sort; both are routinely
replaced by sketches whose partial states are tiny, mergeable and
associative — they combine map-side like any algebraic aggregate and
can be *stored* (per day / per partition) then unioned at query time
without rescanning history.

Built on Spark's native Apache DataSketches bindings (hll_sketch_agg /
hll_union_agg, JVM-side, codegen'd — no UDFs) and percentile_approx
(Greenwald-Khanna). No DuckDB oracle ties these: DuckDB's approx
algorithms differ bit-for-bit, so correctness is pinned by error-bound
and merge-law tests against exact computation instead
(tests/test_sketches.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_sketch(col: str | Column, lg_k: int = 12) -> Column:
    """Aggregate expression: build an HLL sketch of `col` (binary,
    mergeable). lg_k=12 → ~1.6% relative standard error, 4 KB state."""
    return F.hll_sketch_agg(col, F.lit(lg_k))


def approx_distinct(df: DataFrame, col: str, by: Sequence[str] = (), lg_k: int = 12) -> DataFrame:
    """Approximate distinct count of `col` (optionally per group):
    one pass, O(4 KB) per group of shuffle state."""
    est = F.hll_sketch_estimate(hll_sketch(col, lg_k)).alias(f"approx_distinct_{col}")
    return df.groupBy(*by).agg(est) if by else df.agg(est)


def hll_rollup(df: DataFrame, col: str, by: Sequence[str], lg_k: int = 12) -> DataFrame:
    """Materializable per-group sketches: store these (e.g. one row per
    day) and later union arbitrary subsets with ``hll_merge`` — the
    pattern that answers "distinct users over any date range" from
    pre-aggregated state instead of raw events."""
    return df.groupBy(*by).agg(hll_sketch(col, lg_k).alias("hll"))


def hll_merge(sketches: DataFrame, by: Sequence[str] = (), col: str = "hll") -> DataFrame:
    """Union stored sketches (optionally re-grouped) and estimate."""
    est = F.hll_sketch_estimate(F.hll_union_agg(col)).alias("approx_distinct")
    return sketches.groupBy(*by).agg(est) if by else sketches.agg(est)


def approx_quantiles(
    df: DataFrame,
    col: str,
    probs: Sequence[float] = (0.5, 0.9, 0.99),
    accuracy: int = 10_000,
    by: Sequence[str] = (),
) -> DataFrame:
    """Approximate quantiles via percentile_approx: mergeable GK
    summaries, error ≤ 1/accuracy of rank. One pass, no sort."""
    agg = F.percentile_approx(col, list(probs), accuracy).alias("quantiles")
    return df.groupBy(*by).agg(agg) if by else df.agg(agg)
