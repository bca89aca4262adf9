"""Incremental view maintenance over the change-data-feed.

The canonical CDC consumer: a downstream aggregate (counts / sums per
group) kept current by applying each snapshot interval's change feed as
a *delta*, never rescanning the base table. The algebra needs the
pre/post feed shape (``changelog(pre_post=True)``): an update retracts
its pre-image contribution and adds its post-image, a delete retracts,
an insert adds — so every feed row carries a ±1 sign and the delta is
one ``groupBy(group_keys)`` over the (small) feed.

Scale design: cost per refresh is O(|feed|) + a join against the
aggregate on the group keys — independent of base-table size. The
aggregate itself stays exact (not approximate): additive measures form
a group under +, so retract/add is lossless. Non-additive measures
(min/max, distinct) are NOT maintainable this way; keep those on
sketches (functions/sketches.py) or recompute.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oec_etl_spark.operators.cdf import CHANGE_TYPE

_SIGN = {
    "insert": 1,
    "update_postimage": 1,
    "update_preimage": -1,
    "delete": -1,
}


def feed_delta(
    feed_pre_post: DataFrame,
    group_keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    count_col: str = "n",
) -> DataFrame:
    """Collapse a pre/post change feed into one signed delta row per
    group: ``count_col`` carries the row-count delta, each ``sum_cols``
    entry its additive-measure delta."""
    sign = F.coalesce(
        *[F.when(F.col(CHANGE_TYPE) == t, F.lit(s)) for t, s in _SIGN.items()]
    ).cast("long")
    aggs = [F.sum(sign).alias(count_col)]
    aggs += [F.sum(sign * F.coalesce(F.col(c), F.lit(0))).alias(c) for c in sum_cols]
    return feed_pre_post.groupBy(*group_keys).agg(*aggs)


def apply_delta(
    agg: DataFrame,
    delta: DataFrame,
    group_keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    count_col: str = "n",
) -> DataFrame:
    """Merge a signed delta into the maintained aggregate: full-outer
    join on the group keys, add measures, drop groups whose count
    reaches zero (their rows are all gone)."""
    measures = [count_col, *sum_cols]
    d = delta.select(*group_keys, *[F.col(c).alias(f"__d_{c}") for c in measures])
    out = agg.join(d, on=list(group_keys), how="full_outer")
    for c in measures:
        out = out.withColumn(
            c, F.coalesce(F.col(c), F.lit(0)) + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
        )
    return out.filter(F.col(count_col) > 0).select(*group_keys, *measures)


def maintain(
    agg: DataFrame,
    feed_pre_post: DataFrame,
    group_keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    count_col: str = "n",
) -> DataFrame:
    """One refresh step: ``agg ⊕ delta(feed)``."""
    return apply_delta(
        agg, feed_delta(feed_pre_post, group_keys, sum_cols, count_col),
        group_keys, sum_cols, count_col,
    )
