"""Key bucketing + explicit hot-key salting.

Layout rule: a row's *storage* bucket is a pure function of conv_id
(``pmod(xxhash64(conv_id), n_buckets)``) so MERGE can prune to affected
buckets — the Spark analog of Iceberg's ``bucket(N, conv_id)`` partition
transform.

Skew rule (north rule demands explicit handling, not just AQE): a hot
conversation concentrates all its changes in one storage bucket, but the
LWW reduce key is (conv_id, turn_idx), so the *shuffle* for the reduce
is salted by the full key — ``repartition(n, conv_id, turn_idx)`` —
which spreads a hot conversation across as many tasks as it has turns.
For the residual case (one single (conv_id, turn_idx) pair hammered by
updates) the reduce is an algebraic aggregate, so Spark's map-side
partial aggregation already collapses the hot key to one row per map
partition before the shuffle; AQE skew handling is the backstop.

``hot_keys`` is the frequency sketch used for lineage/metrics and for
choosing a sub-bucket fan-out when writing a skewed bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from oec_etl_spark.schemas import META_BUCKET


def with_bucket(df: DataFrame, n_buckets: int, key: str = "conv_id") -> DataFrame:
    """Attach the deterministic storage bucket id."""
    return df.withColumn(META_BUCKET, F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int"))


def salted_repartition(df: DataFrame, n_partitions: int) -> DataFrame:
    """Shuffle for the LWW reduce: partition by the full logical key.

    Hash-partitioning on (conv_id, turn_idx) *is* the salt: a hot
    conv_id fans out over its turn_idx values instead of landing on one
    reducer, and the partitioning is still aligned with the groupBy key
    so no second shuffle follows.
    """
    return df.repartition(n_partitions, "conv_id", "turn_idx")


def hot_keys(df: DataFrame, threshold_frac: float = 0.05) -> DataFrame:
    """Frequency sketch: conv_ids holding more than `threshold_frac` of
    the batch. Cheap (one partial-agg shuffle of distinct conv_ids)."""
    total = F.sum(F.col("cnt")).over(Window.partitionBy())
    counts = df.groupBy("conv_id").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        counts.withColumn("frac", F.col("cnt") / total)
        .filter(F.col("frac") > threshold_frac)
        .select("conv_id", "cnt", F.round("frac", 6).alias("frac"))
    )
