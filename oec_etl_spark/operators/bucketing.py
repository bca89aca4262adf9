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

from pyspark.sql import DataFrame
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


def hot_keys(df: DataFrame, threshold_frac: float = 0.05, total: int | None = None) -> DataFrame:
    """Frequency sketch: conv_ids holding more than `threshold_frac` of
    the batch's rows. Two cheap jobs: a scalar count, then a partial-agg
    groupBy whose output is filtered to the (tiny) hot set *before*
    anything leaves the executors — no global window / single-reducer
    total, so this stays flat at 10^10-row batches."""
    if total is None:
        total = df.count()
    if total == 0:
        return df.sparkSession.createDataFrame([], "conv_id string, cnt long, frac double")
    counts = df.groupBy("conv_id").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        counts.filter(F.col("cnt") > threshold_frac * total)
        .select("conv_id", "cnt", F.round(F.col("cnt") / F.lit(total), 6).alias("frac"))
    )
