"""Physical data layout: z-order clustered writes + file-range stats.

``write_zordered`` is the OPTIMIZE ZORDER BY analog for plain parquet
directories (the snapshot sink's bucket layout handles the CDC table;
this handles analytics extracts): compute a Morton key over two
dimensions, range-partition on it so each output file owns a contiguous
z-range, and sort within files. Each file then covers a compact
rectangle of (x, y) space, so min/max footer stats prune selective
scans on either dimension.

Scale shape: the bounds aggregate is a 1-row broadcast (no driver
collect), the z-key is pure codegen'd integer arithmetic, and the only
shuffle is the range exchange every clustered write needs anyway. At
100 TB this runs as a background rewrite per partition, exactly like
Iceberg's rewrite_data_files(strategy => 'sort').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oec_etl_spark.functions.zorder import DEFAULT_BITS, zorder_key_expr

_Z = "__z"
_BOUNDS = ("__xmin", "__xmax", "__ymin", "__ymax")


def with_zorder_key(
    df: DataFrame, x_expr: str, y_expr: str, bits: int = DEFAULT_BITS, key_col: str = _Z
) -> DataFrame:
    """Attach the z-key column. ``x_expr``/``y_expr`` are Spark SQL
    expressions that must evaluate to non-negative integers (cast
    timestamps with ``unix_micros(...)`` at the call site). Dimension
    bounds come from a broadcast 1-row aggregate of the frame itself."""
    bounds = df.select(
        F.expr(x_expr).alias("__x"), F.expr(y_expr).alias("__y")
    ).agg(
        F.min("__x").alias("__xmin"), F.max("__x").alias("__xmax"),
        F.min("__y").alias("__ymin"), F.max("__y").alias("__ymax"),
    )
    key = zorder_key_expr(
        x_expr, "__xmin", "__xmax", y_expr, "__ymin", "__ymax", bits, dialect="spark"
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(key_col, F.expr(key))
        .drop(*_BOUNDS)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    x_expr: str,
    y_expr: str,
    n_files: int = 16,
    bits: int = DEFAULT_BITS,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    z-curve over (x, y). The key column is dropped before writing —
    it is layout, not data."""
    keyed = with_zorder_key(df, x_expr, y_expr, bits)
    (
        keyed.repartitionByRange(n_files, F.col(_Z))
        .sortWithinPartitions(_Z)
        .drop(_Z)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_ranges(spark: SparkSession, path: str, exprs: dict[str, str]) -> DataFrame:
    """Per-file min/max of each named expression — the zone map a
    manifest would carry. Used to measure (and test) how many files a
    box predicate would have to read under a given layout."""
    df = spark.read.parquet(path).withColumn("__file", F.input_file_name())
    aggs = []
    for name, expr in exprs.items():
        aggs.append(F.min(F.expr(expr)).alias(f"{name}_min"))
        aggs.append(F.max(F.expr(expr)).alias(f"{name}_max"))
    return df.groupBy("__file").agg(*aggs)


def files_matching_box(
    spark: SparkSession, path: str, exprs: dict[str, str], box: dict[str, tuple]
) -> tuple[int, int]:
    """(files that intersect the box, total files): the skipping ratio a
    stats-pruned scan achieves. ``box`` maps the same names as ``exprs``
    to (lo, hi) bounds; dimensions absent from ``box`` are unbounded."""
    ranges = file_ranges(spark, path, exprs).collect()
    hit = 0
    for r in ranges:
        ok = True
        for name, (lo, hi) in box.items():
            if r[f"{name}_max"] < lo or r[f"{name}_min"] > hi:
                ok = False
                break
        hit += ok
    return hit, len(ranges)
