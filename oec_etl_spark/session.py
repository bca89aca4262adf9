"""SparkSession construction with the engine's required settings.

Local mode is a test harness; the same settings are what we'd pass to
``spark-submit`` on a real cluster (AQE on, Arrow on, UTC timezone so
results compare bit-for-bit against the DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "oec_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default all
    cores). ``shuffle_partitions`` defaults to the core count — at
    cluster scale this becomes ~2-3× total executor cores; the point is
    it is always sized to the parallelism, never left at 200.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = os.cpu_count() or 8
        if cpus not in ("*", ""):
            try:
                n = int(cpus)
            except ValueError:
                pass
        shuffle_partitions = max(8, n)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.mergeSchema", "false")
        # Modern parquet timestamps (µs INT64) instead of legacy INT96:
        # INT96 chunks carry NO min/max footer statistics, which would
        # blind the sink's file-level ts zone maps (and every other
        # stats-based reader). Spark and DuckDB read both forms.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
    )
    # spark.local.dir is deliberately NOT defaulted: shuffle spill must
    # land on the OS tmp dir (disk-backed) unless the operator opts into
    # a faster device. The bench harness sets SPARK_LOCAL_DIRS=/dev/shm
    # explicitly; baking a RAM-backed tmpfs into the library default
    # would let a large merge exhaust host memory.
    local_dirs = os.environ.get("SPARK_LOCAL_DIRS")
    if local_dirs:
        builder = builder.config("spark.local.dir", local_dirs)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
