"""End-to-end CDC replay through IcebergMergeSink against a REAL
Iceberg catalog — runnable only when an iceberg-spark-runtime jar is
present (none ships in this sandbox; point ICEBERG_SPARK_JAR at one, or
drop it into pyspark's jars dir). tests/test_iceberg_e2e.py wraps this
with a visible skipif so the moment a jar appears the suite exercises
the real MERGE INTO / DDL instead of only parse-testing the SQL twins.

Runs in its own process on purpose: Iceberg extensions and catalog
configs must be set before the JVM starts, and an existing shared test
JVM cannot be reconfigured.

Usage: python scripts/iceberg_e2e.py [workdir]
Prints one JSON line {"batches": N, "table_rows": N, "diff_rows": N}
and exits 0 iff the final Iceberg table equals the materialize oracle.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def find_iceberg_jar() -> str | None:
    """Locate an iceberg-spark-runtime jar: $ICEBERG_SPARK_JAR wins,
    else scan pyspark's bundled jars dir and $SPARK_HOME/jars."""
    explicit = os.environ.get("ICEBERG_SPARK_JAR")
    if explicit and os.path.exists(explicit):
        return explicit
    roots = []
    try:
        import pyspark

        roots.append(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
    except ImportError:  # pragma: no cover
        pass
    if os.environ.get("SPARK_HOME"):
        roots.append(os.path.join(os.environ["SPARK_HOME"], "jars"))
    for root in roots:
        hits = sorted(glob.glob(os.path.join(root, "iceberg-spark-runtime*.jar")))
        if hits:
            return hits[0]
    return None


def main(workdir: str) -> int:
    jar = find_iceberg_jar()
    if jar is None:
        print(json.dumps({"error": "no iceberg-spark-runtime jar found"}))
        return 2

    from pyspark.sql import SparkSession

    from oec_etl_spark.generate import GeneratorConfig, generate_changelog
    from oec_etl_spark.operators.lww import materialize
    from oec_etl_spark.schemas import CHANGE_SCHEMA, KEY_COLUMNS, META_DELETED, META_SEQ
    from oec_etl_spark.streaming.engine import quarantine_split
    from oec_etl_spark.streaming.sink import IcebergMergeSink

    warehouse = os.path.join(workdir, "warehouse")
    changes = os.path.join(workdir, "changes")
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("iceberg_e2e")
        .config("spark.jars", jar)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", warehouse)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    try:
        generate_changelog(
            GeneratorConfig(out_dir=changes, seed=31, n_conversations=60, n_segments=4,
                            update_ratio=1.2, delete_ratio=0.1)
        )
        table = "local.db.transcripts_e2e"
        sink = IcebergMergeSink(spark, table, n_buckets=4)
        segments = sorted(glob.glob(os.path.join(changes, "*.parquet")))
        for i, seg in enumerate(segments):
            batch = spark.read.schema(CHANGE_SCHEMA).parquet(seg)
            valid, _bad = quarantine_split(batch)
            sink.merge(valid, batch_id=i)

        got = spark.table(table).drop(META_SEQ, META_DELETED)
        raw = spark.read.schema(CHANGE_SCHEMA).parquet(changes)
        want = materialize(quarantine_split(raw)[0])
        cols = sorted(set(got.columns) & set(want.columns))
        assert set(cols) >= set(KEY_COLUMNS), cols
        diff = (
            got.select(*cols).exceptAll(want.select(*cols)).count()
            + want.select(*cols).exceptAll(got.select(*cols)).count()
        )
        print(json.dumps({
            "batches": len(segments),
            "table_rows": got.count(),
            "oracle_rows": want.count(),
            "diff_rows": diff,
        }))
        return 0 if diff == 0 else 1
    finally:
        spark.stop()


if __name__ == "__main__":
    import tempfile

    wd = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="iceberg_e2e_")
    raise SystemExit(main(wd))
