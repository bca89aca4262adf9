"""Change-stream sources beyond file segments: the Kafka wire shape.

The engine's tested source is a directory of change-log segment files
(the simulated binlog). A production binlog tail is usually a Kafka/
Debezium-style topic; its *wire record* is (key, value, topic,
partition, offset, timestamp). This module supplies:

- ``parse_change_events`` — turn wire records into CHANGE_SCHEMA rows:
  JSON envelope parsed with ``from_json`` (JVM-side, no Python),
  malformed values surfaced as null-key rows the engine's quarantine
  split already captures, and (topic, partition, offset) mapped onto
  the (source_file, offset) lineage columns — which is exactly the
  row-unique tiebreak the sink's hash-path LWW requires, so Kafka
  redeliveries dedup for free.
- ``kafka_stream`` — the readStream assembly for a real topic. The
  sandbox ships no spark-sql-kafka connector, so this raises a clear
  error telling the operator which --packages to submit with; the parse
  stage it would feed is the same ``parse_change_events`` unit-tested
  on batch DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oec_etl_spark.schemas import CHANGE_SCHEMA, change_schema

# columns of a Kafka wire record as Spark's kafka source emits them
KAFKA_WIRE_COLUMNS = ("key", "value", "topic", "partition", "offset", "timestamp")


def parse_change_events(wire: DataFrame, payload_schema=None) -> DataFrame:
    """Wire records → CHANGE_SCHEMA rows.

    ``value`` (binary or string JSON) is parsed with ``from_json``
    against the change envelope; a malformed value yields nulls, which
    the engine's quarantine split routes to the DLQ (never silently
    dropped). Lineage: source_file = "topic/partition" and offset =
    the Kafka offset — row-unique per delivery, so the sink's hash-path
    merge stays safe under at-least-once redelivery.
    """
    from pyspark.sql import types as T

    schema = change_schema(payload_schema) if payload_schema is not None else CHANGE_SCHEMA
    # envelope minus lineage (lineage comes from the wire coords)
    env = T.StructType([f for f in schema.fields if f.name not in ("source_file", "offset")])
    parsed = wire.select(
        F.from_json(F.col("value").cast("string"), env).alias("e"),
        F.concat_ws("/", F.col("topic"), F.col("partition").cast("string")).alias("source_file"),
        F.col("offset").cast("long").alias("offset"),
    )
    return parsed.select(*[F.col(f"e.{f.name}").alias(f.name) for f in env.fields], "source_file", "offset")


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over a Kafka topic, parsed to CHANGE_SCHEMA. Requires
    the spark-sql-kafka connector on the classpath (not present in this
    sandbox — fails with a clear message rather than a cryptic
    ClassNotFound at start())."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    try:
        wire = reader.load()
    except Exception as ex:  # connector jar absent
        raise RuntimeError(
            "Kafka source requires the spark-sql-kafka connector; submit with "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> "
            "(file-segment change logs need no extra jars)"
        ) from ex
    return parse_change_events(wire)
