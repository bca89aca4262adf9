"""Iceberg DDL/MERGE statement builders — unit-tested without a runtime.

The sandbox has no iceberg-spark-runtime jar (SURVEY.md §7.3 R1), so the
executable MERGE path is the ParquetSnapshotSink; these tests pin the
TEXT the Iceberg path would issue — key equality, the LWW (ts, seq)
guard, delete-beats-older clause ordering, bucket partition transform,
hash write distribution — and push each statement through Spark's SQL
parser (parse only, no analysis) to prove it is syntactically valid.
"""

from __future__ import annotations

import pytest

from oec_etl_spark.schemas import TRANSCRIPT_SCHEMA
from oec_etl_spark.streaming.sink import iceberg_create_table_sql, iceberg_merge_sql


def test_merge_sql_text():
    sql = iceberg_merge_sql("lake.db.transcripts")
    assert "MERGE INTO lake.db.transcripts t USING _cdc_winners s" in sql
    assert "ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx" in sql
    # LWW guard: source wins only at strictly-greater-or-equal (ts, seq);
    # >= means a re-delivered identical event is a no-op UPDATE (idempotent)
    guard = "struct(s.ts, s.seq) >= struct(t.ts, t.__seq)"
    assert sql.count(guard) == 2  # on both MATCHED clauses
    assert f"WHEN MATCHED AND s.op = 'D' AND {guard} THEN DELETE" in sql
    assert f"WHEN MATCHED AND {guard} THEN UPDATE SET *" in sql
    assert "WHEN NOT MATCHED AND s.op != 'D' THEN INSERT *" in sql
    # MERGE evaluates WHEN clauses in order: the DELETE clause MUST
    # precede the UPDATE clause or a winning delete would update instead
    assert sql.index("THEN DELETE") < sql.index("THEN UPDATE")


def test_create_table_sql_text():
    sql = iceberg_create_table_sql("lake.db.transcripts", TRANSCRIPT_SCHEMA, n_buckets=64)
    assert "CREATE TABLE IF NOT EXISTS lake.db.transcripts" in sql
    for col_frag in ("conv_id STRING", "turn_idx INT", "role STRING",
                     "text STRING", "tool STRING", "ts TIMESTAMP",
                     "__seq BIGINT", "__deleted BOOLEAN"):
        assert col_frag in sql
    assert "USING iceberg" in sql
    assert "PARTITIONED BY (bucket(64, conv_id))" in sql  # conv_id hash buckets
    assert "'write.distribution-mode'='hash'" in sql  # MERGE write aligned to buckets
    assert "'format-version'='2'" in sql  # v2 = row-level deletes


def test_merge_keys_parameterized():
    sql = iceberg_merge_sql("t1", source_view="v", keys=("a", "b", "c"))
    assert "ON t.a = s.a AND t.b = s.b AND t.c = s.c" in sql
    assert "USING v s" in sql


@pytest.mark.parametrize("stmt", ["create", "merge"])
def test_statements_parse_as_valid_spark_sql(spark, stmt):
    """Parse-only check through Spark's own SQL parser: the statements
    are syntactically valid (MERGE INTO and partition transforms are in
    the core parser; only execution needs the Iceberg extensions)."""
    sql = (
        iceberg_create_table_sql("db.t", TRANSCRIPT_SCHEMA)
        if stmt == "create"
        else iceberg_merge_sql("db.t")
    )
    spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)  # raises on bad syntax


def test_evolve_sql_add_and_widen():
    from pyspark.sql import types as T

    from oec_etl_spark.streaming.reconcile import evolve_schema
    from oec_etl_spark.streaming.sink import iceberg_evolve_sql

    current = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("score", T.FloatType()),
        ]
    )
    incoming = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.LongType()),   # widen int -> bigint
            T.StructField("score", T.DoubleType()),    # widen float -> double
            T.StructField("tool", T.StringType()),     # new column
            T.StructField("latency_ms", T.LongType()), # new column
        ]
    )
    evolved = evolve_schema(current, incoming)
    stmts = iceberg_evolve_sql("db.t", current, evolved)
    assert stmts[0] == "ALTER TABLE db.t ADD COLUMNS (tool STRING, latency_ms BIGINT)"
    assert "ALTER TABLE db.t ALTER COLUMN turn_idx TYPE BIGINT" in stmts
    assert "ALTER TABLE db.t ALTER COLUMN score TYPE DOUBLE" in stmts
    assert len(stmts) == 3


def test_evolve_sql_noop_when_schema_unchanged():
    from oec_etl_spark.streaming.sink import iceberg_evolve_sql

    assert iceberg_evolve_sql("db.t", TRANSCRIPT_SCHEMA, TRANSCRIPT_SCHEMA) == []


def test_evolve_sql_parses_as_valid_spark_sql(spark):
    from pyspark.sql import types as T

    from oec_etl_spark.streaming.sink import iceberg_evolve_sql

    current = T.StructType([T.StructField("a", T.IntegerType())])
    evolved = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    for sql in iceberg_evolve_sql("db.t", current, evolved):
        spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)


def test_patch_merge_sql_text():
    from oec_etl_spark.streaming.sink import iceberg_patch_merge_sql

    sql = iceberg_patch_merge_sql("lake.db.transcripts")
    assert "MERGE INTO lake.db.transcripts t USING _cdc_patches s" in sql
    assert "ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx" in sql
    # per-column LWW: each column updates only when ITS definer beats
    # the stored row — NOT when the row-level patch image does
    for c in ("role", "text", "tool"):
        frag = (f"t.{c} = CASE WHEN s.{c}_ord IS NOT NULL AND "
                f"s.{c}_ord >= struct(t.ts, t.__seq) THEN s.{c} ELSE t.{c} END")
        assert frag in sql
    # the row's LWW position advances with the newest patch
    assert "t.ts = CASE WHEN struct(s.ts, s.seq) >= struct(t.ts, t.__seq) THEN s.ts ELSE t.ts END" in sql
    assert "t.__seq = CASE WHEN struct(s.ts, s.seq) >= struct(t.ts, t.__seq) THEN s.seq ELSE t.__seq END" in sql
    # patches never create rows: no NOT MATCHED clause at all
    assert "NOT MATCHED" not in sql


def test_patch_merge_sql_parses_as_valid_spark_sql(spark):
    from oec_etl_spark.streaming.sink import iceberg_patch_merge_sql

    sql = iceberg_patch_merge_sql("db.t")
    spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)


def test_snapshot_merge_sql_text():
    from oec_etl_spark.streaming.sink import iceberg_snapshot_merge_sql

    sql = iceberg_snapshot_merge_sql("lake.db.transcripts")
    assert "MERGE INTO lake.db.transcripts t USING _cdc_snapshot s" in sql
    assert "ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx" in sql
    # insert-if-absent ONLY: a snapshot read must never overwrite
    # streamed data, so there is no WHEN MATCHED clause at all
    assert "WHEN NOT MATCHED THEN INSERT" in sql
    assert "WHEN MATCHED" not in sql
    assert "UPDATE" not in sql and "DELETE" not in sql


def test_truncate_sql_text():
    from oec_etl_spark.streaming.sink import iceberg_truncate_sql

    # horizon: 2024-01-01T05:00:00 UTC in epoch µs
    sql = iceberg_truncate_sql("lake.db.transcripts", 1704085200000000)
    assert "DELETE FROM lake.db.transcripts" in sql
    # NULL-ts rows retained (no ordering evidence), boundary inclusive
    assert "ts IS NOT NULL AND ts <= TIMESTAMP '2024-01-01 05:00:00.000000+00:00'" in sql


def test_snapshot_and_truncate_sql_parse_as_valid_spark_sql(spark):
    from oec_etl_spark.streaming.sink import (
        iceberg_snapshot_merge_sql,
        iceberg_truncate_sql,
    )

    parser = spark._jsparkSession.sessionState().sqlParser()
    parser.parsePlan(iceberg_snapshot_merge_sql("db.t"))
    parser.parsePlan(iceberg_truncate_sql("db.t", 1704085200000000))
