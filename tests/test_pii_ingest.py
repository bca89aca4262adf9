"""Ingest-time PII redaction via the pre-merge derive stage.

The compliance path: hand ``pii_redact_spark_sql('text')`` to
EngineConfig.derives and PII never reaches the stored table — exports,
change feed, indexes and lookups all see only redacted text. The whole
chain is chained regexp_replace inside the existing codegen'd derive
projection (zero extra passes, zero Python).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.functions import text as tx
from oec_etl_spark.streaming.engine import replay_batch
from oec_etl_spark.streaming.sink import ParquetSnapshotSink


def _write_changes(path: str) -> None:
    rows = {
        "conv_id": pa.array(["c1", "c1", "c2", "c2"], pa.string()),
        "turn_idx": pa.array([0, 1, 0, 1], pa.int32()),
        "role": pa.array(["user", "assistant", "user", "assistant"], pa.string()),
        "text": pa.array(
            [
                "mail me at alice.smith+x@example.com please",
                "ssn is 123-45-6789 and phone 555-867-5309",
                "server at 10.1.2.3 is fine",
                "no pii here at all",
            ],
            pa.string(),
        ),
        "tool": pa.array([None, None, None, None], pa.string()),
        "ts": pa.array([1_000_000, 2_000_000, 3_000_000, 4_000_000], pa.timestamp("us")),
        "op": pa.array(["I", "I", "I", "I"], pa.string()),
        "seq": pa.array([1, 2, 3, 4], pa.int64()),
    }
    pq.write_table(pa.table(rows), f"{path}/seg-00000.parquet")


def test_derive_redacts_pii_before_merge(spark, tmp_path):
    ch = tmp_path / "changes"
    ch.mkdir()
    _write_changes(str(ch))
    cfg = EngineConfig(
        changes_dir=str(ch) + "/*.parquet",
        target_dir=str(tmp_path / "target"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_buckets=2,
        derives={"text": tx.pii_redact_spark_sql("text")},
    )
    replay_batch(spark, cfg)
    table = ParquetSnapshotSink(spark, cfg.target_dir, 2).read_table()
    texts = {r["text"] for r in table.collect()}
    assert texts == {
        "mail me at <EMAIL> please",
        "ssn is <SSN> and phone <PHONE>",
        "server at <IP> is fine",
        "no pii here at all",
    }
    # nothing PII-shaped survives anywhere in the stored table
    assert (
        table.filter(
            F.col("text").rlike(r"@|\d{3}-\d{2}-\d{4}|\d+\.\d+\.\d+\.\d+")
        ).count()
        == 0
    )


def test_spark_and_duck_renderers_agree(spark):
    """The Spark-SQL and DuckDB renderings of the redaction chain are
    the same function — pinned on adversarial inputs."""
    import duckdb

    samples = [
        "a@b.co then 1.2.3.4",
        "x 999-99-9999 y 111.222.333.444",
        "call 123.456.7890 or write bob_jones%z@mail.example.org",
        "nothing",
        "almost-an-ip 1.2.3 and almost-ssn 12-34-5678",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "text string")
    got = [
        r[0]
        for r in df.selectExpr(f"{tx.pii_redact_spark_sql('text')} AS t")
        .collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE s(i INT, t VARCHAR)")
    con.executemany("INSERT INTO s VALUES (?, ?)", list(enumerate(samples)))
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {tx.pii_redact_sql('t')} FROM s ORDER BY i"
        ).fetchall()
    ]
    assert sorted(got) == sorted(want)
