"""Round-4 ADVICE regressions.

1. pmod bucketing: the production hash tier used abs(xxhash64(x)) % m —
   abs(Long.MIN_VALUE) overflows back to MIN_VALUE (two's complement has
   no positive 2^63), producing a NEGATIVE bucket that fails
   element_at / splits rows into no split band. Fixed with F.pmod in
   operators/classifier.py and operators/sampling.py.
2. Zero-norm vectors in nearest-centroid assignment: 0/0 cosines are
   NaN; numpy argmax picks the first NaN while the literal plan's
   struct-max follows Spark NaN ordering. Both plans now define
   zero-norm (input or centroid) as cos 0.0 → tie-break to lowest id.
3. The engine's connector source dropped all reader options (header/
   sep) and defaulted http payloads to parquet while Connector.read
   defaulted csv — a header row replayed as a quarantined malformed
   row. _resolve_source now forwards options and both default csv.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


# ------------------------------------------------------ 1. pmod buckets
def test_pmod_min_long_is_nonnegative(spark):
    """The raw hazard: abs(MIN_LONG) overflows — ARITHMETIC_OVERFLOW
    under ANSI (Spark 4 default), else MIN_LONG % 63 = -8; either way
    never a valid bucket. pmod gives the mathematical residue 55."""
    row = spark.range(1).select(
        F.pmod(F.lit(-(2 ** 63)).cast("long"), F.lit(63)).alias("p")
    ).collect()[0]
    assert row["p"] == 55
    old = spark.range(1).select(
        (F.abs(F.lit(-(2 ** 63)).cast("long")) % 63).alias("a")
    )
    try:
        val = old.collect()[0]["a"]
    except Exception:
        pass  # ANSI: the old expression throws outright
    else:
        assert val == -8  # non-ANSI: silently negative


def test_classifier_production_buckets_in_range(spark):
    from oec_etl_spark.operators.classifier import _bucket

    toks = spark.createDataFrame(
        [(f"tok{i}",) for i in range(2000)], "t string"
    )
    for dim in (63, 64, 257):
        got = toks.select(_bucket(F.col("t"), dim, portable_hash=False).alias("b"))
        stats = got.agg(F.min("b").alias("lo"), F.max("b").alias("hi")).collect()[0]
        assert 0 <= stats["lo"] and stats["hi"] < dim


def test_sampling_production_buckets_in_range(spark):
    from oec_etl_spark.operators.sampling import RESOLUTION, _bucket

    ids = spark.range(5000)
    got = ids.select(_bucket(F.col("id"), "s0", portable_hash=False).alias("b"))
    stats = got.agg(F.min("b").alias("lo"), F.max("b").alias("hi")).collect()[0]
    assert 0 <= stats["lo"] and stats["hi"] < RESOLUTION


# --------------------------------------------- 2. zero-norm centroid rows
def test_zero_vector_assignment_identical_on_both_plans(spark):
    from oec_etl_spark.operators.similarity import nearest_centroid_cols

    cents = [
        {"centroid_id": 0, "centroid": [1.0, 0.0]},
        {"centroid_id": 1, "centroid": [0.0, 1.0]},
    ]
    vecs = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.5, 0.1]), (3, [0.0, 2.0])],
        "vid int, emb array<double>",
    )

    def assign(k_literal_max):
        cid, cos = nearest_centroid_cols(
            cents, "emb", "centroid_id", "centroid", k_literal_max=k_literal_max
        )
        return {
            r["vid"]: (r["centroid_id"], r["cos"])
            for r in vecs.select("vid", cid, cos).collect()
        }

    lit = assign(k_literal_max=16)  # literal plan (2 centroids ≤ 16)
    arr = assign(k_literal_max=0)   # forced Arrow plan
    assert lit == arr
    # the defined degenerate result: cos 0.0, lowest centroid id
    assert lit[1] == (0, 0.0)
    assert lit[2][0] == 0 and lit[3][0] == 1


def test_zero_centroid_identical_on_both_plans(spark):
    from oec_etl_spark.operators.similarity import nearest_centroid_cols

    cents = [
        {"centroid_id": 0, "centroid": [0.0, 0.0]},  # degenerate centroid
        {"centroid_id": 1, "centroid": [0.0, 1.0]},
    ]
    vecs = spark.createDataFrame([(1, [0.0, 3.0])], "vid int, emb array<double>")

    def assign(k_literal_max):
        cid, cos = nearest_centroid_cols(
            cents, "emb", "centroid_id", "centroid", k_literal_max=k_literal_max
        )
        return [tuple(r) for r in vecs.select("vid", cid, cos).collect()]

    assert assign(16) == assign(0) == [(1, 1, 1.0)]


# ------------------------------------- 3. connector reader options/format
def test_resolve_source_forwards_connector_options(tmp_path):
    from oec_etl_spark.config import EngineConfig
    from oec_etl_spark.streaming.engine import _resolve_source

    conns = tmp_path / "conns.yaml"
    conns.write_text(
        f"csv-log:\n  driver: csv\n  uri: {tmp_path}/log\n"
        "  options: {header: 'true', sep: ';'}\n"
    )
    cfg = EngineConfig(
        changes_dir="csv-log", target_dir=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "c"), connectors_path=str(conns),
    )
    path, fmt, opts = _resolve_source(cfg)
    assert (path, fmt) == (f"{tmp_path}/log", "csv")
    assert opts == {"header": "true", "sep": ";"}


def test_resolve_source_http_default_format_matches_connector(tmp_path, monkeypatch):
    """Engine and Connector.read used to disagree on the http payload
    default (parquet vs csv); both now say csv, and staging-only
    options never reach the Spark reader."""
    from oec_etl_spark.config import EngineConfig
    from oec_etl_spark.connectors import Connector
    from oec_etl_spark.streaming.engine import _resolve_source

    staged = tmp_path / "stage" / "abc" / "data.csv"
    os.makedirs(staged.parent)
    staged.write_text("x\n")
    monkeypatch.setattr(Connector, "stage", lambda self, params=None: str(staged))
    conns = tmp_path / "conns.yaml"
    conns.write_text(
        "remote:\n  driver: http\n  uri: http://example.invalid/f.csv\n"
        f"  options: {{header: 'true', stage_dir: {tmp_path}/stage}}\n"
    )
    cfg = EngineConfig(
        changes_dir="remote", target_dir=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "c"), connectors_path=str(conns),
    )
    path, fmt, opts = _resolve_source(cfg)
    assert path == str(staged.parent)
    assert fmt == "csv"  # Connector.read's default, now shared
    assert opts == {"header": "true"}  # stage_dir/format never forwarded


def test_engine_replays_csv_connector_with_header(spark, tmp_path):
    """End-to-end ADVICE scenario: a csv change log behind a named
    connector with header+sep options. Before the fix the engine read
    it header-as-data (and an http variant as parquet); now the header
    is consumed by the reader and every data row applies."""
    from oec_etl_spark.config import EngineConfig
    from oec_etl_spark.streaming.engine import run_replay
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    log = tmp_path / "log"
    os.makedirs(log)
    (log / "seg-000.csv").write_text(
        "seq;op;conv_id;turn_idx;role;text;tool;ts;source_file;offset\n"
        "1;I;c1;0;user;hello;;2024-01-01 00:00:00;seg-000;0\n"
        "2;I;c1;1;assistant;hi;;2024-01-01 00:00:01;seg-000;1\n"
        "3;U;c1;1;assistant;hi there;;2024-01-01 00:00:02;seg-000;2\n"
    )
    conns = tmp_path / "conns.yaml"
    conns.write_text(
        f"csv-log:\n  driver: csv\n  uri: {log}\n"
        "  options: {header: 'true', sep: ';'}\n"
    )
    cfg = EngineConfig(
        changes_dir="csv-log", target_dir=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "c"), n_buckets=2,
        connectors_path=str(conns),
    )
    recs = run_replay(spark, cfg)
    # exactly the 3 data rows — a replayed header would make it 4
    assert sum(r.rows_in_batch for r in recs) == 3
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
        .read_table().collect()
    }
    assert got == {("c1", 0): "hello", ("c1", 1): "hi there"}
