"""DLQ requeue: draining quarantined rows back into the change stream.

The second half of the quarantine story — after the upstream fix, the
rejected rows must re-enter through the SAME gate as live traffic (so a
still-broken row returns to the DLQ with its reason), and the whole
cycle must converge to the unconstrained oracle once the constraint is
lifted. Re-delivery across a crash between segment write and DLQ shrink
is safe because the merge is an LWW no-op for already-applied rows.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.generate import GeneratorConfig, generate_changelog
from oec_etl_spark.operators.lww import materialize
from oec_etl_spark.schemas import CHANGE_SCHEMA
from oec_etl_spark.streaming.engine import (
    quarantine_split,
    requeue_quarantined,
    run_replay,
)
from oec_etl_spark.streaming.sink import ParquetSnapshotSink


def _cfg(tmp, **kw):
    return EngineConfig(
        changes_dir=str(tmp / "changes"), target_dir=str(tmp / "t"),
        checkpoint_dir=str(tmp / "c"), n_buckets=4,
        quarantine_dir=str(tmp / "dlq"), **kw,
    )


def _oracle(spark, changes_dir):
    df = spark.read.schema(CHANGE_SCHEMA).parquet(f"{changes_dir}/*.parquet")
    valid, _ = quarantine_split(df)
    return materialize(valid)


def _same(a, b):
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a, b = a.select(*cols), b.select(*cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_requeue_converges_to_oracle_after_constraint_lifted(spark, tmp_path):
    generate_changelog(GeneratorConfig(
        out_dir=str(tmp_path / "changes"), seed=21, n_conversations=40, n_segments=3))
    # constraint rejects every assistant turn → they land in the DLQ
    cfg = _cfg(tmp_path, constraints={"no_assistant": "role <> 'assistant'"})
    run_replay(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, 4)
    n_dlq = spark.read.parquet(str(tmp_path / "dlq")).count()
    assert n_dlq > 0
    assert sink.read_table().filter(F.col("role") == "assistant").count() == 0

    # upstream fixed: drain the DLQ, replay the SAME checkpoint without
    # the constraint — only the requeue segment is new
    res = requeue_quarantined(spark, str(tmp_path / "dlq"), cfg.changes_dir)
    assert res["requeued"] == n_dlq and res["kept"] == 0
    assert os.path.exists(res["segment"])
    assert not glob.glob(str(tmp_path / "dlq") + "/*.parquet")  # DLQ drained
    run_replay(spark, _cfg(tmp_path))
    _same(sink.read_table(), _oracle(spark, cfg.changes_dir))


def test_requeue_reason_filter_keeps_other_reasons(spark, tmp_path):
    generate_changelog(GeneratorConfig(
        out_dir=str(tmp_path / "changes"), seed=22, n_conversations=30, n_segments=2))
    cfg = _cfg(tmp_path, constraints={
        "no_assistant": "role <> 'assistant'",
        "no_user": "role <> 'user'",
    })
    run_replay(spark, cfg)
    dlq = spark.read.parquet(str(tmp_path / "dlq"))
    n_assist = dlq.filter(F.col("__reject") == "no_assistant").count()
    n_user = dlq.filter(F.col("__reject") == "no_user").count()
    assert n_assist > 0 and n_user > 0

    res = requeue_quarantined(
        spark, str(tmp_path / "dlq"), cfg.changes_dir, reasons=["no_assistant"])
    assert res["requeued"] == n_assist and res["kept"] == n_user
    left = spark.read.parquet(str(tmp_path / "dlq"))
    assert left.count() == n_user
    assert left.filter(F.col("__reject") != "no_user").count() == 0


def test_requeue_still_failing_rows_return_to_dlq(spark, tmp_path):
    generate_changelog(GeneratorConfig(
        out_dir=str(tmp_path / "changes"), seed=23, n_conversations=30, n_segments=2))
    cfg = _cfg(tmp_path, constraints={"no_assistant": "role <> 'assistant'"})
    run_replay(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, 4)
    before_rows = sorted(map(tuple, sink.read_table().collect()))
    n_dlq = spark.read.parquet(str(tmp_path / "dlq")).count()

    requeue_quarantined(spark, str(tmp_path / "dlq"), cfg.changes_dir)
    run_replay(spark, cfg)  # constraint STILL active → all bounce back
    assert spark.read.parquet(str(tmp_path / "dlq")).count() == n_dlq
    assert sorted(map(tuple, sink.read_table().collect())) == before_rows


def test_requeue_empty_dlq_is_noop(spark, tmp_path):
    os.makedirs(str(tmp_path / "dlq"), exist_ok=True)
    os.makedirs(str(tmp_path / "changes"), exist_ok=True)
    res = requeue_quarantined(spark, str(tmp_path / "dlq"), str(tmp_path / "changes"))
    assert res == {"requeued": 0, "kept": 0, "segment": None}


def test_requeue_speaks_the_pipelines_change_log_format(spark, tmp_path):
    """A json-format pipeline must get a JSON requeue segment — a
    parquet file dropped into a json-watched dir would be read as
    garbage by the stream source."""
    generate_changelog(GeneratorConfig(
        out_dir=str(tmp_path / "changes"), seed=24, n_conversations=20,
        n_segments=2, file_format="json"))
    cfg = _cfg(tmp_path, format="json",
               constraints={"no_assistant": "role <> 'assistant'"})
    run_replay(spark, cfg)
    n_dlq = spark.read.parquet(str(tmp_path / "dlq")).count()
    assert n_dlq > 0

    res = requeue_quarantined(
        spark, str(tmp_path / "dlq"), cfg.changes_dir, file_format="json")
    assert res["requeued"] == n_dlq and res["segment"].endswith(".json")
    run_replay(spark, _cfg(tmp_path, format="json"))

    df = spark.read.schema(CHANGE_SCHEMA).format("json").load(cfg.changes_dir)
    valid, _ = quarantine_split(df)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, 4)
    _same(sink.read_table(), materialize(valid))
