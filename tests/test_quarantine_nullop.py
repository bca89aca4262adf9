"""Three-valued-logic regressions in the engine's gates, found by
review in round 4.

1. Envelope gate: ``op IS NULL`` makes ``op IN (...)`` NULL, ``NOT
   NULL`` stays NULL, the ``malformed`` WHEN doesn't fire, and a
   null-op row with otherwise-valid keys passed `quarantine_split` as
   a valid change event — violating the documented "unknown op / null
   key → malformed" contract and handing the sink an op it has no
   branch for.
2. Routed fan-out: a row on which a route predicate evaluates NULL is
   (correctly) dropped from that route by filter semantics, but the
   catch-all's ``~any(preds)`` was also NULL — the row vanished from
   EVERY target, though `EngineConfig.routes` documents that ``'*'``
   catches the rest."""

import datetime

from pyspark.sql import functions as F

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.schemas import CHANGE_SCHEMA
from oec_etl_spark.streaming.engine import quarantine_split, run_replay
from oec_etl_spark.streaming.sink import ParquetSnapshotSink

SCHEMA = ("op string, conv_id string, turn_idx int, role string, "
          "text string, tool string, ts timestamp, seq long")
TS = datetime.datetime(2024, 1, 1)


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_null_op_with_valid_keys_is_malformed(spark):
    df = _rows(spark, [
        (None, "c1", 1, "user", "hi", None, TS, 1),   # the leak
        ("I",  "c2", 1, "user", "hi", None, TS, 2),   # control
        ("Z",  "c3", 1, "user", "hi", None, TS, 3),   # unknown op
        (None, None, None, None, None, None, TS, 4),  # null op + null key
    ])
    valid, rej = quarantine_split(df)
    assert [r.op for r in valid.collect()] == ["I"]
    rejected = {r.seq: r["__reject"] for r in rej.collect()}
    assert rejected == {1: "malformed", 3: "malformed", 4: "malformed"}


def test_null_op_rejected_before_constraints(spark):
    """A NULL op must fall into the envelope bucket ('malformed'), not
    be attributed to whichever CHECK constraint happens to also
    evaluate NULL on it."""
    df = _rows(spark, [
        (None, "c1", 1, "user", "", None, TS, 1),
        ("I",  "c2", 1, "user", "", None, TS, 2),  # fails the constraint
    ])
    valid, rej = quarantine_split(df, {"text_nonempty": "length(text) > 0"})
    assert valid.count() == 0
    rejected = {r.seq: r["__reject"] for r in rej.collect()}
    assert rejected == {1: "malformed", 2: "text_nonempty"}


def test_null_route_predicate_row_lands_in_catchall(spark, tmp_path):
    """role IS NULL makes the 'users' predicate NULL: the row must fall
    to the '*' route, not vanish from every target."""
    rows = [
        (1, "I", "c1", 1, "user", "hello", None, TS, None, None),
        (2, "I", "c2", 1, "assistant", "hi", None, TS, None, None),
        (3, "I", "c3", 1, None, "orphan", None, TS, None, None),  # NULL pred
    ]
    changes = str(tmp_path / "changes")
    spark.createDataFrame(rows, CHANGE_SCHEMA).coalesce(1).write.parquet(changes)
    cfg = EngineConfig(
        changes_dir=changes,
        target_dir=str(tmp_path / "target"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_buckets=2,
        routes={"users": "role = 'user'", "rest": "*"},
    )
    run_replay(spark, cfg)
    users = ParquetSnapshotSink(spark, f"{cfg.target_dir}/users", 2).read_table()
    rest = ParquetSnapshotSink(spark, f"{cfg.target_dir}/rest", 2).read_table()
    assert {r.conv_id for r in users.collect()} == {"c1"}
    assert {r.conv_id for r in rest.collect()} == {"c2", "c3"}
    assert rest.filter(F.col("role").isNull()).count() == 1


def test_unrouted_rows_counted_without_catchall(spark, tmp_path):
    """`EngineConfig.routes` documents that rows matching no route are
    COUNTED per batch and dropped — the count must actually appear in
    lineage (rows_unrouted), including NULL-predicate rows."""
    rows = [
        (1, "I", "c1", 1, "user", "hello", None, TS, None, None),
        (2, "I", "c2", 1, "assistant", "hi", None, TS, None, None),
        (3, "I", "c3", 1, None, "orphan", None, TS, None, None),      # NULL pred
        (4, "I", "c4", 1, "tool", "unrouted", None, TS, None, None),  # FALSE pred
    ]
    changes = str(tmp_path / "changes")
    spark.createDataFrame(rows, CHANGE_SCHEMA).coalesce(1).write.parquet(changes)
    cfg = EngineConfig(
        changes_dir=changes,
        target_dir=str(tmp_path / "target"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_buckets=2,
        routes={"users": "role = 'user'", "assistants": "role = 'assistant'"},
    )
    recs = run_replay(spark, cfg)
    assert recs and all(r.rows_unrouted == 2 for r in recs)
    users = ParquetSnapshotSink(spark, f"{cfg.target_dir}/users", 2).read_table()
    asst = ParquetSnapshotSink(spark, f"{cfg.target_dir}/assistants", 2).read_table()
    assert {r.conv_id for r in users.collect()} == {"c1"}
    assert {r.conv_id for r in asst.collect()} == {"c2"}
