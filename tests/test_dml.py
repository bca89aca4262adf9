"""Predicate DML (`delete_where` / `update_where`, CLI `delete` /
`update`): DELETE/UPDATE ... WHERE routed THROUGH the merge — matched
live rows re-emitted as change events at their own ts with seq+1, so
they beat exactly the row they were derived from (and anything older)
while later real events still win. Every merge invariant (lineage,
watermarks, epoch guard, fan-out, mor deltas) applies unchanged. DML
epochs use negative batch ids so they can never shadow the streaming
checkpoint's non-negative ones.
"""

from __future__ import annotations

import datetime
import json

import pytest

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.generate import GeneratorConfig, generate_changelog
from oec_etl_spark.streaming.engine import run_replay
from oec_etl_spark.streaming.sink import ParquetSnapshotSink


def _seed(spark, tmp_path, **kw):
    generate_changelog(GeneratorConfig(
        out_dir=str(tmp_path / "changes"), seed=77, n_conversations=40,
        n_segments=3, update_ratio=0.8, **kw))
    cfg = EngineConfig(
        changes_dir=str(tmp_path / "changes"), target_dir=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "c"), n_buckets=4,
    )
    run_replay(spark, cfg)
    return cfg, ParquetSnapshotSink(spark, cfg.target_dir, 4)


def _same(a, b):
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a, b = a.select(*cols), b.select(*cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_delete_where_matches_filter_and_respects_lww(spark, tmp_path):
    cfg, sink = _seed(spark, tmp_path)
    pre = sink.read_table().cache()
    pred = "role = 'tool'"
    n_match = pre.filter(pred).count()
    assert n_match > 0
    victim = pre.filter(pred).first()

    rec = sink.delete_where(pred)
    assert rec.batch_id < 0 and rec.rows_applied == n_match
    post = sink.read_table()
    _same(post, pre.filter(f"NOT ({pred})"))

    from oec_etl_spark.schemas import CHANGE_SCHEMA

    # a LATE, OLDER update for a deleted key must NOT resurrect it ...
    old_ts = victim["ts"] - datetime.timedelta(hours=1)
    late = spark.createDataFrame(
        [(0, "U", victim["conv_id"], victim["turn_idx"], "user", "too-late",
          None, old_ts, "late", 0)], CHANGE_SCHEMA)
    sink.merge(late, batch_id=sink._dml_batch_id())
    assert sink.read_table().filter(
        f"conv_id = '{victim['conv_id']}' AND turn_idx = {victim['turn_idx']}"
    ).count() == 0
    # ... while a NEWER update wins over the tombstone
    new_ts = victim["ts"] + datetime.timedelta(hours=1)
    fresh = spark.createDataFrame(
        [(10 ** 7, "U", victim["conv_id"], victim["turn_idx"], "user", "back",
          None, new_ts, "fresh", 0)], CHANGE_SCHEMA)
    sink.merge(fresh, batch_id=sink._dml_batch_id())
    row = sink.read_table().filter(
        f"conv_id = '{victim['conv_id']}' AND turn_idx = {victim['turn_idx']}"
    ).collect()
    assert len(row) == 1 and row[0]["text"] == "back"
    pre.unpersist()


def test_update_where_applies_set_exprs(spark, tmp_path):
    import pyspark.sql.functions as F

    cfg, sink = _seed(spark, tmp_path)
    pre = sink.read_table().cache()
    pred = "role = 'assistant'"
    n_match = pre.filter(pred).count()
    rec = sink.update_where(pred, {"text": "upper(text)", "tool": "'redacted'"})
    assert rec.rows_applied == n_match
    want = pre.withColumn(
        "text", F.when(F.expr(pred), F.expr("upper(text)")).otherwise(F.col("text"))
    ).withColumn(
        "tool", F.when(F.expr(pred), F.lit("redacted")).otherwise(F.col("tool"))
    )
    _same(sink.read_table(), want)
    pre.unpersist()


def test_dml_guards_and_streaming_resume_unaffected(spark, tmp_path):
    cfg, sink = _seed(spark, tmp_path)
    with pytest.raises(ValueError, match="protected"):
        sink.update_where("true", {"ts": "ts"})
    with pytest.raises(ValueError, match="protected"):
        sink.update_where("true", {"conv_id": "'x'"})
    with pytest.raises(KeyError, match="not in table schema"):
        sink.update_where("true", {"nope": "1"})

    # DML epochs (negative) must not shadow the stream's: drop new
    # segments and resume the SAME checkpoint — they must apply
    sink.delete_where("role = 'tool'")
    generate_changelog(GeneratorConfig(
        out_dir=str(tmp_path / "more"), seed=78, n_conversations=10, n_segments=1))
    for f in (tmp_path / "more").glob("*.parquet"):
        f.rename(tmp_path / "changes" / f"late-{f.name}")
    recs = run_replay(spark, cfg)
    applied = [r for r in recs if not r.skipped_as_committed]
    assert applied and sum(r.rows_applied for r in applied) > 0


def test_dml_cli(spark, tmp_path, monkeypatch, capsys):
    cfg, sink = _seed(spark, tmp_path)
    from oec_etl_spark import cli, session

    monkeypatch.setattr(session, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    n = sink.read_table().filter("role = 'system'").count()
    assert cli.main(["update", "--target", cfg.target_dir, "--buckets", "4",
                     "--where", "role = 'system'", "--set", "text=''"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["updated"] == n and out["batch_id"] < 0
    assert cli.main(["delete", "--target", cfg.target_dir, "--buckets", "4",
                     "--where", "role = 'system'"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["deleted"] == n
    assert sink.read_table().filter("role = 'system'").count() == 0
