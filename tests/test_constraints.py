"""Merge-time CHECK constraints (Delta table-constraints analog).

Declarative per-table data-quality rules enforced at ingest: a change
row failing any predicate is diverted to the quarantine DLQ tagged
with the failing rule's name (`__reject`) and never merged. The gate
is one codegen'd CASE inside the existing quarantine pass — no extra
scan. Deletes are exempt (tombstones carry NULL payload by design);
a NULL predicate result rejects (a gate must not admit unparseable
rows on SQL CHECK's NULL technicality).
"""

from __future__ import annotations

import json

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.generate import GeneratorConfig, generate_changelog
from oec_etl_spark.operators.lww import materialize
from oec_etl_spark.schemas import CHANGE_SCHEMA
from oec_etl_spark.streaming.engine import quarantine_split, run_replay
from oec_etl_spark.streaming.sink import ParquetSnapshotSink

from pyspark.sql import functions as F

ROWS = [
    # seq op conv turn role text tool ts(source) —— disposition
    (1, "I", "c1", 0, "user", "fine row", None, None, "s", 0),          # passes
    (2, "I", "c2", 0, "user", None, None, None, "s", 1),                # text_present: text NULL → predicate NULL → reject
    (3, "I", "c3", 0, "user", "", None, None, "s", 2),                  # text_present: FALSE → reject
    (4, "I", "c4", 0, "intruder", "ok text", None, None, "s", 3),       # role_known → reject
    (5, "I", "c5", 0, "user", "kill me", None, None, "s", 4),           # passes
    (6, "D", "c5", 0, None, None, None, None, "s", 5),                  # delete: EXEMPT despite NULL text
    (7, "X", "c6", 0, "user", "bad op", None, None, "s", 6),            # malformed beats constraints
]
CONSTRAINTS = {
    "text_present": "length(text) > 0",
    "role_known": "role in ('user','assistant','system','tool')",
}


def _mkdf(spark):
    return spark.createDataFrame(ROWS, CHANGE_SCHEMA)


def test_constraint_split_reasons_and_delete_exemption(spark):
    valid, bad = quarantine_split(_mkdf(spark), CONSTRAINTS)
    assert "__reject" not in valid.columns
    got = {r["seq"]: r["__reject"] for r in bad.collect()}
    # first failing rule wins; NULL predicate rejects; deletes exempt
    assert got == {2: "text_present", 3: "text_present",
                   4: "role_known", 7: "malformed"}
    assert sorted(r["seq"] for r in valid.collect()) == [1, 5, 6]


def test_constraints_gate_the_replay_and_feed_the_dlq(spark, tmp_path):
    d = tmp_path / "changes"
    d.mkdir()
    _mkdf(spark).coalesce(1).write.parquet(str(d / "seg-00000"))
    q = str(tmp_path / "quarantine")
    cfg = EngineConfig(
        changes_dir=str(d) + "/*",
        target_dir=str(tmp_path / "target"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_buckets=4,
        quarantine_dir=q,
        constraints=CONSTRAINTS,
    )
    recs = run_replay(spark, cfg)
    assert sum(r.rows_quarantined for r in recs) == 4
    dlq = spark.read.parquet(q)
    assert {r["__reject"] for r in dlq.collect()} == {"text_present", "role_known", "malformed"}
    sink = ParquetSnapshotSink(spark, cfg.target_dir, 4)
    out = {r["conv_id"] for r in sink.read_table().collect()}
    # c1 passed; c5 passed then its exempt delete tombstoned it
    assert out == {"c1"}


def test_constrained_replay_matches_constrained_oracle(spark, tmp_path):
    """Generated log + a real rule: the streamed result equals the
    batch oracle computed over the same constraint filter."""
    generate_changelog(GeneratorConfig(out_dir=str(tmp_path / "changes"),
                                       seed=80, n_conversations=50, n_segments=4))
    rule = {"short_text": "length(text) <= 40"}
    cfg = EngineConfig(
        changes_dir=str(tmp_path / "changes"),
        target_dir=str(tmp_path / "target"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_buckets=8,
        max_files_per_trigger=1,
        constraints=rule,
    )
    run_replay(spark, cfg)
    df = spark.read.schema(CHANGE_SCHEMA).parquet(f"{tmp_path}/changes/*.parquet")
    valid, bad = quarantine_split(df, rule)
    assert bad.count() > 0  # the rule actually bit
    want = materialize(valid)
    got = ParquetSnapshotSink(spark, cfg.target_dir, 8).read_table()
    cols = sorted(got.columns)
    assert sorted(want.columns) == cols
    assert got.select(*cols).exceptAll(want.select(*cols)).count() == 0
    assert want.select(*cols).exceptAll(got.select(*cols)).count() == 0


def test_constraint_cli_flag(spark, tmp_path, monkeypatch, capsys):
    d = tmp_path / "changes"
    d.mkdir()
    _mkdf(spark).coalesce(1).write.parquet(str(d / "seg-00000"))
    from oec_etl_spark import cli, session

    monkeypatch.setattr(session, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    q = str(tmp_path / "quarantine")
    assert cli.main([
        "replay", "--changes", str(d) + "/*", "--target", str(tmp_path / "target"),
        "--checkpoint", str(tmp_path / "ckpt"), "--buckets", "4",
        "--quarantine", q,
        "--constraint", "text_present=length(text) > 0",
        "--constraint", "role_known=role in ('user','assistant','system','tool')",
    ]) == 0
    json.loads(capsys.readouterr().out.strip())
    dlq = spark.read.parquet(q)
    assert dlq.filter(F.col("__reject") == "role_known").count() == 1
