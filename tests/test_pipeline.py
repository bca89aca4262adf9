"""Declarative pipeline specs: one YAML = one CDC job (mode + every
EngineConfig knob), with loud failures for typo'd keys and relative
paths resolved against the spec file — the deployable, reviewable
analog of the reference's pipeline scripts."""

from __future__ import annotations

import json

import pytest

from oec_etl_spark.generate import GeneratorConfig, generate_changelog
from oec_etl_spark.operators.lww import materialize
from oec_etl_spark.pipeline import load_pipeline
from oec_etl_spark.schemas import CHANGE_SCHEMA
from oec_etl_spark.streaming.engine import quarantine_split
from oec_etl_spark.streaming.sink import ParquetSnapshotSink


def _write(tmp_path, text: str, name="pipeline.yaml") -> str:
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_run_replay_spec_end_to_end(spark, tmp_path, monkeypatch, capsys):
    """A full spec — mor + in-loop minor compaction + a CHECK
    constraint + DLQ — driven through `cli run`, matches the equally
    constrained batch oracle."""
    generate_changelog(GeneratorConfig(out_dir=str(tmp_path / "changes"),
                                       seed=85, n_conversations=40, n_segments=4))
    spec = _write(tmp_path, """
mode: replay
changes: changes
target: lake/transcripts
checkpoint: ckpt
buckets: 8
table_mode: mor
minor_compact_after: 2
max_files_per_trigger: 1
quarantine: dlq
constraints:
  short_text: "length(text) <= 60"
""")
    from oec_etl_spark import cli, session

    monkeypatch.setattr(session, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    assert cli.main(["run", "--pipeline", spec]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["mode"] == "replay" and out["batches"] >= 3
    df = spark.read.schema(CHANGE_SCHEMA).parquet(f"{tmp_path}/changes/*.parquet")
    valid, bad = quarantine_split(df, {"short_text": "length(text) <= 60"})
    assert bad.count() > 0
    want = materialize(valid)
    got = ParquetSnapshotSink(spark, str(tmp_path / "lake/transcripts"), 8,
                              table_mode="mor").read_table()
    cols = sorted(got.columns)
    assert got.select(*cols).exceptAll(want.select(*cols)).count() == 0
    assert want.select(*cols).exceptAll(got.select(*cols)).count() == 0
    assert spark.read.parquet(str(tmp_path / "dlq")).count() == bad.count()


def test_spec_key_mapping_and_validation(tmp_path):
    mode, cfg = load_pipeline(_write(tmp_path, """
mode: tail
changes: changelog
connectors: conns.yaml
params: {table: transcripts}
target: lake
checkpoint: ckpt
interval: 5 seconds
dedup_watermark: 10 minutes
mviews:
  - {path: views/by_role, group_keys: [role]}
"""))
    assert mode == "tail"
    assert cfg.changes_dir == "changelog"  # connector NAME, not a path
    assert cfg.connectors_path == str(tmp_path / "conns.yaml")
    assert cfg.source_params == {"table": "transcripts"}
    assert cfg.processing_interval == "5 seconds"
    assert cfg.target_dir == str(tmp_path / "lake")
    assert cfg.mviews == [{"path": str(tmp_path / "views/by_role"), "group_keys": ["role"]}]

    with pytest.raises(ValueError, match="unknown pipeline key 'bukets'"):
        load_pipeline(_write(tmp_path, "changes: c\ntarget: t\ncheckpoint: k\nbukets: 8\n"))
    with pytest.raises(ValueError, match="mode must be one of"):
        load_pipeline(_write(tmp_path, "mode: stream\nchanges: c\ntarget: t\ncheckpoint: k\n"))
    with pytest.raises(ValueError, match="missing required keys"):
        load_pipeline(_write(tmp_path, "changes: c\ntarget: t\n"))
    with pytest.raises(ValueError, match="duplicate setting"):
        load_pipeline(_write(tmp_path,
                             "changes: c\ntarget: t\ncheckpoint: k\nbuckets: 8\nn_buckets: 4\n"))
