"""Connector registry (conns.yaml analog) — SURVEY.md §2.1 S1.

Mirrors the reference's declarative endpoint binding
(/root/reference/etl/conns.yaml:5-47): named sources with <param>
placeholders and $ENV refs, resolved from run params, consumed by the
engine via EngineConfig.connectors_path.
"""

from __future__ import annotations

import io
import os

import pytest

from oec_etl_spark.connectors import Connector, fetch, load_connectors

CONNS_YAML = """
comtrade-monthly:
  driver: csv
  uri: {root}/raw/ALL-<year>-<month>-M-HS.csv
  options: {{header: "true", sep: ";"}}
changelog:
  driver: parquet
  uri: $OEC_TEST_DATA_ROOT/changes
"""


def test_connector_template_binding(tmp_path):
    conns = load_connectors(io.StringIO(CONNS_YAML.format(root=tmp_path)))
    c = conns["comtrade-monthly"]
    assert c.driver == "csv" and c.options == {"header": "true", "sep": ";"}
    path = c.resolve({"year": 2019, "month": "01"})
    assert path == f"{tmp_path}/raw/ALL-2019-01-M-HS.csv"
    with pytest.raises(KeyError, match="unbound connector param <month>"):
        c.resolve({"year": 2019})  # missing param fails loudly, no empty glob


def test_env_expansion_and_fetch(tmp_path, monkeypatch):
    monkeypatch.setenv("OEC_TEST_DATA_ROOT", str(tmp_path))
    c = fetch("changelog", io.StringIO(CONNS_YAML.format(root=tmp_path)))
    assert c.resolve() == f"{tmp_path}/changes"
    with pytest.raises(KeyError, match="no connector"):
        fetch("nope", io.StringIO(CONNS_YAML.format(root=tmp_path)))


def test_connector_read_csv(spark, tmp_path):
    raw = tmp_path / "raw"
    os.makedirs(raw)
    (raw / "ALL-2019-01-M-HS.csv").write_text("a;b\n1;x\n2;y\n")
    c = Connector("m", "csv", f"{tmp_path}/raw/ALL-<year>-<month>-M-HS.csv",
                  {"header": "true", "sep": ";"})
    rows = c.read(spark, {"year": 2019, "month": "01"}, schema="a int, b string").collect()
    assert sorted((r["a"], r["b"]) for r in rows) == [(1, "x"), (2, "y")]


def test_engine_replays_via_connector_name(spark, tmp_path):
    """EngineConfig.changes_dir as a connector name: the replay resolves
    the path + format through the registry and matches the oracle."""
    from oec_etl_spark.config import EngineConfig
    from oec_etl_spark.generate import GeneratorConfig, generate_changelog
    from oec_etl_spark.operators.lww import materialize
    from oec_etl_spark.schemas import CHANGE_SCHEMA
    from oec_etl_spark.streaming.engine import quarantine_split, run_replay
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    generate_changelog(GeneratorConfig(out_dir=str(tmp_path / "log-42"), seed=42, n_conversations=40))
    conns = tmp_path / "conns.yaml"
    conns.write_text(
        f"transcript-changelog:\n  driver: parquet\n  uri: {tmp_path}/log-<run_id>\n"
    )
    cfg = EngineConfig(
        changes_dir="transcript-changelog",  # a NAME, not a path
        target_dir=str(tmp_path / "target"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_buckets=4,
        connectors_path=str(conns),
        source_params={"run_id": "42"},
    )
    recs = run_replay(spark, cfg)
    assert sum(r.rows_applied for r in recs) > 0
    table = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets).read_table()
    raw = spark.read.schema(CHANGE_SCHEMA).parquet(str(tmp_path / "log-42"))
    oracle = materialize(quarantine_split(raw)[0])
    assert table.exceptAll(oracle).count() == 0 and oracle.exceptAll(table).count() == 0
