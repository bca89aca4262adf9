"""In-loop stream-static enrichment (`EngineConfig.enrich`): a small
dimension broadcast-LEFT-joined onto valid change rows after derives,
before the merge — the reference's load-time dim joins
(/root/reference/etl/countries/brazil/ncm_pipeline.py side-CSV lookup)
as a streaming stage. The dim loads once per stream build and its key
uniqueness is verified up front: a fanning join would duplicate change
rows and corrupt the merge's row-uniqueness contract.
"""

from __future__ import annotations

import pytest

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.generate import GeneratorConfig, generate_changelog
from oec_etl_spark.operators.lww import materialize
from oec_etl_spark.schemas import CHANGE_SCHEMA
from oec_etl_spark.streaming.engine import (
    apply_derives,
    build_enricher,
    quarantine_split,
    run_replay,
)
from oec_etl_spark.streaming.sink import ParquetSnapshotSink


def _cfg(tmp, **kw):
    return EngineConfig(
        changes_dir=str(tmp / "changes"),
        target_dir=str(tmp / "target"),
        checkpoint_dir=str(tmp / "ckpt"),
        n_buckets=4,
        **kw,
    )


def _dim(spark, tmp_path):
    path = str(tmp_path / "dim")
    spark.createDataFrame(
        [("user", "human", 0), ("assistant", "model", 1),
         ("system", "control", 2)],  # note: no "tool" row -> NULL fill
        "role_key string, actor_kind string, actor_rank int",
    ).write.parquet(path)
    return path


def test_enriched_replay_matches_enriched_oracle(spark, tmp_path):
    generate_changelog(GeneratorConfig(
        out_dir=str(tmp_path / "changes"), seed=96, n_conversations=80,
        n_segments=4, update_ratio=1.0, delete_ratio=0.1))
    enrich = {"path": _dim(spark, tmp_path), "key": "role", "dim_key": "role_key",
              "select": {"actor_kind": "actor_kind", "actor_rank": "actor_rank"}}
    cfg = _cfg(tmp_path, max_files_per_trigger=2, enrich=enrich)
    run_replay(spark, cfg)

    raw = spark.read.schema(CHANGE_SCHEMA).parquet(f"{cfg.changes_dir}/*.parquet")
    enriched = build_enricher(spark, enrich)(quarantine_split(raw)[0])
    # the stage must be a broadcast hash join — no shuffle of the
    # change rows for a lookup-sized dim
    plan = enriched._sc._jvm.PythonSQLUtils.explainString(
        enriched._jdf.queryExecution(), "formatted")
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    oracle = materialize(enriched)
    table = ParquetSnapshotSink(spark, cfg.target_dir, 4).read_table()
    assert {"actor_kind", "actor_rank"} <= set(table.columns)
    cols = sorted(table.columns)
    assert sorted(oracle.columns) == cols
    t, o = table.select(*cols), oracle.select(*cols)
    assert t.exceptAll(o).count() == 0 and o.exceptAll(t).count() == 0
    # matched rows enriched; unmatched roles got NULLs (left join)
    kinds = {r["role"]: r["actor_kind"] for r in table.collect()}
    assert kinds.get("assistant") == "model"
    if "tool" in kinds:
        assert kinds["tool"] is None


def test_enrich_composes_with_derived_join_key(spark, tmp_path):
    """Derives run first, so a derived column can be the join key."""
    generate_changelog(GeneratorConfig(
        out_dir=str(tmp_path / "changes"), seed=97, n_conversations=30, n_segments=2))
    enrich = {"path": _dim(spark, tmp_path), "key": "role_uc", "dim_key": "role_key",
              "select": {"actor_kind": "actor_kind"}}
    cfg = _cfg(tmp_path, derives={"role_uc": "lower(upper(role))"}, enrich=enrich)
    run_replay(spark, cfg)
    table = ParquetSnapshotSink(spark, cfg.target_dir, 4).read_table()
    got = {r["role"]: r["actor_kind"] for r in table.collect() if r["role"] == "assistant"}
    assert got == {"assistant": "model"} or got == {}


def test_enrich_rejects_fanning_dim_and_protected_names(spark, tmp_path):
    generate_changelog(GeneratorConfig(
        out_dir=str(tmp_path / "changes"), seed=98, n_conversations=10, n_segments=2))
    dup = str(tmp_path / "dup")
    spark.createDataFrame(
        [("user", "a"), ("user", "b")], "role_key string, actor_kind string"
    ).write.parquet(dup)
    cfg = _cfg(tmp_path, enrich={"path": dup, "key": "role", "dim_key": "role_key",
                                 "select": {"actor_kind": "actor_kind"}})
    with pytest.raises(Exception, match="not unique"):
        run_replay(spark, cfg)
    cfg2 = _cfg(tmp_path, enrich={"path": dup, "key": "role", "dim_key": "role_key",
                                  "select": {"ts": "actor_kind"}})
    with pytest.raises(Exception, match="protected"):
        run_replay(spark, cfg2)
    with pytest.raises(Exception, match="at least one"):
        build_enricher(spark, {"path": dup, "key": "role"})


def test_enrich_pipeline_spec_relative_dim_path(spark, tmp_path, monkeypatch, capsys):
    import json

    generate_changelog(GeneratorConfig(
        out_dir=str(tmp_path / "changes"), seed=99, n_conversations=20, n_segments=2))
    _dim(spark, tmp_path)
    from oec_etl_spark import cli, session

    monkeypatch.setattr(session, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    spec = tmp_path / "job.yaml"
    spec.write_text(
        "mode: replay\n"
        "changes: changes\n"
        "target: t\n"
        "checkpoint: c\n"
        "buckets: 4\n"
        "enrich:\n"
        "  path: dim\n"          # relative to the spec file
        "  key: role\n"
        "  dim_key: role_key\n"
        "  select: {actor_kind: actor_kind}\n"
    )
    assert cli.main(["run", "--pipeline", str(spec)]) == 0
    assert json.loads(capsys.readouterr().out.strip())["rows_applied"] > 0
    t = ParquetSnapshotSink(spark, str(tmp_path / "t"), 4).read_table()
    assert "actor_kind" in t.columns
