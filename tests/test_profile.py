"""Opt-in per-batch data-quality profile (`EngineConfig.profile` / CLI
`--profile`): NULL counts per payload column among each batch's UPSERT
rows (tombstones excluded — their payload is NULL by design), recorded
in lineage and rolled up by `stats`. One extra O(batch) aggregate per
merge, off by default."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.generate import GeneratorConfig, generate_changelog
from oec_etl_spark.schemas import CHANGE_SCHEMA
from oec_etl_spark.streaming.engine import quarantine_split, run_replay


def _cfg(tmp, **kw):
    return EngineConfig(
        changes_dir=str(tmp / "changes"),
        target_dir=str(tmp / "target"),
        checkpoint_dir=str(tmp / "ckpt"),
        n_buckets=4,
        **kw,
    )


def test_profile_counts_match_direct_nulls_and_stats_rollup(
    spark, tmp_path, monkeypatch, capsys
):
    generate_changelog(GeneratorConfig(
        out_dir=str(tmp_path / "changes"), seed=66, n_conversations=60,
        n_segments=4, update_ratio=1.0, delete_ratio=0.15))
    cfg = _cfg(tmp_path, max_files_per_trigger=2, profile=True)
    recs = run_replay(spark, cfg)
    assert len(recs) >= 2
    assert all(r.column_nulls is not None for r in recs if not r.skipped_as_committed)

    # sum over batches == direct null counts among valid upsert rows
    raw = spark.read.schema(CHANGE_SCHEMA).parquet(f"{cfg.changes_dir}/*.parquet")
    ups = quarantine_split(raw)[0].filter(F.col("op") != "D")
    want = ups.agg(*[
        F.sum(F.col(c).isNull().cast("long")).alias(c)
        for c in ("role", "text", "tool", "ts")
    ]).first().asDict()
    want = {k: int(v or 0) for k, v in want.items()}
    got: dict[str, int] = {}
    for r in recs:
        for col, n in (r.column_nulls or {}).items():
            got[col] = got.get(col, 0) + n
    assert got == want
    assert got["tool"] > 0  # generator leaves tool NULL for non-tool turns

    # stats CLI rolls the same totals up from the lineage log
    from oec_etl_spark import cli, session

    monkeypatch.setattr(session, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    assert cli.main(["stats", "--target", cfg.target_dir, "--buckets", "4"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["column_nulls"] == got


def test_profile_off_by_default(spark, tmp_path):
    generate_changelog(GeneratorConfig(
        out_dir=str(tmp_path / "changes"), seed=67, n_conversations=20, n_segments=2))
    recs = run_replay(spark, _cfg(tmp_path))
    assert all(r.column_nulls is None for r in recs)
