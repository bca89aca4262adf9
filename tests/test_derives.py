"""Pre-merge declarative transforms (`EngineConfig.derives` / CLI
`--derive NAME=SQL`): the reference's chained per-column pandas steps
(/root/reference/etl/trade_comtrade_monthly_pipeline.py transform
section) re-expressed as one narrow codegen'd projection applied to
VALID change rows between the quarantine/constraint pass and the merge.
Recodes overwrite payload columns; new names flow into the table via
normal merge-side schema evolution; keys/order/envelope are protected.
"""

from __future__ import annotations

import json

import pytest

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.generate import GeneratorConfig, generate_changelog
from oec_etl_spark.operators.lww import materialize
from oec_etl_spark.schemas import CHANGE_SCHEMA
from oec_etl_spark.streaming.engine import apply_derives, quarantine_split, run_replay
from oec_etl_spark.streaming.sink import ParquetSnapshotSink


def _cfg(tmp, **kw):
    return EngineConfig(
        changes_dir=str(tmp / "changes"),
        target_dir=str(tmp / "target"),
        checkpoint_dir=str(tmp / "ckpt"),
        n_buckets=4,
        **kw,
    )


DERIVES = {
    "text": "upper(text)",                      # recode in place
    "n_chars": "length(text)",                  # new column (evolution)
    "n_chars_plus": "n_chars + 1",              # chained: reads a derived col
}


def test_derived_replay_matches_transformed_oracle(spark, tmp_path):
    """Streaming replay with derives == batch oracle with the SAME
    transform applied independently before materialization — including
    deletes (a derived tombstone still deletes)."""
    generate_changelog(GeneratorConfig(
        out_dir=str(tmp_path / "changes"), seed=91, n_conversations=80,
        n_segments=4, update_ratio=1.0, delete_ratio=0.1))
    cfg = _cfg(tmp_path, max_files_per_trigger=2, derives=DERIVES)
    run_replay(spark, cfg)

    raw = spark.read.schema(CHANGE_SCHEMA).parquet(f"{cfg.changes_dir}/*.parquet")
    oracle = materialize(apply_derives(quarantine_split(raw)[0], DERIVES))
    table = ParquetSnapshotSink(spark, cfg.target_dir, 4).read_table()
    assert {"n_chars", "n_chars_plus"} <= set(table.columns)
    cols = sorted(table.columns)
    assert sorted(oracle.columns) == cols
    t, o = table.select(*cols), oracle.select(*cols)
    assert t.exceptAll(o).count() == 0 and o.exceptAll(t).count() == 0
    # the recode really happened
    row = table.filter("text IS NOT NULL").first()
    assert row["text"] == row["text"].upper()
    assert row["n_chars_plus"] == row["n_chars"] + 1


def test_derives_protect_keys_order_and_envelope(spark, tmp_path):
    generate_changelog(GeneratorConfig(
        out_dir=str(tmp_path / "changes"), seed=92, n_conversations=10, n_segments=2))
    for bad in ("conv_id", "turn_idx", "ts", "op", "seq", "__bucket"):
        cfg = _cfg(tmp_path, derives={bad: "1"})
        with pytest.raises(Exception, match="protected"):
            run_replay(spark, cfg)


def test_derive_cli_and_pipeline_spec(spark, tmp_path, monkeypatch, capsys):
    generate_changelog(GeneratorConfig(
        out_dir=str(tmp_path / "changes"), seed=93, n_conversations=30, n_segments=2))
    from oec_etl_spark import cli, session

    monkeypatch.setattr(session, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    assert cli.main([
        "replay", "--changes", str(tmp_path / "changes"),
        "--target", str(tmp_path / "t1"), "--checkpoint", str(tmp_path / "c1"),
        "--buckets", "4", "--derive", "role=upper(role)",
        "--derive", "src=concat(role, ':', coalesce(tool, '-'))",
    ]) == 0
    capsys.readouterr()
    t1 = ParquetSnapshotSink(spark, str(tmp_path / "t1"), 4).read_table()
    assert "src" in t1.columns
    r = t1.first()
    assert r["role"] == r["role"].upper()

    # same job as a pipeline spec
    spec = tmp_path / "job.yaml"
    spec.write_text(
        "mode: replay\n"
        f"changes: {tmp_path / 'changes'}\n"
        "target: t2\n"
        "checkpoint: c2\n"
        "buckets: 4\n"
        "derives:\n"
        "  role: upper(role)\n"
        "  src: \"concat(role, ':', coalesce(tool, '-'))\"\n"
    )
    assert cli.main(["run", "--pipeline", str(spec)]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["rows_applied"] > 0
    t2 = ParquetSnapshotSink(spark, str(tmp_path / "t2"), 4).read_table()
    cols = sorted(t1.columns)
    assert sorted(t2.columns) == cols
    a, b = t1.select(*cols), t2.select(*cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
