"""Metadata tables (Iceberg `files` / `snapshots` analogs) and the
z-ordered export path.

files_df/snapshots_df are assembled metadata-only (manifest + zone-map
sidecars + listing); the tests pin that their contents agree with what
the data files actually hold, and that the CLI surfaces both.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.generate import GeneratorConfig, generate_changelog
from oec_etl_spark.streaming.engine import replay_batch
from oec_etl_spark.streaming.sink import ParquetSnapshotSink


def _setup(spark, tmp_path, **cfg_kw):
    generate_changelog(
        GeneratorConfig(
            out_dir=str(tmp_path / "changes"),
            n_conversations=50,
            max_turns=5,
            n_segments=2,
            seed=31,
        )
    )
    cfg = EngineConfig(
        changes_dir=str(tmp_path / "changes"),
        target_dir=str(tmp_path / "target"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_buckets=4,
        **cfg_kw,
    )
    replay_batch(spark, cfg)
    return ParquetSnapshotSink(
        spark, cfg.target_dir, 4,
        table_mode=cfg.table_mode,
        key_bloom_bits=cfg.key_bloom_bits,
    )


def test_files_df_agrees_with_data(spark, tmp_path):
    sink = _setup(spark, tmp_path, key_bloom_bits=2048)
    fdf = sink.files_df()
    rows = fdf.collect()
    assert rows, "files_df returned no files"
    # every live file accounted for: sidecar row counts sum to the
    # physical row count of the base layout
    assert (
        fdf.agg(F.sum("rows")).first()[0]
        == sum(
            spark.read.parquet(str(tmp_path / "target" / r["file"])).count()
            for r in rows
        )
    )
    # cow layout: everything is base, all files have stats + blooms
    assert {r["kind"] for r in rows} == {"base"}
    assert all(r["has_bloom"] for r in rows)
    assert all(r["size_bytes"] > 0 for r in rows)
    assert {r["bucket"] for r in rows} <= set(range(4))


def test_files_df_shows_mor_deltas(spark, tmp_path):
    sink = _setup(spark, tmp_path, table_mode="mor")
    kinds = {r["kind"] for r in sink.files_df().collect()}
    assert "delta" in kinds
    sink.compact()
    kinds_after = {r["kind"] for r in sink.files_df().collect()}
    assert kinds_after == {"base"}


def test_snapshots_df_matches_history(spark, tmp_path):
    sink = _setup(spark, tmp_path)
    snaps = sink.snapshots_df().orderBy("version").collect()
    hist = sink.history()
    assert [r["version"] for r in snaps] == [h["version"] for h in hist]
    assert snaps[-1]["rows_applied"] == hist[-1]["rows_applied"]


def test_files_cli(spark, tmp_path, monkeypatch, capsys):
    _setup(spark, tmp_path)
    from oec_etl_spark import cli, session

    monkeypatch.setattr(session, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    assert cli.main(["files", "--target", str(tmp_path / "target")]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert lines and all("file" in x and "bucket" in x for x in lines)


def test_export_zorder_cli(spark, tmp_path, monkeypatch, capsys):
    sink = _setup(spark, tmp_path)
    from oec_etl_spark import cli, session

    monkeypatch.setattr(session, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    dest = str(tmp_path / "export_z")
    assert cli.main([
        "export", "--target", str(tmp_path / "target"), "--dest", dest,
        "--zorder", "unix_micros(ts),turn_idx", "--zorder-files", "4",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    got = spark.read.parquet(dest)
    want = sink.read_table()
    assert out["rows"] == want.count() == got.count()
    # same logical content, clustered layout
    cols = sorted(want.columns)
    assert got.select(*cols).exceptAll(want.select(*cols)).count() == 0
