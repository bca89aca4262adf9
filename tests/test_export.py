"""`export` CLI: a committed snapshot materialized as a plain parquet
dataset (the escape hatch for consumers that don't speak the manifest
format), with time travel via --version / --as-of and MOR deltas merged
on the way out."""

from __future__ import annotations

import json

import pytest

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.generate import GeneratorConfig, generate_changelog
from oec_etl_spark.streaming.engine import run_replay
from oec_etl_spark.streaming.sink import ParquetSnapshotSink


def _assert_same(a, b):
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a, b = a.select(*cols), b.select(*cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_export_head_version_and_as_of(spark, tmp_path, monkeypatch, capsys):
    generate_changelog(GeneratorConfig(
        out_dir=str(tmp_path / "changes"), seed=61, n_conversations=40,
        n_segments=4, update_ratio=1.0))
    cfg = EngineConfig(
        changes_dir=str(tmp_path / "changes"), target_dir=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "c"), n_buckets=4,
        max_files_per_trigger=2, table_mode="mor",
    )
    run_replay(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, 4, table_mode="mor")
    head_v = sink.load_manifest()["version"]
    assert head_v >= 2  # at least two committed versions for time travel

    from oec_etl_spark import cli, session

    monkeypatch.setattr(session, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)

    # head export (merges the mor deltas out)
    assert cli.main(["export", "--target", cfg.target_dir, "--buckets", "4",
                     "--dest", str(tmp_path / "out_head")]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["version"] == head_v
    exported = spark.read.parquet(str(tmp_path / "out_head"))
    _assert_same(exported, sink.read_table())
    assert out["rows"] == exported.count()

    # pinned old version
    assert cli.main(["export", "--target", cfg.target_dir, "--buckets", "4",
                     "--dest", str(tmp_path / "out_v1"), "--version", "1"]) == 0
    capsys.readouterr()
    _assert_same(spark.read.parquet(str(tmp_path / "out_v1")),
                 sink.read_table(version=1))

    # as-of the first commit's timestamp → same as version 1
    import datetime

    t1 = sink.load_manifest(version=1)["committed_at"]
    iso = datetime.datetime.fromtimestamp(t1).isoformat()
    assert cli.main(["export", "--target", cfg.target_dir, "--buckets", "4",
                     "--dest", str(tmp_path / "out_asof"), "--as-of", iso]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["version"] == 1
    _assert_same(spark.read.parquet(str(tmp_path / "out_asof")),
                 sink.read_table(version=1))

    # refuses to clobber an existing dataset
    with pytest.raises(Exception):
        cli.main(["export", "--target", cfg.target_dir, "--buckets", "4",
                  "--dest", str(tmp_path / "out_head")])


def test_export_since_uses_zonemap_scan(spark, tmp_path, monkeypatch, capsys):
    generate_changelog(GeneratorConfig(
        out_dir=str(tmp_path / "changes"), seed=62, n_conversations=30,
        n_segments=3, update_ratio=1.0))
    cfg = EngineConfig(
        changes_dir=str(tmp_path / "changes"), target_dir=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "c"), n_buckets=4,
    )
    run_replay(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, 4)
    from pyspark.sql import functions as F

    mid = sink.read_table().agg(
        F.expr("percentile(unix_micros(ts), 0.5)")).first()[0]
    import datetime

    horizon = datetime.datetime.fromtimestamp(
        mid / 1e6, tz=datetime.timezone.utc)
    iso = horizon.isoformat()

    from oec_etl_spark import cli, session

    monkeypatch.setattr(session, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    assert cli.main(["export", "--target", cfg.target_dir, "--buckets", "4",
                     "--dest", str(tmp_path / "out_since"), "--since", iso]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    exported = spark.read.parquet(str(tmp_path / "out_since"))
    _assert_same(exported, sink.read_table().filter(F.col("ts") >= F.lit(horizon)))
    assert out["rows"] == exported.count() > 0
