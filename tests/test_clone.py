"""Table clone / pipeline fork (Delta DEEP CLONE analog).

`ParquetSnapshotSink.clone(dest)` deep-copies a snapshot's referenced
data files + manifest into an independent root. The interesting claim
is the FORK: because the epoch guard (`committed_batches`) travels
with the manifest, a copy of the streaming checkpoint resumes the
source stream against the clone exactly-once — blue/green cutover or
a dev fork of a live pipeline without replaying from offset zero.
"""

from __future__ import annotations

import json
import shutil

import pytest

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.generate import GeneratorConfig, generate_changelog
from oec_etl_spark.operators.lww import materialize
from oec_etl_spark.schemas import CHANGE_SCHEMA
from oec_etl_spark.streaming.engine import quarantine_split, run_replay
from oec_etl_spark.streaming.sink import ParquetSnapshotSink


def _gen(tmp, **kw):
    return generate_changelog(GeneratorConfig(out_dir=str(tmp / "changes"), **kw))


def _oracle(spark, changes_dir):
    df = spark.read.schema(CHANGE_SCHEMA).parquet(f"{changes_dir}/*.parquet")
    valid, _ = quarantine_split(df)
    return materialize(valid)


def _rows(df):
    return sorted(map(tuple, df.select(*sorted(df.columns)).collect()))


def _cfg(tmp, target="target", ckpt="ckpt", **kw):
    return EngineConfig(
        changes_dir=str(tmp / "changes"),
        target_dir=str(tmp / target),
        checkpoint_dir=str(tmp / ckpt),
        n_buckets=8,
        **kw,
    )


def test_clone_fork_resumes_exactly_once(spark, tmp_path):
    """Kill a replay mid-way, clone the partial table + copy the
    checkpoint, resume against the CLONE: the clone reaches the oracle
    state while the source stays frozen at the crash point."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    _gen(tmp_path, seed=60, n_conversations=60, n_segments=6, duplicate_rate=0.2)
    cfg = _cfg(tmp_path, max_files_per_trigger=1)
    with pytest.raises(StreamingQueryException):
        run_replay(spark, cfg, fail_after_batches=3)
    src = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    frozen = _rows(src.read_table())
    src.clone(str(tmp_path / "fork"))
    shutil.copytree(cfg.checkpoint_dir, str(tmp_path / "ckpt_fork"))
    fork_cfg = _cfg(tmp_path, target="fork", ckpt="ckpt_fork",
                    max_files_per_trigger=1)
    recs = run_replay(spark, fork_cfg)
    assert recs  # the fork had remaining batches to apply
    fork = ParquetSnapshotSink(spark, fork_cfg.target_dir, cfg.n_buckets)
    assert _rows(fork.read_table()) == _rows(_oracle(spark, cfg.changes_dir))
    # the source never advanced
    assert _rows(src.read_table()) == frozen


def test_clone_preserves_mor_deltas_and_is_independent(spark, tmp_path):
    """MOR layout travels byte-for-byte (deltas still listed, merge-on-
    read still correct), and the clone survives the source being
    deleted outright."""
    _gen(tmp_path, seed=61, n_conversations=50, n_segments=5, delete_ratio=0.2)
    cfg = _cfg(tmp_path, max_files_per_trigger=1, table_mode="mor")
    run_replay(spark, cfg)
    src = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets, table_mode="mor")
    man = src.load_manifest()
    assert any(dd for dd in man["deltas"].values())  # genuinely MOR
    want = _rows(src.read_table())
    src.clone(str(tmp_path / "fork"))
    shutil.rmtree(cfg.target_dir)  # clone must not share files
    fork = ParquetSnapshotSink(spark, str(tmp_path / "fork"), cfg.n_buckets,
                               table_mode="mor")
    assert fork.load_manifest()["deltas"] == man["deltas"]
    assert _rows(fork.read_table()) == want
    # and it keeps operating: compaction on the clone stays correct
    assert fork.compact()
    assert _rows(fork.read_table()) == want


def test_clone_at_older_version_and_overwrite_refusal(spark, tmp_path):
    _gen(tmp_path, seed=62, n_conversations=30, n_segments=4)
    cfg = _cfg(tmp_path, max_files_per_trigger=1)
    run_replay(spark, cfg)
    src = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    assert src.load_manifest()["version"] >= 2
    v = src.clone(str(tmp_path / "fork"), version=1)
    assert v == 1
    fork = ParquetSnapshotSink(spark, str(tmp_path / "fork"), cfg.n_buckets)
    assert _rows(fork.read_table()) == _rows(src.read_table(version=1))
    with pytest.raises(ValueError, match="refusing to overwrite"):
        src.clone(str(tmp_path / "fork"))


def test_clone_cli(spark, tmp_path, monkeypatch, capsys):
    _gen(tmp_path, seed=63, n_conversations=20, n_segments=2)
    cfg = _cfg(tmp_path, max_files_per_trigger=1)
    run_replay(spark, cfg)
    from oec_etl_spark import cli, session

    monkeypatch.setattr(session, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    dest = str(tmp_path / "fork")
    assert cli.main(["clone", "--target", cfg.target_dir, "--dest", dest,
                     "--buckets", "8"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    src = ParquetSnapshotSink(spark, cfg.target_dir, 8)
    assert out["cloned_version"] == src.load_manifest()["version"]
    fork = ParquetSnapshotSink(spark, dest, 8)
    assert _rows(fork.read_table()) == _rows(src.read_table())
