"""Source-lag probe (`streaming/lag.py`, CLI `lag`): backlog of the
watched change-log dir vs the streaming checkpoint, from metadata only.

The load-bearing semantic: Structured Streaming writes the file-source
offsets log when a batch is PLANNED, before foreachBatch runs — so a
mid-batch crash leaves the failed batch's files in ``sources/0`` with
no matching ``commits`` entry. Those files reprocess on resume and must
count as pending; keying on the commit log (not the source log alone)
is what makes the gauge honest right after a crash.
"""

from __future__ import annotations

import json
import subprocess
import sys

import pytest

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.generate import GeneratorConfig, generate_changelog
from oec_etl_spark.streaming.engine import run_replay
from oec_etl_spark.streaming.lag import source_lag


def _cfg(tmp, **kw):
    return EngineConfig(
        changes_dir=str(tmp / "changes"),
        target_dir=str(tmp / "target"),
        checkpoint_dir=str(tmp / "ckpt"),
        n_buckets=4,
        **kw,
    )


def test_lag_fresh_checkpoint_reports_everything_pending(spark, tmp_path):
    stats = generate_changelog(GeneratorConfig(
        out_dir=str(tmp_path / "changes"), seed=81, n_conversations=50, n_segments=5))
    lag = source_lag(_cfg(tmp_path))
    assert lag["last_committed_batch"] == -1
    assert lag["files_on_disk"] == 5 and lag["files_pending"] == 5
    assert lag["files_committed"] == 0
    assert lag["pending_events"] == stats["events_written"]
    assert lag["bytes_pending"] > 0


def test_lag_counts_crashed_batch_as_pending_and_drains_on_resume(spark, tmp_path):
    generate_changelog(GeneratorConfig(
        out_dir=str(tmp_path / "changes"), seed=82, n_conversations=60, n_segments=6))
    cfg = _cfg(tmp_path, max_files_per_trigger=2)
    with pytest.raises(Exception):
        run_replay(spark, cfg, fail_after_batches=1)
    lag = source_lag(cfg)
    # batch 0 (2 files) committed; batch 1 may already sit in the
    # source log but crashed before commit -> still pending
    assert lag["last_committed_batch"] == 0
    assert lag["files_committed"] == 2
    assert lag["files_pending"] == 4
    assert lag["pending_events"] > 0

    run_replay(spark, cfg)  # resume from the same checkpoint
    drained = source_lag(cfg)
    assert drained["files_pending"] == 0
    assert drained["pending_events"] == 0
    assert drained["files_committed"] == 6
    assert drained["pending_files"] == []


def test_lag_sees_new_segments_after_full_drain(spark, tmp_path):
    generate_changelog(GeneratorConfig(
        out_dir=str(tmp_path / "changes"), seed=83, n_conversations=40, n_segments=3))
    cfg = _cfg(tmp_path)
    run_replay(spark, cfg)
    assert source_lag(cfg)["files_pending"] == 0
    # drop two new segment files into the watched dir (tail semantics)
    generate_changelog(GeneratorConfig(
        out_dir=str(tmp_path / "more"), seed=84, n_conversations=20, n_segments=2))
    for f in (tmp_path / "more").glob("*.parquet"):
        f.rename(tmp_path / "changes" / f"late-{f.name}")
    lag = source_lag(cfg)
    assert lag["files_pending"] == 2 and lag["files_committed"] == 3
    assert all(n.startswith("late-") for n in lag["pending_files"])


def test_lag_cli_runs_without_spark(tmp_path):
    """The CLI path must answer from metadata alone — fast enough that
    a JVM would dominate; we assert it works and never starts one by
    running it with a poisoned JAVA_HOME."""
    import os

    generate_changelog(GeneratorConfig(
        out_dir=str(tmp_path / "changes"), seed=85, n_conversations=10, n_segments=2))
    env = os.environ | {"JAVA_HOME": "/nonexistent"}
    out = subprocess.run(
        [sys.executable, "-m", "oec_etl_spark.cli", "lag",
         "--changes", str(tmp_path / "changes"),
         "--checkpoint", str(tmp_path / "ckpt")],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lag = json.loads(out.stdout)
    assert lag["files_pending"] == 2 and lag["last_committed_batch"] == -1


def test_archive_moves_only_committed_resume_unaffected(spark, tmp_path):
    """Archive after a mid-replay crash: only the committed batch's
    segments move; the crashed batch's (planned-but-uncommitted) files
    stay; resuming the same checkpoint drains the remainder and the
    final table equals the full-log oracle."""
    from oec_etl_spark.operators.lww import materialize
    from oec_etl_spark.schemas import CHANGE_SCHEMA
    from oec_etl_spark.streaming.engine import quarantine_split
    from oec_etl_spark.streaming.lag import archive_committed
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    generate_changelog(GeneratorConfig(
        out_dir=str(tmp_path / "changes"), seed=86, n_conversations=60, n_segments=6))
    cfg = _cfg(tmp_path, max_files_per_trigger=2)
    with pytest.raises(Exception):
        run_replay(spark, cfg, fail_after_batches=1)

    dest = str(tmp_path / "archive")
    res = archive_committed(cfg, dest)
    assert res["archived"] == 2 and res["kept"] == 4
    assert source_lag(cfg)["files_pending"] == 4

    run_replay(spark, cfg)  # resume: moved files never re-list
    assert source_lag(cfg)["files_pending"] == 0

    # final state == oracle over the FULL log (archived + remaining)
    full = spark.read.schema(CHANGE_SCHEMA).parquet(
        f"{dest}/*.parquet", f"{cfg.changes_dir}/*.parquet")
    oracle = materialize(quarantine_split(full)[0])
    table = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets).read_table()
    cols = sorted(table.columns)
    assert sorted(oracle.columns) == cols
    t, o = table.select(*cols), oracle.select(*cols)
    assert t.exceptAll(o).count() == 0 and o.exceptAll(t).count() == 0

    # drains the rest once committed; then idempotent
    res2 = archive_committed(cfg, dest)
    assert res2["archived"] == 4 and res2["kept"] == 0
    assert archive_committed(cfg, dest)["archived"] == 0


def test_archive_age_guard_and_delete(spark, tmp_path):
    from oec_etl_spark.streaming.lag import archive_committed

    generate_changelog(GeneratorConfig(
        out_dir=str(tmp_path / "changes"), seed=87, n_conversations=20, n_segments=3))
    cfg = _cfg(tmp_path)
    run_replay(spark, cfg)
    # fresh files + 1h age guard: nothing qualifies
    assert archive_committed(cfg, str(tmp_path / "a"), older_than_s=3600)["archived"] == 0
    # delete mode (dest=None) removes them
    res = archive_committed(cfg, None)
    assert res["archived"] == 3 and res["dest"] is None
    assert list((tmp_path / "changes").glob("*.parquet")) == []


def test_archive_cli_requires_explicit_destruction_choice(tmp_path):
    import os

    generate_changelog(GeneratorConfig(
        out_dir=str(tmp_path / "changes"), seed=88, n_conversations=10, n_segments=2))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = [sys.executable, "-m", "oec_etl_spark.cli", "archive",
            "--changes", str(tmp_path / "changes"),
            "--checkpoint", str(tmp_path / "ckpt")]
    out = subprocess.run(base, capture_output=True, text=True, cwd=repo)
    assert out.returncode != 0 and "--dest" in out.stderr  # neither flag given
    out = subprocess.run(base + ["--dest", str(tmp_path / "a")],
                         capture_output=True, text=True, cwd=repo,
                         env=os.environ | {"JAVA_HOME": "/nonexistent"})
    assert out.returncode == 0, out.stderr[-1500:]
    assert json.loads(out.stdout) == {
        "archived": 0, "kept": 2, "dest": str(tmp_path / "a"), "archived_files": [],
    }


def test_inloop_archive_policy_drains_committed_segments(spark, tmp_path):
    """`EngineConfig.archive_dir`: binlog retention as a streaming-loop
    policy. During batch N the commit log reaches N-1, so by end of an
    S-batch replay the first S-1 batches' segments have moved and the
    final batch's remain (the standalone `archive` CLI drains the
    tail). The table still equals the oracle over archive ∪ watched."""
    from oec_etl_spark.operators.lww import materialize
    from oec_etl_spark.schemas import CHANGE_SCHEMA
    from oec_etl_spark.streaming.engine import quarantine_split
    from oec_etl_spark.streaming.lag import archive_committed
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    generate_changelog(GeneratorConfig(
        out_dir=str(tmp_path / "changes"), seed=89, n_conversations=50, n_segments=5))
    dest = str(tmp_path / "archive")
    cfg = _cfg(tmp_path, max_files_per_trigger=1, archive_dir=dest)
    recs = run_replay(spark, cfg)
    assert len(recs) == 5
    import os

    left = sorted(os.listdir(tmp_path / "changes"))
    gone = sorted(os.listdir(dest))
    assert len(gone) == 4 and len([f for f in left if f.endswith(".parquet")]) == 1
    assert source_lag(cfg)["files_pending"] == 0  # moved files were committed

    full = spark.read.schema(CHANGE_SCHEMA).parquet(
        f"{dest}/*.parquet", f"{cfg.changes_dir}/*.parquet")
    oracle = materialize(quarantine_split(full)[0])
    table = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets).read_table()
    cols = sorted(table.columns)
    t, o = table.select(*cols), oracle.select(*cols)
    assert t.exceptAll(o).count() == 0 and o.exceptAll(t).count() == 0

    # the standalone archiver drains the final batch's segment
    assert archive_committed(cfg, dest)["archived"] == 1
