"""Table-maintenance surface: the auto-compaction policy (merge-on-read
read-amplification bound) and crash-orphan cleanup (`remove_orphans`).

The reference has no table maintenance at all — its loads rewrite
ClickHouse tables wholesale per run — but an always-on CDC sink
accumulating O(batches) delta files needs both a bound on read
amplification and a way to reclaim writes that died before commit.
"""

from __future__ import annotations

import json
import os

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


def _assert_table_equal(a, b):
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a, b = a.select(*cols), b.select(*cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def _cfg(tmp, **kw):
    return EngineConfig(
        changes_dir=str(tmp / "changes"),
        target_dir=str(tmp / "target"),
        checkpoint_dir=str(tmp / "ckpt"),
        n_buckets=8,
        **kw,
    )


# ---------------------------------------------------- auto-compaction
def test_auto_compact_bounds_delta_count_and_matches_oracle(spark, tmp_path):
    """mor + compact_after_deltas=2: after EVERY batch commit, no bucket
    may hold >= 2 delta files (housekeeping compacts it inline), and the
    final table still byte-matches the batch oracle."""
    _gen(tmp_path, seed=41, n_conversations=60, n_segments=6, update_ratio=1.5)
    cfg = _cfg(tmp_path, max_files_per_trigger=1, table_mode="mor", compact_after_deltas=2)
    recs = run_replay(spark, cfg)
    assert len(recs) >= 4  # enough micro-batches to trip the policy
    assert any(r.compacted_buckets for r in recs)  # policy actually fired
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets, table_mode="mor")
    man = sink.load_manifest()
    assert all(len(dd) < 2 for dd in man["deltas"].values())
    _assert_table_equal(sink.read_table(), _oracle(spark, cfg.changes_dir))


def test_auto_compact_off_by_default(spark, tmp_path):
    _gen(tmp_path, seed=42, n_conversations=40, n_segments=6)
    cfg = _cfg(tmp_path, max_files_per_trigger=1, table_mode="mor")
    recs = run_replay(spark, cfg)
    assert not any(r.compacted_buckets for r in recs)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets, table_mode="mor")
    man = sink.load_manifest()
    assert any(len(dd) >= 2 for dd in man["deltas"].values())


def test_auto_compact_resume_stays_exactly_once(spark, tmp_path):
    """Compaction commits interleaved with merge commits must not break
    the epoch guard: killing the replay mid-way and resuming with the
    same checkpoint reaches the same final table."""
    _gen(tmp_path, seed=43, n_conversations=50, n_segments=6, duplicate_rate=0.2)
    cfg = _cfg(tmp_path, max_files_per_trigger=1, table_mode="mor", compact_after_deltas=2)
    with pytest.raises(Exception, match="injected failure"):
        run_replay(spark, cfg, fail_after_batches=2)
    recs = run_replay(spark, cfg)  # resume from checkpoint
    assert recs  # something was left to do
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets, table_mode="mor")
    _assert_table_equal(sink.read_table(), _oracle(spark, cfg.changes_dir))


# ------------------------------------------------------ orphan cleanup
def _seed_table(spark, tmp_path):
    _gen(tmp_path, seed=44, n_conversations=30, n_segments=2)
    cfg = _cfg(tmp_path, max_files_per_trigger=1)
    run_replay(spark, cfg)
    return ParquetSnapshotSink(spark, cfg.target_dir, 8)


def _plant_orphan(sink) -> str:
    """Simulate a writer that died between _write_store and _commit:
    a version-named data dir no manifest references."""
    head = sink.load_manifest()["version"]
    orphan = os.path.join(sink.root, "data", f"v{head + 1:06d}")
    os.makedirs(os.path.join(orphan, "__bucket=0"), exist_ok=True)
    with open(os.path.join(orphan, "__bucket=0", "part-00000.parquet"), "wb") as f:
        f.write(b"torn write")
    return orphan


def test_remove_orphans_reclaims_only_unreferenced_dirs(spark, tmp_path):
    sink = _seed_table(spark, tmp_path)
    before = sorted(map(tuple, sink.read_table().collect()))
    orphan = _plant_orphan(sink)
    deleted = sink.remove_orphans(older_than_s=0.0)
    assert deleted == [f"data/{os.path.basename(orphan)}"]
    assert not os.path.exists(orphan)
    # every committed snapshot still readable, bytes unchanged
    assert sorted(map(tuple, sink.read_table().collect())) == before
    for h in sink.history():
        sink.read_table(version=h["version"]).count()


def test_remove_orphans_respects_safety_horizon(spark, tmp_path):
    """A just-written dir may belong to an in-flight writer about to
    commit — the horizon must protect it."""
    sink = _seed_table(spark, tmp_path)
    orphan = _plant_orphan(sink)
    assert sink.remove_orphans(older_than_s=3600.0) == []
    assert os.path.exists(orphan)


def test_vacuum_cli_roundtrip(spark, tmp_path, monkeypatch, capsys):
    sink = _seed_table(spark, tmp_path)
    orphan = _plant_orphan(sink)
    from oec_etl_spark import cli, session

    monkeypatch.setattr(session, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    assert cli.main(["vacuum", "--target", sink.root, "--older-than-s", "0"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["deleted"] == [f"data/{os.path.basename(orphan)}"]
    assert not os.path.exists(orphan)


# ------------------------------------------- tombstone horizon expiry
def test_compact_tombstone_horizon_expiry(spark, tmp_path):
    """compact(tombstone_horizon=H) drops only tombstones with ts < H:
    live rows and newer/NULL-ts tombstones survive the rewrite, the
    visible table is unchanged, and a late event older than a KEPT
    tombstone still loses to it after compaction."""
    import datetime

    from oec_etl_spark.schemas import META_DELETED
    from pyspark.sql import functions as F, types as T

    t = lambda h, m=0: datetime.datetime(2024, 1, 1, h, m)
    sink = ParquetSnapshotSink(spark, str(tmp_path / "target"), 4, table_mode="mor")
    rows1 = [
        (1, "I", "c1", 0, "user", "a", None, t(0), "s", 0),
        (2, "I", "c2", 0, "user", "b", None, t(0), "s", 1),
        (3, "I", "c3", 0, "user", "c", None, t(0), "s", 2),
    ]
    rows2 = [
        (4, "D", "c1", 0, None, None, None, t(1), "s", 3),   # expired (< horizon)
        (5, "D", "c2", 0, None, None, None, t(3), "s", 4),   # kept (>= horizon)
        (6, "D", "c4", 0, None, None, None, None, "s", 5),   # kept (NULL ts)
    ]
    sink.merge(spark.createDataFrame(rows1, CHANGE_SCHEMA), batch_id=1)
    sink.merge(spark.createDataFrame(rows2, CHANGE_SCHEMA), batch_id=2)

    def tombstones():
        man = sink.load_manifest()
        schema = T.StructType.fromJson(man["schema"])
        cur = sink._read_current(man, schema).filter(F.col(META_DELETED))
        return {r["conv_id"] for r in cur.collect()}

    assert tombstones() == {"c1", "c2", "c4"}
    done = sink.compact(tombstone_horizon=t(2))
    assert done  # every bucket with rows was dirty (pure-delta mor table)
    # visible table unchanged; only the pre-horizon tombstone is gone
    assert {r["conv_id"] for r in sink.read_table().collect()} == {"c3"}
    assert tombstones() == {"c2", "c4"}
    # a kept tombstone still lose-protects: late update (ts < c2's delete)
    late = [(7, "U", "c2", 0, "user", "zombie", None, t(2, 30), "s", 6)]
    sink.merge(spark.createDataFrame(late, CHANGE_SCHEMA), batch_id=3)
    assert {r["conv_id"] for r in sink.read_table().collect()} == {"c3"}


def test_compact_tombstone_horizon_cli(spark, tmp_path, monkeypatch, capsys):
    """`compact --tombstone-horizon` parses the ISO timestamp and an
    all-future horizon clears every dated tombstone without changing
    the visible table."""
    from oec_etl_spark.schemas import META_DELETED
    from pyspark.sql import functions as F, types as T

    _gen(tmp_path, seed=50, n_conversations=40, n_segments=4, delete_ratio=0.3)
    cfg = _cfg(tmp_path, max_files_per_trigger=1, table_mode="mor")
    run_replay(spark, cfg)
    from oec_etl_spark import cli, session

    monkeypatch.setattr(session, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, 8, table_mode="mor")
    man = sink.load_manifest()
    schema = T.StructType.fromJson(man["schema"])
    assert sink._read_current(man, schema).filter(F.col(META_DELETED)).count() > 0
    assert cli.main(["compact", "--target", cfg.target_dir, "--buckets", "8",
                     "--tombstone-horizon", "2100-01-01T00:00:00"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["compacted_buckets"]
    man = sink.load_manifest()
    schema = T.StructType.fromJson(man["schema"])
    assert sink._read_current(man, schema).filter(
        F.col(META_DELETED) & F.col("ts").isNotNull()).count() == 0
    _assert_table_equal(sink.read_table(), _oracle(spark, cfg.changes_dir))


# ------------------------------------------------- minor compaction
def test_compact_minor_folds_deltas_without_touching_base(spark, tmp_path):
    """Minor compaction reduces each bucket's delta list to ONE file
    set, leaves every base dir byte-identical, and preserves the table
    exactly (tombstones included, LWW associativity)."""
    _gen(tmp_path, seed=51, n_conversations=50, n_segments=6,
         update_ratio=1.5, delete_ratio=0.2)
    cfg = _cfg(tmp_path, max_files_per_trigger=1, table_mode="mor")
    run_replay(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets, table_mode="mor")
    man = sink.load_manifest()
    assert any(len(dd) >= 2 for dd in man["deltas"].values())
    bases_before = dict(man["buckets"])
    base_files = {
        p: os.path.getmtime(p)
        for b in man["buckets"]
        for p in [os.path.join(sink.root, man["buckets"][b], f"__bucket={int(b)}")]
    }
    done = sink.compact_minor()
    assert done
    man2 = sink.load_manifest()
    assert man2["buckets"] == bases_before  # bases untouched in manifest…
    for p, mt in base_files.items():  # …and on disk
        assert os.path.getmtime(p) == mt
    assert all(len(dd) <= 1 for dd in man2["deltas"].values())
    _assert_table_equal(sink.read_table(), _oracle(spark, cfg.changes_dir))
    # old snapshots still readable (their delta dirs are retained)
    for h in sink.history():
        sink.read_table(version=h["version"]).count()
    # the folded table keeps operating: more merges + a major compact
    extra_dir = tmp_path / "extra"
    generate_changelog(GeneratorConfig(out_dir=str(extra_dir), seed=52,
                                       n_conversations=10, n_segments=1))
    extra = spark.read.schema(CHANGE_SCHEMA).parquet(f"{extra_dir}/*.parquet")
    sink.merge(extra, batch_id=8888)
    assert sink.compact()
    both = spark.read.schema(CHANGE_SCHEMA).parquet(
        f"{cfg.changes_dir}/*.parquet", f"{extra_dir}/*.parquet")
    valid, _ = quarantine_split(both)
    _assert_table_equal(sink.read_table(), materialize(valid))


def test_minor_compact_policy_in_stream(spark, tmp_path):
    """minor_compact_after=2: after every commit no bucket holds >= 2
    delta files (the loop folds them), base dirs written once at v1-era
    stay unrewritten, and the final table matches the oracle."""
    _gen(tmp_path, seed=54, n_conversations=50, n_segments=6, update_ratio=1.5)
    cfg = _cfg(tmp_path, max_files_per_trigger=1, table_mode="mor",
               minor_compact_after=2)
    recs = run_replay(spark, cfg)
    assert any(r.compacted_buckets for r in recs)  # policy fired
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets, table_mode="mor")
    man = sink.load_manifest()
    assert all(len(dd) < 2 for dd in man["deltas"].values())
    assert not man["buckets"]  # pure-delta table: no base was ever rewritten
    _assert_table_equal(sink.read_table(), _oracle(spark, cfg.changes_dir))


def test_minor_and_major_policies_mutually_exclusive(tmp_path):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not both"):
        _cfg(tmp_path, table_mode="mor", compact_after_deltas=2, minor_compact_after=2)


def test_compact_minor_respects_min_deltas_and_cli(spark, tmp_path, monkeypatch, capsys):
    _gen(tmp_path, seed=53, n_conversations=30, n_segments=4, update_ratio=1.0)
    cfg = _cfg(tmp_path, max_files_per_trigger=1, table_mode="mor")
    run_replay(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets, table_mode="mor")
    max_dd = max(len(dd) for dd in sink.load_manifest()["deltas"].values())
    assert sink.compact_minor(min_deltas=max_dd + 1) == []  # bar too high
    from oec_etl_spark import cli, session

    monkeypatch.setattr(session, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    assert cli.main(["compact", "--target", cfg.target_dir, "--buckets", "8",
                     "--minor"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["compacted_buckets"]
    assert all(len(dd) <= 1 for dd in sink.load_manifest()["deltas"].values())
    _assert_table_equal(sink.read_table(), _oracle(spark, cfg.changes_dir))


# ------------------------------------------- age-based snapshot expiry
def test_expire_age_floor_protects_young_snapshots(spark, tmp_path):
    """older_than_ts composes with keep_last: snapshots committed at or
    after the floor survive even beyond the count."""
    _gen(tmp_path, seed=55, n_conversations=30, n_segments=4)
    cfg = _cfg(tmp_path, max_files_per_trigger=1)
    run_replay(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    n = len(sink.history())
    assert n >= 3
    # floor before every commit → everything is young → nothing expires
    assert sink.expire_snapshots(keep_last=1, older_than_ts=0.0) == []
    assert len(sink.history()) == n
    # floor after every commit → falls back to pure keep_last
    import time as _time

    deleted = sink.expire_snapshots(keep_last=1, older_than_ts=_time.time() + 10)
    assert deleted
    assert len(sink.history()) == 1
    sink.read_table().count()  # head still reads


def test_stats_reports_seq_gaps(spark, tmp_path, monkeypatch, capsys):
    """A hole in the applied seq ranges (lost binlog events) surfaces in
    stats; a gapless replay reports none."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "changes"
    d.mkdir()

    def seg(name, seqs):
        rows = {
            "seq": pa.array(seqs, pa.int64()),
            "op": pa.array(["I"] * len(seqs), pa.string()),
            "conv_id": pa.array([f"c{s}" for s in seqs], pa.string()),
            "turn_idx": pa.array([0] * len(seqs), pa.int32()),
            "role": pa.array(["user"] * len(seqs), pa.string()),
            "text": pa.array(["t"] * len(seqs), pa.string()),
            "tool": pa.array([None] * len(seqs), pa.string()),
            "ts": pa.array([1000 * (s + 1) for s in seqs], pa.timestamp("us")),
            "source_file": pa.array([name] * len(seqs), pa.string()),
            "offset": pa.array(list(range(len(seqs))), pa.int64()),
        }
        pq.write_table(pa.table(rows), str(d / f"{name}.parquet"))

    seg("seg-00000", [0, 1, 2, 3])
    seg("seg-00001", [8, 9])  # seqs 4..7 never arrive
    cfg = _cfg(tmp_path, max_files_per_trigger=1)
    run_replay(spark, cfg)
    from oec_etl_spark import cli, session

    monkeypatch.setattr(session, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    assert cli.main(["stats", "--target", cfg.target_dir]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["seq_coverage"] == {"min": 0, "max": 9, "gaps": [[4, 7]]}


# ------------------------------------------------ rollback / AS OF ts
def test_rollback_restores_state_and_ingest_continues(spark, tmp_path):
    """Rollback is a metadata-only commit of the old snapshot's state:
    readers flip to the old files, the epoch guard resets with them,
    and new merges stack on top of the restored state."""
    _gen(tmp_path, seed=45, n_conversations=40, n_segments=6, update_ratio=1.0)
    cfg = _cfg(tmp_path, max_files_per_trigger=2)
    run_replay(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    head = sink.load_manifest()["version"]
    assert head >= 3
    good = head - 2  # pretend the last two batches were bad
    want = sorted(map(tuple, sink.read_table(version=good).collect()))
    new_head = sink.rollback(good)
    assert new_head == head + 1
    assert sorted(map(tuple, sink.read_table().collect())) == want
    # forensics: the bad snapshots remain readable in history
    assert sink.read_table(version=head).count() >= 0
    # epoch guard matches the restored snapshot, not the bad head
    assert sink.load_manifest()["committed_batches"] == \
        sink.load_manifest(good)["committed_batches"]
    # ingest continues on top of the restored state
    extra_dir = tmp_path / "extra"
    generate_changelog(GeneratorConfig(out_dir=str(extra_dir), seed=46,
                                       n_conversations=10, n_segments=1))
    extra = spark.read.schema(CHANGE_SCHEMA).parquet(f"{extra_dir}/*.parquet")
    sink.merge(extra, batch_id=9999)
    assert sink.load_manifest()["version"] == new_head + 1
    # the restored rows survive the new merge except where the extra
    # batch updated/deleted them (LWW on top of the restored state)
    assert sink.read_table().count() > 0


def test_rollback_preserves_tags(spark, tmp_path):
    _gen(tmp_path, seed=47, n_conversations=20, n_segments=2)
    cfg = _cfg(tmp_path, max_files_per_trigger=1)
    run_replay(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    sink.tag("audited", version=1)
    head = sink.load_manifest()["version"]
    sink.rollback(1)
    assert sink.tags() == {"audited": 1}
    assert sink.load_manifest()["version"] == head + 1


def test_version_as_of_timestamp(spark, tmp_path):
    _gen(tmp_path, seed=48, n_conversations=30, n_segments=4)
    cfg = _cfg(tmp_path, max_files_per_trigger=1)
    run_replay(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    mans = [sink.load_manifest(h["version"]) for h in sink.history()]
    assert len(mans) >= 3
    v2 = mans[1]
    # a timestamp between v2's and v3's commits resolves to v2
    mid = (float(v2["committed_at"]) + float(mans[2]["committed_at"])) / 2
    assert sink.version_as_of(mid) == v2["version"]
    # after everything → head; before everything → error
    assert sink.version_as_of(float(mans[-1]["committed_at"]) + 10) == mans[-1]["version"]
    with pytest.raises(LookupError):
        sink.version_as_of(float(mans[0]["committed_at"]) - 10)
    want = sorted(map(tuple, sink.read_table(version=v2["version"]).collect()))
    got = sorted(map(tuple, sink.read_table(version=sink.version_as_of(mid)).collect()))
    assert got == want


def test_rollback_cli(spark, tmp_path, monkeypatch, capsys):
    _gen(tmp_path, seed=49, n_conversations=20, n_segments=3)
    cfg = _cfg(tmp_path, max_files_per_trigger=1)
    run_replay(spark, cfg)
    from oec_etl_spark import cli, session

    monkeypatch.setattr(session, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, 8)
    want = sorted(map(tuple, sink.read_table(version=1).collect()))
    assert cli.main(["rollback", "--target", cfg.target_dir, "--to-version", "1"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["rolled_back_to"] == 1
    assert sorted(map(tuple, sink.read_table().collect())) == want


def test_schema_history_cli_shows_evolution_timeline(spark, tmp_path, monkeypatch, capsys):
    """schema-history prints one line per snapshot whose schema changed:
    the initial schema, then the widened/extended ones, never the
    unchanged commits in between."""
    from pyspark.sql import functions as F

    sink = _seed_table(spark, tmp_path)  # v1..v2 same schema
    # a batch carrying a brand-new payload column evolves the target
    extra = spark.createDataFrame(
        [(100, "I", "c_new", 0, "user", "hi", None, None, "s", 100, "gpt")],
        "seq long, op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp, source_file string, offset long, "
        "model string",
    )
    sink.merge(extra, batch_id=77)
    from oec_etl_spark import cli, session

    monkeypatch.setattr(session, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    assert cli.main(["schema-history", "--target", sink.root, "--buckets", "8"]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 2  # initial schema + the one evolution
    assert lines[0]["version"] == 1 and "text" in lines[0]["added"]
    assert lines[1]["added"] == ["model"] and lines[1]["retyped"] == {}
