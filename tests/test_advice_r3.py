"""Round-3 advisory regression tests.

Three failure modes reported by the round-2 review, each pinned here so
it stays fixed:

1. `_record_key_blooms` crashed the commit when a merge produced an
   empty version dir (only _SUCCESS): ``spark.read.parquet`` raises
   UNABLE_TO_INFER_SCHEMA. Reachable with key_bloom_bits whenever every
   row of a batch falls at/under the truncate/TTL horizon — and because
   the streaming checkpoint replays the same batch on restart, the
   pipeline wedged in a deterministic crash loop. TTL + blooms is the
   advertised production combo, so this is the highest-value repro.
2. The in-loop TTL advance round-tripped the µs horizon through float
   seconds; at current epoch magnitudes (~1.7e15 µs) the double can
   shift the stored horizon ±1µs vs the integer-µs zone-map arithmetic
   used everywhere else. `truncate_before` now takes integer µs
   end-to-end and must store EXACTLY that value.
3. `fsck()` — the read-only doctor — raised instead of reporting when
   the CURRENT pointer itself held corrupt JSON.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

import pytest
from pyspark.sql import types as T

from oec_etl_spark.schemas import CHANGE_SCHEMA
from oec_etl_spark.streaming.engine import quarantine_split
from oec_etl_spark.streaming.sink import ParquetSnapshotSink

NSCHEMA = T.StructType(
    [T.StructField(f.name, f.dataType, True) for f in CHANGE_SCHEMA.fields]
)


def _ts(h, m=0, us=0):
    return datetime(2024, 1, 1 + h // 24, h % 24, m, 0, us, tzinfo=timezone.utc)


def _ev(conv, turn, seq, ts, op="U", role="user", text="orig", tool=None):
    return {
        "seq": seq, "op": op, "conv_id": conv, "turn_idx": turn,
        "role": role, "text": text, "tool": tool, "ts": ts,
        "source_file": "s", "offset": seq,
    }


def _merge(spark, sink, rows, batch_id):
    valid, _ = quarantine_split(spark.createDataFrame(rows, NSCHEMA))
    return sink.merge(valid, batch_id=batch_id)


def _state(sink):
    return {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in sink.read_table().collect()
    }


# ------------------------------------------------- 1. empty write + blooms

@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_all_rows_under_horizon_with_blooms_does_not_crash(spark, tmp_path, mode):
    """A batch whose every row dies at the truncate horizon used to
    leave an empty version dir and crash `_record_key_blooms` — with a
    checkpoint that replays the batch, a permanent crash loop."""
    sink = ParquetSnapshotSink(
        spark, str(tmp_path / "t"), n_buckets=2, table_mode=mode,
        key_bloom_bits=1024,
    )
    _merge(spark, sink, [_ev("live", 0, 1, _ts(9), text="keep")], 0)
    sink.truncate_before(_ts(5))
    before = _state(sink)
    # entire batch at/under the horizon → merge writes nothing
    rec = _merge(spark, sink, [
        _ev("dead-a", 0, 2, _ts(1)),
        _ev("dead-b", 0, 3, _ts(4, 59)),
    ], 1)
    assert rec is not None  # the commit completed instead of raising
    assert _state(sink) == before
    rep = sink.fsck()
    assert rep["ok"], rep["issues"]
    # and the batch is recorded as committed (no replay loop)
    assert 1 in sink.load_manifest()["committed_batches"]


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_empty_write_then_live_batch_blooms_still_work(spark, tmp_path, mode):
    """After an empty write the next live batch must still get bloom
    sidecars and lookups must stay oracle-equal."""
    sink = ParquetSnapshotSink(
        spark, str(tmp_path / "t"), n_buckets=2, table_mode=mode,
        key_bloom_bits=1024,
    )
    _merge(spark, sink, [_ev("a", 0, 1, _ts(9), text="v1")], 0)
    sink.truncate_before(_ts(5))
    _merge(spark, sink, [_ev("gone", 0, 2, _ts(1))], 1)  # empty write
    _merge(spark, sink, [_ev("b", 0, 3, _ts(10), text="v2")], 2)
    assert _state(sink) == {("a", 0): "v1", ("b", 0): "v2"}
    got = {(r["turn_idx"], r["text"]) for r in sink.lookup("b").collect()}
    assert got == {(0, "v2")}


# ------------------------------------------------- 2. integer-µs horizon

def test_truncate_before_integer_us_is_exact(spark, tmp_path):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=2)
    hz_dt = _ts(5, us=123457)  # odd µs — the value a float round-trip bends
    hz_us = int(hz_dt.timestamp()) * 1_000_000 + hz_dt.microsecond
    _merge(spark, sink, [
        _ev("at-horizon", 0, 1, hz_dt),                  # ts == horizon → dead
        _ev("just-after", 0, 2, _ts(5, us=123458)),      # +1µs → alive
    ], 0)
    sink.truncate_before(hz_us)
    man = sink.load_manifest()
    assert int(man["truncate_ts_us"]) == hz_us  # stored EXACTLY, no float drift
    assert _state(sink) == {("just-after", 0): "orig"}


def test_ttl_engine_horizon_is_exact_us(spark, tmp_path):
    """The in-loop TTL path must store (max event µs) - ttl·10⁶ exactly."""
    from pyspark.sql import functions as F

    from oec_etl_spark.config import EngineConfig
    from oec_etl_spark.generate import GeneratorConfig, generate_changelog
    from oec_etl_spark.streaming.engine import run_replay

    generate_changelog(GeneratorConfig(
        out_dir=str(tmp_path / "changes"), seed=73,
        n_conversations=40, n_segments=4,
    ))
    cfg = EngineConfig(
        changes_dir=str(tmp_path / "changes"),
        target_dir=str(tmp_path / "target"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_buckets=2, max_files_per_trigger=2, ttl_seconds=3600.0,
    )
    run_replay(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, 2)
    hz = int(sink.load_manifest()["truncate_ts_us"])
    valid, _ = quarantine_split(
        spark.read.schema(CHANGE_SCHEMA).parquet(str(tmp_path / "changes") + "/*.parquet")
    )
    max_us = valid.agg(F.max(F.unix_micros("ts"))).first()[0]
    assert hz == max_us - 3600 * 1_000_000  # integer arithmetic, no ±1µs


# ------------------------------------------------- 3. fsck corrupt CURRENT

def test_fsck_reports_corrupt_current_pointer(spark, tmp_path):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=2)
    _merge(spark, sink, [_ev("a", 0, 1, _ts(1))], 0)
    ptr = str(tmp_path / "t" / "CURRENT")
    with open(ptr, "w") as f:
        f.write("{not json")
    rep = sink.fsck()  # must report, never raise
    assert rep["ok"] is False
    assert any("CURRENT" in i for i in rep["issues"])
    assert rep["head_version"] is None
    # the rest of the report still ran (manifests were scanned)
    assert rep["retained_versions"] >= 1


def test_cli_verify_is_horizon_aware(spark, tmp_path, monkeypatch, capsys):
    """`cli verify` on a TTL'd/truncated table must gate its oracle at
    the committed horizon — a healthy table is not a diff."""
    from oec_etl_spark import session
    from oec_etl_spark.cli import main

    monkeypatch.setattr(session, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    import os
    import shutil

    changes = tmp_path / "changes"
    changes.mkdir()
    rows = [_ev("old", 0, 1, _ts(1), op="I", text="dead"),
            _ev("new", 0, 2, _ts(9), op="I", text="alive")]
    tmp_dir = str(changes / "seg.tmp")
    spark.createDataFrame(rows, NSCHEMA).coalesce(1).write.parquet(tmp_dir)
    part = next(p for p in os.listdir(tmp_dir) if p.endswith(".parquet"))
    os.replace(os.path.join(tmp_dir, part), str(changes / "seg-0.parquet"))
    shutil.rmtree(tmp_dir)
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=2)
    _merge(spark, sink, rows, 0)
    sink.truncate_before(_ts(5))
    assert _state(sink) == {("new", 0): "alive"}
    rc = main(["verify", "--changes", str(changes), "--target",
               str(tmp_path / "t"), "--buckets", "2"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["diff_rows"] == 0 and out["oracle_rows"] == 1


def test_fsck_reports_current_missing_version_key(spark, tmp_path):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=2)
    _merge(spark, sink, [_ev("a", 0, 1, _ts(1))], 0)
    with open(str(tmp_path / "t" / "CURRENT"), "w") as f:
        json.dump({"wrong_key": 3}, f)
    rep = sink.fsck()
    assert rep["ok"] is False
    assert any("CURRENT" in i for i in rep["issues"])
