"""Snapshot-read bootstrap (op 'R') and table truncate (op 'T') —
the remaining two Debezium envelope ops (r = snapshot read, t =
truncate; reference ingest re-loads whole tables per run, e.g.
/root/reference/etl/trade_comtrade_monthly_pipeline.py:120-135 — the
CDC replacement needs an explicit bootstrap + truncate story instead).

R semantics: a snapshot read fills gaps — it creates a key nothing
else defines and NEVER overwrites streamed or stored data, whatever
its ts says (rank-0 LWW position). T semantics: an O(1) metadata
commit — every row with ts <= horizon is dead (stored or late-arriving),
NULL-ts rows retained, space physically reclaimed at the next
compaction.
"""

from __future__ import annotations

import random
from datetime import datetime, timezone

import pytest
from pyspark.sql import types as T

from oec_etl_spark.schemas import CHANGE_SCHEMA
from oec_etl_spark.streaming.engine import quarantine_split
from oec_etl_spark.streaming.sink import ParquetSnapshotSink

# T rows carry NULL keys (table-wide); the wire schema marks keys
# non-null for data rows, so tests build rows against a nullable clone
# (the file-based read path is nullability-tolerant anyway)
NSCHEMA = T.StructType([T.StructField(f.name, f.dataType, True) for f in CHANGE_SCHEMA.fields])


def _ts(h, m=0):
    return datetime(2024, 1, 1 + h // 24, h % 24, m, tzinfo=timezone.utc)


def _ev(conv, turn, seq, ts, op="U", role="user", text="orig", tool=None):
    return {
        "seq": seq, "op": op, "conv_id": conv, "turn_idx": turn,
        "role": role, "text": text, "tool": tool, "ts": ts,
        "source_file": "s", "offset": seq,
    }


def _trunc(seq, ts):
    return _ev(None, None, seq, ts, op="T", role=None, text=None, tool=None)


def _merge(spark, sink, rows, batch_id):
    valid, _ = quarantine_split(spark.createDataFrame(rows, NSCHEMA))
    return sink.merge(valid, batch_id=batch_id)


def _state(sink):
    return {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"])
        for r in sink.read_table().collect()
    }


# --------------------------------------------------------------- op 'R'

@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_snapshot_bootstrap_creates_rows(spark, tmp_path, mode):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=4, table_mode=mode)
    rec = _merge(spark, sink, [
        _ev("a", 0, 1, _ts(1), op="R", text="snapA"),
        _ev("b", 0, 2, _ts(1), op="R", text="snapB"),
    ], 0)
    assert rec.rows_snapshot == 2 and rec.rows_snapshot_applied == 2
    assert _state(sink) == {("a", 0): ("user", "snapA", None),
                            ("b", 0): ("user", "snapB", None)}


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_snapshot_never_overwrites_even_with_newer_ts(spark, tmp_path, mode):
    """The core Debezium incremental-snapshot rule: a re-snapshot read
    racing an already-applied streamed row loses, however its ts
    compares — only genuinely-absent keys are filled in."""
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=4, table_mode=mode)
    _merge(spark, sink, [_ev("a", 0, 1, _ts(2), text="stream")], 0)
    rec = _merge(spark, sink, [
        _ev("a", 0, 2, _ts(9), op="R", text="stale-read"),
        _ev("c", 0, 3, _ts(9), op="R", text="new-read"),
    ], 1)
    st = _state(sink)
    assert st[("a", 0)][1] == "stream" and st[("c", 0)][1] == "new-read"
    assert rec.rows_snapshot == 2 and rec.rows_snapshot_applied == 1


def test_snapshot_loses_to_older_streamed_row_in_same_batch(spark, tmp_path):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=2)
    _merge(spark, sink, [
        _ev("a", 0, 1, _ts(5), op="R", text="read"),
        _ev("a", 0, 2, _ts(1), op="I", text="older-stream"),
    ], 0)
    assert _state(sink)[("a", 0)][1] == "older-stream"


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_snapshot_does_not_resurrect_deleted_key(spark, tmp_path, mode):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=4, table_mode=mode)
    _merge(spark, sink, [_ev("a", 0, 1, _ts(1))], 0)
    _merge(spark, sink, [_ev("a", 0, 2, _ts(2), op="D", role=None, text=None)], 1)
    rec = _merge(spark, sink, [_ev("a", 0, 3, _ts(9), op="R", text="zombie")], 2)
    assert ("a", 0) not in _state(sink)
    assert rec.rows_snapshot_applied == 0


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_snapshot_redelivery_is_noop_metadata_commit(spark, tmp_path, mode):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=4, table_mode=mode)
    reads = [_ev("a", 0, 1, _ts(1), op="R", text="x"),
             _ev("b", 0, 2, _ts(1), op="R", text="y")]
    _merge(spark, sink, reads, 0)
    before, v = _state(sink), sink.load_manifest()["version"]
    rec = _merge(spark, sink, reads, 1)  # at-least-once redelivery
    assert _state(sink) == before
    assert rec.rows_snapshot_applied == 0
    man = sink.load_manifest()
    # an all-noop pure-R batch commits metadata only: no new data dirs
    assert man["version"] == v + 1
    import os
    assert not os.path.isdir(str(tmp_path / "t" / "data" /
                                 f"{'d' if mode == 'mor' else 'v'}{man['version']:06d}"))


def test_patch_applies_over_snapshot_image_in_one_batch(spark, tmp_path):
    """R bootstraps the key and a streamed patch (even with an OLDER
    ts) overlays its columns — stream always beats snapshot."""
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=2)
    _merge(spark, sink, [
        _ev("a", 0, 1, _ts(5), op="R", role="user", text="image", tool="orig"),
        _ev("a", 0, 2, _ts(2), op="P", role=None, text="patched", tool=None),
    ], 0)
    assert _state(sink)[("a", 0)] == ("user", "patched", "orig")


def test_applied_snapshot_image_is_established_data(spark, tmp_path):
    """Batch-split caveat (mirrors the patch caveat): once an R is
    APPLIED its stored row is established streamed data — a patch
    arriving in a LATER batch with an OLDER ts loses to it, exactly as
    it would against any stored row. (In the same batch the rank rule
    applies instead — see the one-batch test above.)"""
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=2)
    _merge(spark, sink, [_ev("a", 0, 1, _ts(5), op="R", text="image")], 0)
    _merge(spark, sink, [_ev("a", 0, 2, _ts(2), op="P", text="old-patch")], 1)
    assert _state(sink)[("a", 0)][1] == "image"


def test_snapshot_then_stream_then_snapshot_matches_materialize(spark, tmp_path):
    """Replayed state == the one-shot materialize oracle (what `cli
    verify` compares against) on a log mixing R/I/U/D/P."""
    from oec_etl_spark.operators.lww import materialize

    log = [
        _ev("a", 0, 1, _ts(1), op="R", text="rA"),
        _ev("b", 0, 2, _ts(1), op="R", text="rB"),
        _ev("a", 0, 3, _ts(2), text="uA"),
        _ev("b", 0, 4, _ts(2), op="P", text="pB"),
        _ev("c", 0, 5, _ts(3), op="I", text="iC"),
        _ev("c", 0, 6, _ts(4), op="D", role=None, text=None),
        _ev("d", 0, 7, _ts(9), op="R", text="rD"),
    ]
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)
    cuts = [0, 3, 5, len(log)]
    for i, (lo, hi) in enumerate(zip(cuts, cuts[1:])):
        _merge(spark, sink, log[lo:hi], i)
    valid, _ = quarantine_split(spark.createDataFrame(log, NSCHEMA))
    cols = sorted(sink.read_table().columns)
    oracle = materialize(valid).select(*cols)
    got = sink.read_table().select(*cols)
    assert got.exceptAll(oracle).count() == 0 and oracle.exceptAll(got).count() == 0
    assert _state(sink)[("b", 0)][1] == "pB"


# --------------------------------------------------------------- op 'T'

@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_truncate_event_kills_at_and_under_horizon(spark, tmp_path, mode):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=4, table_mode=mode)
    _merge(spark, sink, [_ev("a", 0, 1, _ts(1)), _ev("b", 0, 2, _ts(2)),
                         _ev("c", 0, 3, _ts(3))], 0)
    rec = _merge(spark, sink, [_trunc(4, _ts(2)), _ev("d", 0, 5, _ts(4), text="new")], 1)
    assert rec.rows_truncate_events == 1 and rec.truncate_ts_us is not None
    st = _state(sink)
    assert set(st) == {("c", 0), ("d", 0)}  # ts1, ts2 dead; ts3, ts4 live


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_pure_truncate_batch_is_metadata_only(spark, tmp_path, mode):
    import os
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=4, table_mode=mode)
    _merge(spark, sink, [_ev("a", 0, 1, _ts(1)), _ev("b", 0, 2, _ts(5))], 0)
    rec = _merge(spark, sink, [_trunc(3, _ts(3))], 1)
    man = sink.load_manifest()
    assert man["truncate_ts_us"] == rec.truncate_ts_us
    assert not os.path.isdir(str(tmp_path / "t" / "data" /
                                 f"{'d' if mode == 'mor' else 'v'}{man['version']:06d}"))
    assert _state(sink) == {("b", 0): ("user", "orig", None)}


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_late_straggler_under_horizon_is_dropped(spark, tmp_path, mode):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=4, table_mode=mode)
    _merge(spark, sink, [_ev("a", 0, 1, _ts(5))], 0)
    _merge(spark, sink, [_trunc(2, _ts(4))], 1)
    # arrives AFTER the truncate committed, but predates the horizon
    _merge(spark, sink, [_ev("z", 0, 3, _ts(3), text="late")], 2)
    st = _state(sink)
    assert ("z", 0) not in st and ("a", 0) in st
    # a genuinely newer event on a truncated key re-creates it
    _merge(spark, sink, [_ev("z", 0, 4, _ts(6), text="fresh")], 3)
    assert _state(sink)[("z", 0)][1] == "fresh"


def test_truncate_keeps_null_ts_rows(spark, tmp_path):
    """No ordering evidence → no truncation (the tombstone-expiry
    stance): NULL-ts rows survive any horizon."""
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=2)
    _merge(spark, sink, [_ev("n", 0, 1, None, text="nots"), _ev("a", 0, 2, _ts(1))], 0)
    _merge(spark, sink, [_trunc(3, _ts(9))], 1)
    assert set(_state(sink)) == {("n", 0)}


def test_truncate_time_travel_and_rollback(spark, tmp_path):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=2)
    _merge(spark, sink, [_ev("a", 0, 1, _ts(1)), _ev("b", 0, 2, _ts(2))], 0)
    v_before = sink.load_manifest()["version"]
    _merge(spark, sink, [_trunc(3, _ts(5))], 1)
    assert sink.read_table().count() == 0
    # snapshot isolation: the pre-truncate version still reads in full
    assert sink.read_table(version=v_before).count() == 2
    # rollback restores that snapshot's (absent) horizon
    sink.rollback(v_before)
    assert sink.read_table().count() == 2
    assert sink.load_manifest().get("truncate_ts_us") is None


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_compact_physically_reclaims_truncated_rows(spark, tmp_path, mode):
    import pyarrow.parquet as pq
    import glob
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=2, table_mode=mode)
    _merge(spark, sink, [_ev(f"c{i}", 0, i + 1, _ts(1)) for i in range(20)], 0)
    _merge(spark, sink, [_ev("k", 0, 99, _ts(9), text="live")], 1)
    _merge(spark, sink, [_trunc(100, _ts(5))], 2)
    assert _state(sink) == {("k", 0): ("user", "live", None)}
    compacted = sink.compact()
    if mode == "cow":
        # cow has no deltas to compact; truncated rows die at read time
        assert compacted == []
        return
    assert compacted
    man = sink.load_manifest()
    vdir = str(tmp_path / "t" / "data" / f"v{man['version']:06d}")
    rows = sum(pq.ParquetFile(f).metadata.num_rows
               for f in glob.glob(vdir + "/**/*.parquet", recursive=True))
    assert rows == 1  # the 20 truncated rows are physically gone
    assert _state(sink) == {("k", 0): ("user", "live", None)}


def test_truncate_zonemap_prunes_old_files_from_listing(spark, tmp_path):
    """mor deltas are tight time slices; a truncate horizon above a
    delta's ts_max drops that file from the read plan entirely."""
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=1, table_mode="mor")
    _merge(spark, sink, [_ev("a", 0, 1, _ts(1)), _ev("b", 0, 2, _ts(2))], 0)
    _merge(spark, sink, [_ev("c", 0, 3, _ts(10)), _ev("d", 0, 4, _ts(11))], 1)
    files_before = set(sink.read_table().inputFiles())
    assert len(files_before) == 2
    _merge(spark, sink, [_trunc(5, _ts(5))], 2)
    files_after = set(sink.read_table().inputFiles())
    assert len(files_after) == 1  # the ts1-2 delta is skipped from the listing
    assert _state(sink) == {("c", 0): ("user", "orig", None),
                            ("d", 0): ("user", "orig", None)}


def test_truncate_before_admin_api_and_horizon_monotonicity(spark, tmp_path):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=2)
    _merge(spark, sink, [_ev("a", 0, 1, _ts(1)), _ev("b", 0, 2, _ts(8))], 0)
    rec = sink.truncate_before(_ts(4))
    assert rec.truncate_ts_us and rec.batch_id < 0  # DML epoch, never shadows streaming
    assert set(_state(sink)) == {("b", 0)}
    # an earlier horizon can only widen, never shrink (max-monotone)
    sink.truncate_before(_ts(2))
    assert sink.load_manifest()["truncate_ts_us"] == rec.truncate_ts_us
    # re-ingest after truncate works normally
    _merge(spark, sink, [_ev("a", 0, 3, _ts(6), text="post")], 10)
    assert _state(sink)[("a", 0)][1] == "post"


def test_truncate_cli(spark, tmp_path, monkeypatch, capsys):
    import json

    from oec_etl_spark import session
    from oec_etl_spark.cli import main

    monkeypatch.setattr(session, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)
    _merge(spark, sink, [_ev("a", 0, 1, _ts(1)), _ev("b", 0, 2, _ts(9))], 0)
    rc = main(["truncate", "--target", str(tmp_path / "t"), "--buckets", "4",
               "--before", "2024-01-01T05:00:00+00:00"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["truncate_ts_us"] > 0
    assert set(_state(sink)) == {("b", 0)}
    # describe surfaces the horizon
    rc = main(["describe", "--target", str(tmp_path / "t"), "--buckets", "4"])
    assert rc == 0
    card = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert card["truncate_ts_us"] == out["truncate_ts_us"]


def test_quarantine_envelope_for_r_and_t(spark):
    rows = [
        _trunc(1, _ts(1)),                                    # valid T
        _ev(None, None, 2, None, op="T", role=None, text=None),  # T without ts
        _ev("a", 0, 3, _ts(1), op="R"),                       # valid R
        _ev(None, 0, 4, _ts(1), op="R"),                      # R without key
    ]
    valid, rejected = quarantine_split(spark.createDataFrame(rows, NSCHEMA))
    assert {r["seq"] for r in valid.collect()} == {1, 3}
    assert {r["seq"] for r in rejected.collect()} == {2, 4}


def test_constraints_exempt_truncate_rows(spark):
    rows = [_trunc(1, _ts(1)), _ev("a", 0, 2, _ts(1), role="bogus")]
    valid, rejected = quarantine_split(
        spark.createDataFrame(rows, NSCHEMA),
        constraints={"role_known": "role in ('user','assistant','system','tool')"},
    )
    assert {r["seq"] for r in valid.collect()} == {1}
    assert {r["seq"] for r in rejected.collect()} == {2}


# ------------------------------------------------- combined random oracle

def test_random_history_with_all_ops_matches_sequential_oracle(spark, tmp_path):
    """I/U/D/P/R/T interleaved: the engine's state across arbitrary
    in-order batch splits equals a trivial per-event Python fold."""
    rng = random.Random(7)
    events, seq = [], 0
    for step in range(140):
        seq += 1
        op = rng.choices(["I", "U", "D", "P", "R", "T"],
                         weights=[2, 4, 1, 3, 2, 0.3])[0]
        conv, turn = f"c{rng.randrange(6)}", rng.randrange(2)
        t = _ts(step)
        if op == "T":
            events.append(_trunc(seq, t))
        elif op == "P":
            events.append(_ev(conv, turn, seq, t, op="P",
                              role=rng.choice([None, "assistant"]),
                              text=rng.choice([None, f"t{seq}"]), tool=None))
        elif op == "D":
            events.append(_ev(conv, turn, seq, t, op="D", role=None, text=None))
        else:
            events.append(_ev(conv, turn, seq, t, op=op, text=f"t{seq}",
                              tool=rng.choice([None, "b"])))

    # Sequential fold. Tombstones are tracked WITH their ts: a deleted
    # key stays dead for a later R (the tombstone outranks the snapshot
    # read) — unless a truncate swallows the tombstone itself, after
    # which the key is genuinely unknown and an R may re-create it.
    state2: dict = {}  # key -> (role, text, tool, ts)
    dead: dict = {}    # key -> tombstone ts
    horizon = None
    for e in events:  # already in (ts, seq) order
        k = (e["conv_id"], e["turn_idx"])
        if e["op"] == "T":
            horizon = e["ts"]
            state2 = {k2: v for k2, v in state2.items() if v[3] > horizon}
            dead = {k2: t for k2, t in dead.items() if t > horizon}
            continue
        if horizon is not None and e["ts"] <= horizon:
            continue
        if e["op"] in ("I", "U"):
            state2[k] = (e["role"], e["text"], e["tool"], e["ts"])
            dead.pop(k, None)
        elif e["op"] == "R":
            if k not in state2 and k not in dead:
                state2[k] = (e["role"], e["text"], e["tool"], e["ts"])
        elif e["op"] == "D":
            state2.pop(k, None)
            dead[k] = e["ts"]
        elif k in state2:  # P on a live row; the row moves to the patch's ts
            old = state2[k]
            state2[k] = tuple(
                e[c] if e[c] is not None else old[i]
                for i, c in enumerate(("role", "text", "tool"))
            ) + (e["ts"],)

    expected = {k: v[:3] for k, v in state2.items()}
    for mode in ("cow", "mor"):
        sink = ParquetSnapshotSink(spark, str(tmp_path / mode), n_buckets=4, table_mode=mode)
        cuts = sorted(rng.sample(range(1, len(events)), 3))
        parts = [events[a:b] for a, b in zip([0, *cuts], [*cuts, len(events)])]
        for i, part in enumerate(parts):
            _merge(spark, sink, part, i)
        assert _state(sink) == expected, mode
