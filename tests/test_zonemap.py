"""ts zone maps + the time-horizon scan (`scan_since`).

Write-time footer stats per data file (Iceberg manifest column-stats
analog) let a `ts >= since` read drop files from the LISTING alone.
Pruning pre-merge is sound only for a lower bound — the LWW order is
ts-aligned, so a dropped file can hold only losers or winners that are
older than the horizon (see scan_since's docstring) — and these tests
pin both halves: fewer files actually read, and exact row equality with
the unpruned read + post-filter, including tombstones across the
horizon and the no-sidecar fallback.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F

from oec_etl_spark.schemas import CHANGE_SCHEMA
from oec_etl_spark.streaming.engine import quarantine_split
from oec_etl_spark.streaming.sink import FILESTATS, ParquetSnapshotSink


def _ts(day: int):
    return datetime(2024, 1, day, 12, 0, tzinfo=timezone.utc)


def _ev(conv, turn, seq, ts, op="U", text="t"):
    return {
        "seq": seq, "op": op, "conv_id": conv, "turn_idx": turn,
        "role": "user", "text": text, "tool": None, "ts": ts,
        "source_file": "s0", "offset": seq,
    }


def _merge(spark, sink, rows, batch_id):
    valid, _ = quarantine_split(spark.createDataFrame(rows, CHANGE_SCHEMA))
    sink.merge(valid, batch_id=batch_id)


def _old_batch():
    # 20 conversations, all activity on day 1-2
    return [_ev(f"c{i}", t, seq=i * 10 + t, ts=_ts(1 + t % 2)) for i in range(20) for t in range(3)]


def _recent_batch():
    # 2 conversations touched again on day 10: an update, a fresh turn,
    # and a delete of an old row (tombstone newer than the horizon)
    return [
        _ev("c0", 0, seq=1000, ts=_ts(10), text="updated"),
        _ev("c1", 9, seq=1001, ts=_ts(10), text="new turn"),
        _ev("c2", 0, seq=1002, ts=_ts(10), op="D"),
    ]


def _expected(sink, since):
    return sink.read_table().filter(F.col("ts") >= F.lit(since))


def _same_rows(a, b):
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a, b = a.select(*cols), b.select(*cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_scan_since_prunes_cow_and_matches_filter(spark, tmp_path):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)
    _merge(spark, sink, _old_batch(), 0)
    _merge(spark, sink, _recent_batch(), 1)

    since = _ts(5)
    got = sink.scan_since(since)
    _same_rows(got, _expected(sink, since))
    # the tombstoned key is gone, the update is the new text
    rows = {(r["conv_id"], r["turn_idx"]): r["text"] for r in got.collect()}
    assert ("c2", 0) not in rows
    assert rows[("c0", 0)] == "updated"
    # cow carried the untouched buckets' old base files forward — the
    # horizon drops them from the listing
    assert len(got.inputFiles()) < len(sink.read_table().inputFiles())


def test_scan_since_prunes_mor_base_under_deltas(spark, tmp_path):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=4, table_mode="mor")
    _merge(spark, sink, _old_batch(), 0)
    _merge(spark, sink, _recent_batch(), 1)

    since = _ts(5)
    got = sink.scan_since(since)
    _same_rows(got, _expected(sink, since))
    # even DIRTY buckets prune their old base files pre-merge (the
    # LWW-order soundness argument) — only the recent deltas are read
    assert len(got.inputFiles()) < len(sink.read_table().inputFiles())


def test_scan_since_horizon_before_everything_is_full_table(spark, tmp_path):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)
    _merge(spark, sink, _old_batch(), 0)
    got = sink.scan_since(_ts(1).replace(hour=0))
    _same_rows(got, sink.read_table())


def test_scan_since_fallback_without_sidecars(spark, tmp_path):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)
    _merge(spark, sink, _old_batch(), 0)
    _merge(spark, sink, _recent_batch(), 1)
    for dirpath, _dirs, files in os.walk(str(tmp_path / "t")):
        for fn in files:
            if fn == FILESTATS:
                os.remove(os.path.join(dirpath, fn))
    since = _ts(5)
    got = sink.scan_since(since)
    _same_rows(got, _expected(sink, since))
    # conservative fallback: nothing pruned, everything read
    assert len(got.inputFiles()) == len(sink.read_table().inputFiles())


def test_scan_since_null_ts_rows_are_excluded_not_fatal(spark, tmp_path):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)
    rows = _old_batch() + [_ev("cnull", 0, seq=5000, ts=None)]
    _merge(spark, sink, rows, 0)
    got = sink.scan_since(_ts(1).replace(hour=0))
    assert got.filter(F.col("conv_id") == "cnull").count() == 0
    assert sink.read_table().filter(F.col("conv_id") == "cnull").count() == 1


# --------------------------------------------------------------- property
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_event = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.integers(0, 4),   # conv
    st.integers(0, 1),   # turn
    st.integers(0, 23),  # ts hour (ties + cross-horizon shadowing)
)
_batches = st.lists(st.lists(_event, min_size=1, max_size=6), min_size=1, max_size=4)


def _rows(events, seq0):
    out = []
    for i, (op, conv, turn, h) in enumerate(events):
        dead = op == "D"
        out.append({
            "seq": seq0 + i, "op": op, "conv_id": f"c{conv}", "turn_idx": turn,
            "role": None if dead else "user",
            "text": None if dead else f"t{seq0 + i}", "tool": None,
            "ts": datetime(2024, 1, 1, h, tzinfo=timezone.utc),
            "source_file": f"s{seq0 + i}", "offset": seq0 + i,
        })
    return out


@pytest.mark.usefixtures("spark")
@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(batches=_batches, mode=st.sampled_from(["cow", "mor"]),
       horizon_h=st.integers(0, 24))
def test_scan_since_equals_filtered_read_for_any_history(spark, batches, mode, horizon_h):
    """The soundness claim as a property: for ANY insert/update/delete
    history (ts ties, deletes shadowing across the horizon, both table
    modes), the zone-map-pruned scan equals the unpruned read + filter."""
    root = tempfile.mkdtemp(prefix="zmap-prop-")
    sink = ParquetSnapshotSink(spark, root, 4, table_mode=mode)
    seq = 0
    for i, events in enumerate(batches):
        _merge(spark, sink, _rows(events, seq), i)
        seq += len(events)
    horizon = datetime(2024, 1, 1, tzinfo=timezone.utc) + timedelta(hours=horizon_h)
    got = sink.scan_since(horizon)
    _same_rows(got, sink.read_table().filter(F.col("ts") >= F.lit(horizon)))


def test_zonemap_summary_counts_and_span(spark, tmp_path):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)
    _merge(spark, sink, _old_batch(), 0)
    _merge(spark, sink, _recent_batch(), 1)
    s = sink.zonemap_summary()
    assert s["files"] == len(sink.read_table().inputFiles())
    assert s["with_stats"] == s["files"]  # every file written by this engine
    assert s["ts_min_us"] <= s["ts_max_us"]
    lo = datetime.fromtimestamp(s["ts_min_us"] / 1e6, tz=timezone.utc)
    hi = datetime.fromtimestamp(s["ts_max_us"] / 1e6, tz=timezone.utc)
    assert lo == _ts(1) and hi == _ts(10)


def test_compact_ts_split_makes_base_prunable(spark, tmp_path):
    """Time-split compaction (secondary days(ts) partitioning analog):
    after compact(ts_split_files=4), a bucket's base is ~4 ts-range
    files, so a scan_since horizon prunes the COLD SLICES of the base
    itself — the read stays O(recent) even with zero deltas."""
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=2, table_mode="mor")
    # activity spread over days 1..8 across every conversation
    rows = [
        _ev(f"c{i}", t, seq=i * 100 + t, ts=_ts(1 + (i * 3 + t) % 8))
        for i in range(16) for t in range(4)
    ]
    _merge(spark, sink, rows[:32], 0)
    _merge(spark, sink, rows[32:], 1)
    sink.compact(ts_split_files=4)
    assert not any(dd for dd in sink.load_manifest().get("deltas", {}).values())

    total = len(sink.read_table().inputFiles())
    assert total > 2  # the 2 buckets really did split by time
    since = _ts(7)
    got = sink.scan_since(since)
    _same_rows(got, _expected(sink, since))
    assert len(got.inputFiles()) < total  # cold slices of the BASE pruned


# ------------------------------------------------------- key zone maps
def test_lookup_prunes_files_within_bucket(spark, tmp_path):
    """Key zone maps: with sub-bucket write fan-out each conversation
    lands wholly in one file, so a point lookup reads a strict subset
    of its bucket's files — and still returns exactly the filtered
    table."""
    sink = ParquetSnapshotSink(
        spark, str(tmp_path / "t"), n_buckets=2, files_per_bucket=4
    )
    rows = [
        _ev(f"c{i:03d}", t, seq=i * 100 + t, ts=_ts(1 + t % 2))
        for i in range(64) for t in range(3)
    ]
    _merge(spark, sink, rows, 0)

    conv = "c007"
    got = sink.lookup(conv)
    want = sink.read_table().filter(F.col("conv_id") == conv)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    read = got.inputFiles()
    bucket = {f.split("__bucket=")[1].split("/")[0] for f in read}
    assert len(bucket) == 1  # still one bucket
    bdir = read[0].split("/part-")[0].replace("file:", "")
    in_bucket = [f for f in os.listdir(bdir) if f.endswith(".parquet")]
    assert len(in_bucket) > 1  # fan-out actually made several files
    assert len(read) < len(in_bucket)  # and the key zone map skipped some


def test_lookup_prunes_mor_deltas_too(spark, tmp_path):
    """A dirty bucket's lookup merges base ∪ deltas, but only the files
    whose key range admits the key — a delta touching other
    conversations is never opened."""
    sink = ParquetSnapshotSink(
        spark, str(tmp_path / "t"), n_buckets=1, files_per_bucket=4, table_mode="mor"
    )
    rows = [
        _ev(f"c{i:03d}", t, seq=i * 100 + t, ts=_ts(1))
        for i in range(32) for t in range(2)
    ]
    _merge(spark, sink, rows, 0)
    # second batch touches ONLY c001 (update) and c002 (delete)
    _merge(spark, sink, [
        _ev("c001", 0, seq=9000, ts=_ts(5), text="patched"),
        _ev("c002", 0, seq=9001, ts=_ts(5), op="D"),
    ], 1)

    got = sink.lookup("c001")
    want = sink.read_table().filter(F.col("conv_id") == "c001")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert {r["text"] for r in got.collect() if r["turn_idx"] == 0} == {"patched"}
    # the tombstoned conversation is gone through the same path
    assert sink.lookup("c002", 0).count() == 0

    # a conversation batch 1 did NOT touch never opens batch 1's delta
    # (in mor mode batch 0's rows live in the d000001 delta dir)
    untouched = sink.lookup("c010")
    assert untouched.count() == 2
    assert not any("d000002" in f for f in untouched.inputFiles())


def test_lookup_fallback_without_sidecars(spark, tmp_path):
    sink = ParquetSnapshotSink(
        spark, str(tmp_path / "t"), n_buckets=2, files_per_bucket=4
    )
    rows = [_ev(f"c{i:03d}", 0, seq=i, ts=_ts(1)) for i in range(32)]
    _merge(spark, sink, rows, 0)
    for dirpath, _dirs, files in os.walk(str(tmp_path / "t")):
        for fn in files:
            if fn == FILESTATS:
                os.remove(os.path.join(dirpath, fn))
    got = sink.lookup("c003")
    assert got.count() == 1  # conservative: nothing pruned, still correct
