"""Wave-offset generation (GeneratorConfig.segment_offset / seq_offset
/ ts_offset_us / conv_offset) — the mechanism behind the endurance tail
(scripts/endurance_tail.py): an upstream that KEEPS producing while the
consumer tails.

Pins:
- the combined two-wave log is well-formed: segment file names
  continue (no collision/overwrite), seq stays strictly unique and
  wave-ordered, conv keyspaces are disjoint, event time advances;
- tailing the log wave-by-wave on one checkpoint yields exactly the
  same final table as one fresh replay of the combined directory —
  offsets change nothing about merge semantics.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.generate import GeneratorConfig, generate_changelog
from oec_etl_spark.streaming.engine import run_replay
from oec_etl_spark.streaming.sink import ParquetSnapshotSink

CORE = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

WAVE_TS_STRIDE = 10_000_000_000_000  # > one wave's event-time span (µs)


def _gen_wave(out_dir: str, wave: int, n_conv: int = 120, segs: int = 3,
              seq_offset: int = 0) -> dict:
    return generate_changelog(GeneratorConfig(
        out_dir=out_dir, seed=500 + wave, n_conversations=n_conv,
        n_segments=segs, update_ratio=0.6, delete_ratio=0.05,
        duplicate_rate=0.05, epoch1_fraction=0.4 if wave == 0 else 0.0,
        segment_offset=wave * segs, seq_offset=seq_offset,
        ts_offset_us=wave * WAVE_TS_STRIDE, conv_offset=wave * n_conv,
    ))


def test_two_wave_log_is_well_formed(tmp_path):
    d = str(tmp_path / "changes")
    s0 = _gen_wave(d, 0)
    s1 = _gen_wave(d, 1, seq_offset=s0["distinct_seq"])

    names = sorted(os.listdir(d))
    segs = [n for n in names if n.endswith(".parquet")]
    assert segs == [f"seg-{i:05d}.parquet" for i in range(6)]

    w0 = pq.read_table([os.path.join(d, s) for s in segs[:3]]).to_pandas()
    w1 = pq.read_table([os.path.join(d, s) for s in segs[3:]]).to_pandas()
    # seq: wave 1 strictly above wave 0, unique within each wave's
    # distinct events (exact duplicates are injected redeliveries)
    assert w0["seq"].max() <= s0["distinct_seq"] < w1["seq"].min()
    assert w0["seq"].nunique() == s0["distinct_seq"]
    assert w1["seq"].nunique() == s1["distinct_seq"]
    # conv keyspace disjoint; event time advances across waves
    c0 = set(w0["conv_id"].dropna())
    c1 = set(w1["conv_id"].dropna())
    assert c0 and c1 and not (c0 & c1)
    assert w0["ts"].max() < w1["ts"].min()
    # wave 0 leads with pre-`tool` (v1) segments; wave 1 is all-v2
    assert "tool" not in pq.read_schema(os.path.join(d, segs[0])).names
    assert all(
        "tool" in pq.read_schema(os.path.join(d, s)).names for s in segs[3:]
    )


def test_tailed_waves_equal_combined_replay(tmp_path, spark):
    live = str(tmp_path / "live")  # waves arrive between replays
    s0 = _gen_wave(live, 0)
    cfg = EngineConfig(changes_dir=live, target_dir=str(tmp_path / "t1"),
                       checkpoint_dir=str(tmp_path / "c1"), n_buckets=4)
    run_replay(spark, cfg)
    _gen_wave(live, 1, seq_offset=s0["distinct_seq"])
    recs = run_replay(spark, cfg)  # tail: picks up only wave-1 segments
    assert recs and all(r.rows_in_batch > 0 for r in recs)
    tailed = ParquetSnapshotSink(spark, cfg.target_dir, 4).read_table()

    cfg_once = EngineConfig(changes_dir=live, target_dir=str(tmp_path / "t2"),
                            checkpoint_dir=str(tmp_path / "c2"), n_buckets=4)
    run_replay(spark, cfg_once)
    once = ParquetSnapshotSink(spark, cfg_once.target_dir, 4).read_table()

    assert tailed.select(CORE).exceptAll(once.select(CORE)).count() == 0
    assert once.select(CORE).exceptAll(tailed.select(CORE)).count() == 0
    assert tailed.count() == once.count()
