"""Streaming window tests: run each window operator as a real
Structured Streaming query over a file source and check it against the
identical computation run in batch mode (the DataFrame API is the
oracle), plus a deterministic watermark late-drop test."""

from __future__ import annotations

import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from oec_etl_spark.streaming import windows as W

EVENTS = "/root/testdata/sf0.001/events.parquet"
EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
)


def _stream_dir(tmp_path, n_files=3):
    """Split the events table into n ordered segment files."""
    d = tmp_path / "stream"
    d.mkdir()
    t = pq.read_table(EVENTS)
    step = (t.num_rows + n_files - 1) // n_files
    for i in range(n_files):
        pq.write_table(t.slice(i * step, step), str(d / f"ev-{i:03d}.parquet"))
        os.utime(str(d / f"ev-{i:03d}.parquet"), (time.time() + i, time.time() + i))
    return str(d)


def _run_stream(spark, src_dir, build, ckpt, mode="update", per_trigger=1):
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", per_trigger)
        .parquet(src_dir)
    )
    name = f"mem_{abs(hash((src_dir, mode))) % 10**8}"
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def _latest_per(df, keys, order="updates"):
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.desc(order))
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def test_tumbling_stream_matches_batch(spark, tmp_path):
    src = _stream_dir(tmp_path)
    got = _run_stream(
        spark, src, lambda s: W.tumbling_counts(s, "1 hour", "0 seconds"),
        str(tmp_path / "ck1"), mode="complete", per_trigger=3,
    )
    want = W.tumbling_counts(spark.read.schema(EVENT_SCHEMA).parquet(src), "1 hour", "0 seconds")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_session_stream_matches_batch(spark, tmp_path):
    src = _stream_dir(tmp_path)
    got = _run_stream(
        spark, src, lambda s: W.session_counts(s, "30 minutes", "0 seconds"),
        str(tmp_path / "ck2"), mode="complete", per_trigger=3,
    )
    want = W.session_counts(spark.read.schema(EVENT_SCHEMA).parquet(src), "30 minutes")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_watermark_drops_late_event(spark, tmp_path):
    """Batch 1 advances the watermark past an old window; batch 2
    delivers a late event into that window → it must be dropped, i.e.
    the window's aggregate is never updated again."""
    d = tmp_path / "late"
    d.mkdir()

    def seg(name, rows, mtime_off):
        ts, et = zip(*rows)
        t = pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([pa.scalar(x, pa.timestamp("us")) for x in ts], pa.timestamp("us")),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array(list(et), pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        p = str(d / name)
        pq.write_table(t, p)
        os.utime(p, (time.time() + mtime_off, time.time() + mtime_off))

    h = 3_600_000_000  # 1h in µs
    # Watermark computed from batch N's data takes effect in batch N+2's
    # filter (Spark updates it at commit; the next planned batch still
    # uses the pre-update value) — hence three files.
    seg("a.parquet", [(0 * h + 600_000_000, "click"), (2 * h, "click")], 0)  # wm → 1:30
    seg("b.parquet", [(2 * h + 60_000_000, "click")], 1)
    seg("c.parquet", [(0 * h + 900_000_000, "click"), (2 * h + 120_000_000, "click")], 2)
    got = _run_stream(
        spark, str(d), lambda s: W.tumbling_counts(s, "1 hour", "30 minutes"),
        str(tmp_path / "ck3"), mode="update", per_trigger=1,
    ).collect()
    # update-mode memory sink appends one row per window per batch that
    # changed it; window [00:00,01:00) must have exactly ONE emission
    # (from batch 0) — the late batch-2 event at 00:15 was dropped.
    first_window = [r for r in got if r["window_start"].hour == 0]
    assert len(first_window) == 1 and first_window[0]["n"] == 1
    # the on-time events kept updating window [02:00,03:00) → 3 emissions
    assert [r["n"] for r in sorted(got, key=lambda r: r["n"]) if r["window_start"].hour == 2] == [1, 2, 3]


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream self-join (clicks ⋈ purchases within 1h, same
    source stream filtered twice) replayed over segment files equals the
    identical join computed in batch."""
    src = _stream_dir(tmp_path)

    def build(s):
        return W.purchase_followup_join(
            s.filter(F.col("event_type") == "click"),
            s.filter(F.col("event_type") == "purchase"),
            within="1 hour", watermark="0 seconds",
        )

    got = _run_stream(spark, src, build, str(tmp_path / "ck5"), mode="append", per_trigger=1)
    want = build(spark.read.schema(EVENT_SCHEMA).parquet(src))
    assert got.count() > 0
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_stateful_running_totals(spark, tmp_path):
    src = _stream_dir(tmp_path)
    got = _run_stream(
        spark, src, W.running_user_totals, str(tmp_path / "ck4"), mode="update", per_trigger=1
    )
    final = _latest_per(got, ["user_id"]).select("user_id", "n_events", "total_value")
    ev = spark.read.schema(EVENT_SCHEMA).parquet(src)
    want = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.coalesce("value", F.lit(0.0))), 4).alias("total_value"),
    )
    assert sorted(map(tuple, final.collect())) == sorted(map(tuple, want.collect()))
    assert got.agg(F.max("updates")).head()[0] >= 2  # state really crossed batches


def test_sliding_stream_matches_batch(spark, tmp_path):
    """Sliding windows (1 hour, slide 15 min): each event lands in 4
    overlapping windows; the streaming result must equal the identical
    batch computation."""
    src = _stream_dir(tmp_path)
    build = lambda s: W.tumbling_counts(s, "1 hour", "0 seconds", slide="15 minutes")  # noqa: E731
    got = _run_stream(spark, src, build, str(tmp_path / "ck_slide"), mode="complete", per_trigger=3)
    want = build(spark.read.schema(EVENT_SCHEMA).parquet(src))
    assert got.count() > want.filter(F.lit(False)).count()  # non-empty
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # overlap sanity: sliding windows produce ~4x the distinct windows
    n_slide = want.select("window_start").distinct().count()
    n_tumble = (
        W.tumbling_counts(spark.read.schema(EVENT_SCHEMA).parquet(src), "1 hour", "0 seconds")
        .select("window_start").distinct().count()
    )
    assert n_slide > 2 * n_tumble
