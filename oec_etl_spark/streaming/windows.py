"""Streaming window analytics over the events stream.

The reference has zero streaming constructs — its "stream" is a
(year, month) parameter grid re-run loop
(/root/reference/etl/trade_comtrade_monthly_pipeline.py:120-135). These are the
Structured-Streaming-native operators that replace hand-rolled
time-bucket ETL at 10^10-event scale:

- tumbling/sliding event-time windows with watermarks (late data
  dropped deterministically, state evicted — bounded memory);
- session windows (gap-based), the streaming twin of the batch
  `events_sessionize` query;
- stream-stream interval join (watermarked both sides, time-bounded
  condition → bounded join state);
- a custom stateful per-key accumulator via ``applyInPandasWithState``
  (Arrow-batched; the escape hatch for semantics built-ins can't
  express).

All builders accept either a batch or a streaming DataFrame — the
DataFrame API is identical, which is exactly how the batch queries in
plans/queries.py double as the correctness oracle for the streaming
path (run both, compare).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    slide: str | None = None,
) -> DataFrame:
    """Watermarked tumbling (or sliding, if ``slide`` given) window
    aggregation: (window, event_type) → count + value sum. In streaming
    mode the watermark bounds state: a window finalizes once event time
    passes window.end + watermark, and later-arriving rows for it are
    dropped (counted upstream by the quarantine/lineage layer, never
    silently lost in batch replays — batch mode ignores watermarks)."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Gap-based session windows per user: the streaming-native form of
    the batch lag()-cumsum sessionization in plans/queries.py
    (events_sessionize). State per open session only; closed by gap +
    watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def purchase_followup_join(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream INTERVAL join: every click paired with the same
    user's purchases landing within ``within`` after it (attribution
    shape). Both sides are watermarked and the join condition carries
    the time bound, so Spark can evict buffered state: a click is
    dropped from state once the purchase-side watermark passes
    click.ts + within — bounded memory at 10^10 events, the defining
    constraint of stream-stream joins (an unbounded-condition join
    would buffer both streams forever).

    Works identically on batch DataFrames (watermarks ignored), which is
    how the test oracles it. Output: one row per (click, purchase) pair
    with the lag in seconds.
    """
    c = clicks.select(
        F.col("event_id").alias("click_id"), F.col("user_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"), F.col("value"),
    ).withWatermark("purchase_ts", watermark)
    joined = c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}")),
    )
    return joined.select(
        "click_id", "user_id", "click_ts", "purchase_id", "purchase_ts",
        F.round("value", 4).alias("purchase_value"),
        (
            F.unix_micros(F.col("purchase_ts").cast("timestamp"))
            - F.unix_micros(F.col("click_ts").cast("timestamp"))
        ).alias("lag_us"),  # cast: parquet testdata carries TIMESTAMP_NTZ
    )


# ------------------------------------------------------- custom stateful op
RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), True),
        T.StructField("updates", T.LongType(), False),  # state-commit counter
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("total", T.DoubleType(), False),
        T.StructField("updates", T.LongType(), False),
    ]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running (count, value-total)
    across micro-batches, via ``applyInPandasWithState`` — the pattern
    for any accumulator Spark's windowed aggs can't express (e.g.
    per-conversation transcript statistics that must survive batches).
    Arrow-batched: each group's rows arrive as pandas chunks; state is
    a tiny tuple, never the rows themselves."""

    def update(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        n, total, updates = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        updates += 1
        state.update((n, total, updates))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 4)],
                "updates": [updates],
            }
        )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
