"""As-of join: enrich each left row with the latest right row at-or-before it.

The reference has no joins at all (SURVEY.md §2.4); this is the
canonical CDC/temporal enrichment operator ("attach the most recent
state snapshot to every event"). Spark has no native ASOF JOIN, so we
compose one from primitives the way Flink's temporal join and
QuestDB/kdb ASOF are built:

    union(left, right) → shuffle once on the key
      → sort within partition by (ts, side)
      → last(right payload, ignorenulls) over an unbounded-preceding
        running window → filter back to left rows

Why this beats the naive `join ON key AND r.ts <= l.ts` + max-window:
that plan materializes the full per-key cross product before pruning —
O(|L|·|R|) per key, quadratic on hot keys. The union-scan form is
O((|L|+|R|) log) per partition, exactly one shuffle, no skew blow-up,
and AQE can still split oversized partitions. At 10^10 rows that is
the difference between a plan that finishes and one that doesn't.

Tie rule: on equal ts the right row sorts FIRST (side 0 < 1), so the
join is inclusive (r.ts <= l.ts), matching DuckDB's `ASOF JOIN ...
ON r.ts <= l.ts` oracle semantics. Right-side duplicates at the same
(key, ts) must be pre-reduced by the caller for determinism (see
`lww_reduce`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join. ``right_cols`` are carried from the latest right
    row with ``right[ts] <= left[ts]`` per ``on`` key (null when no
    such row). Output = all left columns + ``{c}{suffix}`` per carried
    column.

    All carried columns travel as ONE struct through a single
    ``last(ignorenulls=True)``: the struct is non-null whenever a right
    row exists, so (a) a legitimately-NULL value on the latest right
    row propagates as NULL instead of bleeding an older row's value
    forward, and (b) every carried column comes from the SAME right
    row — carrying columns independently could stitch together a row
    that never existed. (Also one window expression instead of
    len(right_cols).)
    """
    carried = [f"{c}{suffix}" for c in right_cols]
    rhs = right.select(
        F.col(on), F.col(ts), F.lit(0).alias(_SIDE),
        F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
    )
    lhs = left.select(
        F.col(on), F.col(ts), F.lit(1).alias(_SIDE),
        F.lit(None).cast(rhs.schema["__r"].dataType).alias("__r"),
        F.struct(*left.columns).alias("__row"),
    )
    rhs = rhs.withColumn("__row", F.lit(None).cast(lhs.schema["__row"].dataType))
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = lhs.unionByName(rhs).withColumn("__r", F.last("__r", ignorenulls=True).over(w))
    return unioned.filter(F.col(_SIDE) == 1).select(
        "__row.*", *[F.col(f"__r.{c}").alias(a) for c, a in zip(right_cols, carried)]
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_cols: list[str],
    suffix: str = "_asof",
    n_buckets: int = 32,
    bounds: tuple | None = None,
) -> DataFrame:
    """Hot-key-proof as-of join: identical semantics to ``asof_join``,
    with each key's timeline split into ``n_buckets`` ts-RANGE buckets
    so the window partitions on (key, bucket) — a single conversation
    with 10^8 events spreads over n_buckets tasks instead of one.

    Measured motivation (local[32], 6M-row union): balanced keys 1.5 s;
    same volume with ONE key holding half the rows 3.0 s — the hot key
    serializes into a single window task (the plain operator's only
    skew exposure). At that size this variant lands at 2.8 s (identical
    results): the carry machinery + bounds pass roughly cancel the
    parallelism win, because sorting 3M slim rows in one task is still
    cheap. The gap grows with per-key cardinality — plain is a
    single-task O(n log n) on the hot key, bucketed is n_buckets-way
    parallel — so reach for this when one key's rows exceed ~10^7.

    Mechanics: bucket = ts range position over [min, max] (``bounds``
    skips the bounds pass when the caller knows them, e.g. a day's
    partition). Cross-bucket correctness comes from CARRY-IN rows: per
    (key, bucket), the latest right row of any EARLIER bucket is
    replayed into the bucket as an ordinary right row (its real ts is
    strictly below everything in the bucket, so ordering needs no
    special casing). The carry spine is ≤ keys × n_buckets rows — tiny
    — and is the only cross-bucket dependency, computed with one
    window over bucket ordinals, not events.
    """
    carried = [f"{c}{suffix}" for c in right_cols]
    if bounds is None:
        row = (
            left.select(F.col(ts).alias("t"))
            .unionByName(right.select(F.col(ts).alias("t")))
            .agg(F.min("t").alias("lo"), F.max("t").alias("hi"))
            .collect()[0]
        )
        bounds = (row["lo"], row["hi"])
    temporal = left.schema[ts].dataType.typeName() in ("timestamp", "timestamp_ntz", "date")

    def as_num(col):  # temporal → epoch micros; numeric → double
        if temporal:
            return F.unix_micros(col.cast("timestamp")).cast("double")
        return col.cast("double")

    lo_d = as_num(F.lit(bounds[0]))
    # epsilon floor keeps the all-ts-equal case at bucket 0 (no div-by-0)
    span = F.greatest((as_num(F.lit(bounds[1])) - lo_d) / F.lit(n_buckets), F.lit(1e-9))

    def bucket_of(col):
        b = F.floor((as_num(col) - lo_d) / span)
        return F.least(F.lit(n_buckets - 1), F.greatest(F.lit(0), b)).cast("int")

    rstruct = F.struct(*[F.col(c) for c in right_cols])
    rhs = right.select(
        F.col(on), F.col(ts), F.lit(0).alias(_SIDE), rstruct.alias("__r"),
        bucket_of(F.col(ts)).alias("__b"),
    )
    lhs = left.select(
        F.col(on), F.col(ts), F.lit(1).alias(_SIDE),
        F.lit(None).cast(rhs.schema["__r"].dataType).alias("__r"),
        bucket_of(F.col(ts)).alias("__b"),
        F.struct(*left.columns).alias("__row"),
    )
    rhs = rhs.withColumn("__row", F.lit(None).cast(lhs.schema["__row"].dataType))

    # per-(key,bucket) latest right row → running carry across buckets
    win_rb = rhs.groupBy(on, "__b").agg(
        F.max_by(F.struct(F.col(ts).alias("__cts"), F.col("__r").alias("__cr")), F.col(ts)).alias("__w")
    )
    spine = (
        lhs.select(on, "__b").unionByName(rhs.select(on, "__b")).distinct()
        .join(win_rb, [on, "__b"], "left")
    )
    wprev = (
        Window.partitionBy(on).orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carries = (
        spine.withColumn("__carry", F.last("__w", ignorenulls=True).over(wprev))
        .filter(F.col("__carry").isNotNull())
        .select(
            F.col(on), F.col("__carry.__cts").alias(ts), F.lit(0).alias(_SIDE),
            F.col("__carry.__cr").alias("__r"), F.col("__b"),
            F.lit(None).cast(lhs.schema["__row"].dataType).alias("__row"),
        )
    )

    w = (
        Window.partitionBy(on, "__b")
        .orderBy(F.col(ts).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = lhs.unionByName(rhs).unionByName(carries).withColumn(
        "__r", F.last("__r", ignorenulls=True).over(w)
    )
    return unioned.filter(F.col(_SIDE) == 1).select(
        "__row.*", *[F.col(f"__r.{c}").alias(a) for c, a in zip(right_cols, carried)]
    )
