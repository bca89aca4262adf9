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
