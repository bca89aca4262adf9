"""Last-writer-wins reduction — the heart of the CDC merge.

Semantics (north star): per key (conv_id, turn_idx) keep the change with
the greatest (ts, turn_idx, seq) — LWW on event time, deterministic
tiebreak. The reference's closest ancestor is keep-first dedup via a
Python set (/root/reference/etl/dim_eb_pipeline.py:43-55); here it is a
single ``groupBy(...).agg(max_by(...))``.

Why ``max_by(struct(payload), struct(order))`` instead of a
row_number window:
- the aggregate gets map-side partial aggregation (combine before the
  shuffle) — on a duplicate-heavy 10^10-event log the shuffle carries
  ~one row per key per map partition instead of every event;
- a window would require a full sort of every event within each hash
  partition; we only ever need the max.

The reduction is a *semilattice*: idempotent, commutative, associative.
Re-applying any subset of already-applied events can never change the
result — this is what lets exactly-once degrade gracefully to
effectively-once under at-least-once delivery (SURVEY.md §7.3 R2).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oec_etl_spark.schemas import KEY_COLUMNS, ORDER_COLUMNS


_SALT = "__salt"


def lww_reduce(
    changes: DataFrame,
    keys: Sequence[str] = KEY_COLUMNS,
    order: Sequence[str] = ORDER_COLUMNS,
    salt: int | None = None,
) -> DataFrame:
    """Reduce a change set to one winning row per key.

    Output columns: keys + every non-key column of `changes` (the
    winner's values), in the original column order.

    ``salt`` enables the explicit hot-key path (north rule): a
    two-stage reduce where stage 1 groups by (keys, salt) with the salt
    derived from the event's unique ``seq`` — spreading one hammered
    key over `salt` reducers — and stage 2 reduces the ≤`salt`
    stage-1 winners per key. Correct for any salt because the LWW
    reduction is associative; used by the sink only for batches whose
    frequency sketch actually shows hot conversations, since it costs
    one extra (tiny) shuffle.
    """
    keys = list(keys)
    order = [c for c in order if c in changes.columns and c not in keys]
    payload = [c for c in changes.columns if c not in keys]

    def reduce_by(df: DataFrame, group_cols: list[str]) -> DataFrame:
        win = F.max_by(
            F.struct(*[F.col(c) for c in payload]),
            F.struct(*[F.col(c) for c in order]),
        ).alias("_w")
        out = df.groupBy(*group_cols).agg(win)
        return out.select(*group_cols, *[F.col(f"_w.{c}").alias(c) for c in payload])

    if salt:
        salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in order]), F.lit(salt)).cast("int")
        partial = reduce_by(changes.withColumn(_SALT, salt_col), [*keys, _SALT]).drop(_SALT)
        return reduce_by(partial, keys)
    return reduce_by(changes, keys)


def materialize(changes: DataFrame, keys: Sequence[str] = KEY_COLUMNS) -> DataFrame:
    """One-shot batch materialization: LWW winners minus deletes.

    This is also the *oracle* shape used by the replay-equivalence
    tests (FIXTURES.md F5): trivially correct, auditable in one line.
    """
    winners = lww_reduce(changes, keys=keys)
    alive = winners.filter(F.col("op") != F.lit("D"))
    drop = [c for c in ("op", "seq", "source_file", "offset") if c in alive.columns]
    return alive.drop(*drop)
