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
# LWW rank: 0 = snapshot-read bootstrap (op 'R'), 1 = streamed change.
# Leading the order tuple, it makes ANY streamed row (and any stored
# row, which was streamed once) beat a snapshot read regardless of ts —
# the Debezium incremental-snapshot rule: reads fill gaps, never race.
_RANK = "__rank"


def lww_reduce(
    changes: DataFrame,
    keys: Sequence[str] = KEY_COLUMNS,
    order: Sequence[str] = ORDER_COLUMNS,
    salt: int | None = None,
    hot_ids: Sequence[str] | None = None,
    hot_col: str = "conv_id",
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

    if salt and hot_ids is not None:
        # Skew-split: two-stage only where it pays. Salting a cold key
        # (≤ a few rows) gives the stage-1 groups nothing to combine and
        # doubles its shuffle volume; the hot subset (few conv_ids, huge
        # row share) is exactly where the extra stage collapses data.
        is_hot = F.col(hot_col).isin(list(hot_ids))
        cold = reduce_by(changes.filter(~is_hot), keys)
        salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in order]), F.lit(salt)).cast("int")
        hot1 = reduce_by(changes.filter(is_hot).withColumn(_SALT, salt_col), [*keys, _SALT]).drop(_SALT)
        return cold.unionByName(reduce_by(hot1, keys))
    if salt:
        salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in order]), F.lit(salt)).cast("int")
        partial = reduce_by(changes.withColumn(_SALT, salt_col), [*keys, _SALT]).drop(_SALT)
        return reduce_by(partial, keys)
    return reduce_by(changes, keys)


def lww_reduce_hash(
    changes: DataFrame,
    keys: Sequence[str] = KEY_COLUMNS,
    order: Sequence[str] = ORDER_COLUMNS,
    salt: int | None = None,
    hot_ids: Sequence[str] | None = None,
    hot_col: str = "conv_id",
) -> DataFrame:
    """LWW winner selection that never sorts the payload.

    ``max_by(struct(payload), struct(order))`` carries a variable-length
    aggregation buffer (the payload has strings), which Spark cannot put
    in the codegen'd hash map — the plan degrades to SortAggregate and
    every payload row is SORTED twice (partial + final). Measured on the
    6M-event bench this sort dominates the merge stage.

    This variant aggregates only the slim (keys, order) projection —
    ~40 B/row instead of ~300 B, so even its SortAggregate fallback is
    cheap — then fetches the winners' payload with a LEFT SEMI
    shuffle-hash join (hinted: no sort on either side, the payload
    crosses the wire exactly once):

        wins   = slim.groupBy(keys).agg(max(struct(*order)))
        merged = changes ⟕semi wins on (keys, *order)

    REQUIREMENT: ``order`` must be unique per physical row within each
    key (else the semi-join keeps several identical winners). The sink
    guarantees this by extending the order with (xxhash64(source_file),
    offset) — two fixed-width longs that differ across redeliveries of
    the same event — and falls back to the sort strategy for batches
    that lack those lineage columns (see ``ParquetSnapshotSink.merge``).

    The winner join uses NULL-SAFE equality (``<=>``) on every key and
    order column: the change schema declares ``ts`` nullable, and a
    plain equality join would silently drop any key whose winning row
    carries a NULL order value (NULL = NULL is never true), making the
    hash and sort strategies disagree on schema-legal input.

    ``salt``/``hot_ids`` apply the explicit two-stage hot-key split to
    the slim aggregate (cheap insurance; the payload join's skew is
    additionally covered by AQE skew-join splitting).
    """
    keys = list(keys)
    order = [c for c in order if c in changes.columns and c not in keys]

    def slim_agg(df: DataFrame, group_cols: list[str]) -> DataFrame:
        return df.groupBy(*group_cols).agg(F.max(F.struct(*[F.col(c) for c in order])).alias("_ord"))

    slim = changes.select(*keys, *order)
    if salt and hot_ids is not None:
        is_hot = F.col(hot_col).isin(list(hot_ids))
        salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in order]), F.lit(salt)).cast("int")
        hot1 = slim_agg(slim.filter(is_hot).withColumn(_SALT, salt_col), [*keys, _SALT]).drop(_SALT)
        hot1 = hot1.select(*keys, *[F.col(f"_ord.{c}").alias(c) for c in order])
        wins = slim_agg(slim.filter(~is_hot), keys).unionByName(
            slim_agg(hot1, keys)
        )
    else:
        wins = slim_agg(slim, keys)
    flat = wins.select(*keys, *[F.col(f"_ord.{c}").alias(c) for c in order]).hint("shuffle_hash")
    lhs, rhs = changes.alias("__lww_l"), flat.alias("__lww_r")
    cond = None
    for c in [*keys, *order]:
        e = F.col(f"__lww_l.{c}").eqNullSafe(F.col(f"__lww_r.{c}"))
        cond = e if cond is None else cond & e
    return lhs.join(rhs, cond, "left_semi")


def materialize(
    changes: DataFrame,
    keys: Sequence[str] = KEY_COLUMNS,
    ops: Sequence[str] | None = None,
) -> DataFrame:
    """One-shot batch materialization: LWW winners minus deletes.

    This is also the *oracle* shape used by the replay-equivalence
    tests (FIXTURES.md F5): trivially correct, auditable in one line.

    ``ops``: the op codes present in ``changes``, when the caller
    already knows them (the streaming sink gets them from its single
    job-A stats pass; a test knows its generator config) — passing
    them skips the strategy-probe job entirely. A SUPERSET is safe
    (unconditional 'T'/'R'/'P' handling is correct, just costlier);
    omitting an op that IS present is not. When not supplied, presence
    of the three plan-changing ops is probed with ONE map-side-combined
    boolean aggregate (3 ints cross the wire), not a distinct+collect.

    Logs containing op='P' partial updates route through the
    per-column combine instead (patches set only their non-null
    columns; orphan patches vanish with their nonexistent key). Note
    the batch-split caveat: one-shot materialization equals a
    multi-batch replay only for logs whose full rows arrive in LWW
    order relative to patches (see lww_patch_combine).

    op='T' (table truncate) rows define a horizon — max ts over the
    truncate events — and every row with ts <= horizon is dead; rows
    with NULL ts are kept (no ordering evidence, same stance as
    tombstone expiry). op='R' (snapshot-read bootstrap) rows rank
    BELOW every streamed row in the LWW order: a snapshot read
    creates a key that nothing else defines but never overwrites or
    outranks streamed data, however its ts compares."""
    if ops is not None:
        present = set(ops)
    else:
        flags = changes.agg(
            *[
                F.max((F.col("op") == o).cast("int")).alias(o)
                for o in ("T", "R", "P")
            ]
        ).first()
        present = {o for o in ("T", "R", "P") if flags[o]}
    base, order = changes, ORDER_COLUMNS
    if "T" in present:
        hi = base.filter(F.col("op") == "T").agg(F.max("ts")).first()[0]
        base = base.filter(F.col("op") != "T")
        if hi is not None:
            base = base.filter(F.col("ts").isNull() | (F.col("ts") > F.lit(hi)))
    if "R" in present:
        base = base.withColumn(_RANK, (F.col("op") != "R").cast("int"))
        order = (_RANK, *ORDER_COLUMNS)
    if "P" in present:
        payload = [
            c for c in base.columns
            if c not in ("op", "seq", "source_file", "offset", _RANK)
        ]
        winners = lww_patch_combine(base, payload_cols=payload, keys=keys, order=order)
        alive = winners.filter(F.col("op").isNotNull() & (F.col("op") != F.lit("D")))
        return alive.drop("op", "seq", "__n_patch")
    winners = lww_reduce(base, keys=keys, order=order)
    alive = winners.filter(F.col("op") != F.lit("D"))
    drop = [c for c in ("op", "seq", "source_file", "offset", _RANK) if c in alive.columns]
    return alive.drop(*drop)


def lww_patch_combine(
    union: DataFrame,
    payload_cols: Sequence[str],
    keys: Sequence[str] = KEY_COLUMNS,
    order: Sequence[str] = ("ts", "seq"),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Column-level LWW for partial updates (op ``'P'``).

    Semantics: a FULL row (I/U/D — including the stored row lifted back
    into change shape) *defines every payload column*; a PATCH row
    defines only the payload columns it carries non-null (a patch can
    set, never null-out — Debezium-style partial images). Each column
    independently takes the value of the latest defining row under
    ``order``; row existence and the winning ``op``/``seq`` come from
    full rows only, so patches never create or delete rows. When the
    full-row winner is a delete, patch values are discarded (no
    resurrection, and the tombstone's LWW position is not advanced).

    This is still a per-column semilattice — idempotent, commutative,
    associative — so redelivered patches are absorbed exactly like
    redelivered full rows, and the aggregate gets map-side combine.

    Output: one row per key with the final payload, ``op``/``seq`` of
    the winner, ``__n_patch`` (patch rows seen for the key; for keys
    with NO full row ``op`` is NULL — the caller drops and counts
    these orphans). ``max_cols`` are carried through with max() (for
    per-key constants like the bucket id, and for boolean flags where
    any-true is wanted)."""
    keys = list(keys)
    order = [c for c in order if c in union.columns and c not in keys]
    ord_all = F.struct(*[F.col(c) for c in order])
    is_patch = F.col("op") == "P"
    ord_full = F.when(is_patch, F.lit(None)).otherwise(ord_all)

    aggs = [
        F.max_by(F.col("op"), ord_full).alias("__op_full"),
        F.max_by(F.col("seq"), ord_full).alias("__seq_full"),
        F.max_by(F.col("seq"), ord_all).alias("__seq_all"),
        F.sum(is_patch.cast("long")).alias("__n_patch"),
    ]
    for c in payload_cols:
        if c in keys:
            continue
        ord_c = F.when(is_patch & F.col(c).isNull(), F.lit(None)).otherwise(ord_all)
        aggs.append(F.max_by(F.col(c), ord_c).alias(f"__all_{c}"))
        aggs.append(F.max_by(F.col(c), ord_full).alias(f"__full_{c}"))
    for c in max_cols:
        aggs.append(F.max(F.col(c)).alias(f"__max_{c}"))

    g = union.groupBy(*keys).agg(*aggs)
    dead = F.col("__op_full") == "D"
    out_cols: list[F.Column] = [F.col(k) for k in keys]
    for c in payload_cols:
        if c in keys:
            continue
        out_cols.append(
            F.when(dead, F.col(f"__full_{c}")).otherwise(F.col(f"__all_{c}")).alias(c)
        )
    out_cols.append(F.col("__op_full").alias("op"))
    out_cols.append(
        F.when(dead, F.col("__seq_full")).otherwise(F.col("__seq_all")).alias("seq")
    )
    out_cols.append(F.col("__n_patch"))
    for c in max_cols:
        out_cols.append(F.col(f"__max_{c}").alias(c))
    return g.select(*out_cols)
