"""Deterministic sampling / dataset-split operators for training-data
pipelines.

A 100 TB corpus can't be split train/val/test with a random() column:
re-runs must assign every row identically, late-arriving rows must land
in a stable split, and no coordination (no global sort, no persisted
assignment table) should be needed. The standard trick is hash-mod
bucketing on the example id — pure per-row arithmetic, embarrassingly
parallel, reproducible from (seed, id) alone.

Two hash tiers, same shape as operators/dedup.py: xxhash64 (production
— fixed-width JVM hash, codegen'd) and a portable md5-prefix tier that
DuckDB reproduces bit-identically so splits are oracle-checkable.

The same bucketing gives deterministic *downsampling*: keep a row iff
its bucket < rate·resolution — e.g. stratified per-language corpus
balancing — without materializing per-stratum counts first.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEXD = "0123456789abcdef"
RESOLUTION = 10_000  # split fractions quantized to 0.01%


def _bucket(id_col: Column, seed: str, portable_hash: bool) -> Column:
    sid = F.concat(F.lit(f"{seed}:"), id_col.cast("string"))
    if portable_hash:
        h = F.conv(F.substring(F.md5(sid), 1, 8), 16, 10).cast("long")
        return h % RESOLUTION
    # pmod, not abs(...)%: abs(Long.MIN_VALUE) overflows back to
    # MIN_VALUE (or throws under ANSI), yielding a negative bucket.
    return F.pmod(F.xxhash64(sid), F.lit(RESOLUTION))


def _bucket_sql(id_expr: str, seed: str) -> str:
    """DuckDB rendering of the portable tier: the leading 8 hex chars
    of md5 parsed positionally (DuckDB has no base-conv builtin)."""
    m = f"md5(concat('{seed}:', CAST({id_expr} AS VARCHAR)))"
    digits = " + ".join(
        f"(strpos('{_HEXD}', substr({m}, {i + 1}, 1)) - 1) * {16 ** (7 - i)}" for i in range(8)
    )
    return f"(CAST({digits} AS BIGINT) % {RESOLUTION})"


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: Mapping[str, float],
    seed: str = "s0",
    portable_hash: bool = False,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hash-mod bucket. ``splits``
    maps name → fraction (must sum to 1); assignment depends only on
    (seed, id), so it is stable across runs, partitions and appends."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    b = _bucket(F.col(id_col), seed, portable_hash)
    expr = None
    acc = 0.0
    for name, frac in splits.items():
        acc += frac
        thr = int(round(acc * RESOLUTION))
        expr = F.when(b < thr, name) if expr is None else expr.when(b < thr, name)
    return df.withColumn(out_col, expr)


def hash_split_sql(id_expr: str, splits: Mapping[str, float], seed: str = "s0") -> str:
    """ANSI-SQL CASE expression equivalent to the portable-hash tier of
    ``hash_split`` (for DuckDB oracles)."""
    b = _bucket_sql(id_expr, seed)
    acc = 0.0
    arms = []
    for name, frac in list(splits.items())[:-1]:
        acc += frac
        arms.append(f"WHEN {b} < {int(round(acc * RESOLUTION))} THEN '{name}'")
    last = list(splits)[-1]
    return "CASE " + " ".join(arms) + f" ELSE '{last}' END"


def hash_sample(
    df: DataFrame,
    id_col: str,
    rate: float,
    seed: str = "s0",
    portable_hash: bool = False,
) -> DataFrame:
    """Deterministic ``rate``-fraction downsample: keep a row iff its
    hash bucket falls below rate·RESOLUTION. Unlike ``df.sample``, the
    kept set is a pure function of (seed, id) — re-runs, retries and
    different partitionings all keep exactly the same rows."""
    return df.filter(_bucket(F.col(id_col), seed, portable_hash) < int(round(rate * RESOLUTION)))


def hash_sample_sql(id_expr: str, rate: float, seed: str = "s0") -> str:
    """DuckDB predicate equivalent to the portable tier of hash_sample."""
    return f"{_bucket_sql(id_expr, seed)} < {int(round(rate * RESOLUTION))}"


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: Mapping[str, float],
    default_rate: float = 1.0,
    id_col: str = "doc_id",
    seed: str = "s0",
    portable_hash: bool = False,
) -> DataFrame:
    """Per-stratum deterministic downsample — corpus rebalancing (cap
    the dominant languages/sources, keep the long tail whole) without
    materializing per-stratum counts first: each stratum gets its own
    keep-threshold over the SAME hash bucketing, so the kept set stays
    a pure function of (seed, id) and nests monotonically — lowering a
    stratum's rate only removes rows, never swaps them (crucial when a
    rebalanced corpus must stay a subset of the previous cut)."""
    thr = None
    for name, rate in rates.items():
        t = F.lit(int(round(rate * RESOLUTION)))
        thr = F.when(F.col(strata_col) == name, t) if thr is None else thr.when(
            F.col(strata_col) == name, t
        )
    thr = (
        F.lit(int(round(default_rate * RESOLUTION)))
        if thr is None
        else thr.otherwise(F.lit(int(round(default_rate * RESOLUTION))))
    )
    return df.filter(_bucket(F.col(id_col), seed, portable_hash) < thr)


def stratified_sample_sql(
    id_expr: str,
    strata_expr: str,
    rates: Mapping[str, float],
    default_rate: float = 1.0,
    seed: str = "s0",
) -> str:
    """DuckDB predicate equivalent to the portable tier."""
    arms = " ".join(
        f"WHEN '{name}' THEN {int(round(rate * RESOLUTION))}" for name, rate in rates.items()
    )
    default = int(round(default_rate * RESOLUTION))
    case = f"CASE {strata_expr} {arms} ELSE {default} END" if arms else str(default)
    return f"{_bucket_sql(id_expr, seed)} < ({case})"
