"""Z-order (Morton curve) keys for multi-dimensional data layout.

Delta's ``OPTIMIZE ZORDER BY`` / Iceberg's z-order rewrite analog,
built from scratch on portable integer arithmetic: normalize each
dimension to a ``bits``-wide integer rank, then interleave the bits.
Files written in z-key order cover compact axis-aligned rectangles of
the (x, y) space, so file-level min/max stats (parquet footers, or an
Iceberg manifest) prune scans on EITHER dimension — the property a
single-column sort only gives you for its leading column.

Everything here renders the SAME definition into two dialects (the
repo-wide oracle discipline): Spark SQL (``shiftleft``/``shiftright``/
``&``/``div``) and DuckDB (``>>``/``<<``/``&``/``//``). All operations
are exact integer ops — no doubles anywhere — so the engines cannot
drift. The normalization product ``(v - vmin) * 2^bits`` must fit in
int64: with the default 16 bits that allows dimension ranges up to
~1.4e14 (e.g. four years of microsecond timestamps).

Reference analog: none — the reference delegates layout to ClickHouse's
ORDER BY key (a single-path sort; /root/reference/etl/
trade_comtrade_monthly_pipeline.py:108-112). This is the multi-dim
generalization a 100 TB lake table needs.
"""

from __future__ import annotations

DEFAULT_BITS = 16


def _norm(v: str, vmin: str, vmax: str, bits: int, dialect: str) -> str:
    """Rank ``v`` into [0, 2^bits): ((v - vmin) * 2^bits) intdiv
    (vmax - vmin + 1). Exact for non-negative longs in both engines
    (Spark ``div`` and DuckDB ``//`` agree on non-negative operands)."""
    scale = 1 << bits
    den = f"(({vmax}) - ({vmin}) + 1)"
    num = f"((({v}) - ({vmin})) * {scale})"
    op = "div" if dialect == "spark" else "//"
    return f"({num} {op} {den})"


def _interleave(x: str, y: str, bits: int, dialect: str) -> str:
    """Bit-interleave two ``bits``-wide ints: x gets the even bit
    positions, y the odd. Pure shift/mask terms — codegen'd JVM-side in
    Spark, vectorized in DuckDB."""
    terms = []
    for i in range(bits):
        if dialect == "spark":
            terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
            terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})")
        else:
            terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_key_expr(
    x: str, xmin: str, xmax: str,
    y: str, ymin: str, ymax: str,
    bits: int = DEFAULT_BITS,
    dialect: str = "spark",
) -> str:
    """Expression string for the z-key of (x, y). All six value args are
    expressions (columns or literals) in the target dialect; min/max as
    COLUMNS keeps the plan fully declarative — join a broadcast 1-row
    stats frame rather than collecting bounds to the driver."""
    if dialect not in ("spark", "duckdb"):
        raise ValueError(f"unknown dialect {dialect!r}")
    nx = _norm(x, xmin, xmax, bits, dialect)
    ny = _norm(y, ymin, ymax, bits, dialect)
    return f"CAST({_interleave(nx, ny, bits, dialect)} AS BIGINT)"


def interleave_expr(x: str, y: str, bits: int = DEFAULT_BITS, dialect: str = "spark") -> str:
    """Raw interleave of two already-normalized ranks (for callers that
    precompute ranks, e.g. fixed-width ids that need no scaling)."""
    return f"CAST({_interleave(x, y, bits, dialect)} AS BIGINT)"
