"""Banded scalar lookup — the reference's one real scalar function.

The reference's ``hs6_converter`` (/root/reference/etl/util.py:1-26) prefixes a
6-digit HS commodity code with its section id chosen by threshold
bands over the leading two digits, applied per row with a Python
lambda (`.apply`, /root/reference/etl/trade_comtrade_monthly_pipeline.py:41) — the
classic per-row anti-pattern. Here the same *semantics* (a banded
lookup; the band table below is the public Harmonized System
chapter→section mapping) is a single chained CASE expression, codegen'd
by Catalyst, and rendered from ONE band table into both a Spark Column
and ANSI SQL so engine and oracle share the definition.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (lo_chapter, hi_chapter, section_id) — public HS section boundaries.
HS_SECTION_BANDS: list[tuple[int, int, int]] = [
    (1, 5, 1), (6, 14, 2), (15, 15, 3), (16, 24, 4), (25, 27, 5),
    (28, 38, 6), (39, 40, 7), (41, 43, 8), (44, 46, 9), (47, 49, 10),
    (50, 63, 11), (64, 67, 12), (68, 70, 13), (71, 71, 14), (72, 83, 15),
    (84, 85, 16), (86, 89, 17), (90, 92, 18), (93, 93, 19), (94, 96, 20),
    (97, 99, 21),
]


def hs_section(hs2: Column) -> Column:
    """Section id (1-21) for an integer leading-two-digit chapter."""
    expr = F.lit(None).cast("int")
    # build from the last band backwards so the first band is outermost
    for lo, hi, sec in reversed(HS_SECTION_BANDS):
        expr = F.when((hs2 >= lo) & (hs2 <= hi), F.lit(sec)).otherwise(expr)
    return expr


def hs6_id(hs6_code: Column) -> Column:
    """Section-prefixed numeric id for a zero-padded 6-char HS code:
    section * 1_000_000 + int(code) (same shape as the reference's
    chapter-prefixed int)."""
    code = F.lpad(hs6_code, 6, "0")
    hs2 = F.substring(code, 1, 2).cast("int")
    return (hs_section(hs2).cast("long") * 1_000_000 + code.cast("long")).alias("hs6_id")


def hs_section_sql(hs2_expr: str) -> str:
    """The identical banded lookup as ANSI SQL (for the DuckDB oracle)."""
    whens = " ".join(
        f"WHEN {hs2_expr} BETWEEN {lo} AND {hi} THEN {sec}" for lo, hi, sec in HS_SECTION_BANDS
    )
    return f"(CASE {whens} ELSE NULL END)"


def hs6_id_sql(code_expr: str) -> str:
    padded = f"lpad({code_expr}, 6, '0')"
    hs2 = f"CAST(substr({padded}, 1, 2) AS INT)"
    return f"(CAST({hs_section_sql(hs2)} AS BIGINT) * 1000000 + CAST({padded} AS BIGINT))"
