"""Row-level transform operators — SURVEY.md §2.2 (P1-P16), Spark-first.

Each function is the idiomatic-Spark re-expression of a pandas idiom in
the reference (cited per function). They are thin by design: the point
is that every one of them stays a Catalyst expression (pushdown-able,
codegen'd), never a Python callback.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def project(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """P1 — explicit select-list (ref: trade_comtrade_monthly_pipeline.py:46-56).
    Catalyst pushes the pruning into the parquet scan (ReadSchema)."""
    return df.select(*cols)


def drop_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """P2 — ref: dim_countries_pipeline.py:45."""
    return df.drop(*cols)


def rename(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """P3 — ref: countries/brazil/ncm_pipeline.py:35-36."""
    return df.withColumnsRenamed(dict(mapping))


def filter_not_in(df: DataFrame, col: str, values: Sequence) -> DataFrame:
    """P4 — drop aggregate/'TOTAL'/'World' pollution rows
    (ref: trade_comtrade_monthly_pipeline.py:33-36). Pushed to the scan.

    NULL parity with the pandas original: ``df.drop(df[col == v].index)``
    never matches NaN, so NULL rows are KEPT. Bare ``~isin()`` would
    silently drop them on three-valued logic; the explicit
    ``IS NULL OR NOT IN`` form keeps them AND still pushes to the scan
    (Or(IsNull, Not(In)) is a supported parquet filter)."""
    c = F.col(col)
    return df.filter(c.isNull() | ~c.isin(list(values)))


def drop_null_keys(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """P5 — ref: trade_comtrade_monthly_pipeline.py:38."""
    return df.na.drop(subset=list(cols))


def fill_then_cast(df: DataFrame, col: str, fill, dtype: str) -> DataFrame:
    """P6/P7 — fillna-then-astype (ref: trade_comtrade_monthly_pipeline.py:30-31)."""
    return df.withColumn(col, F.coalesce(F.col(col), F.lit(fill)).cast(dtype))


def zfill(col: Column, width: int) -> Column:
    """P9 — str.zfill (ref: dim_hs_pipeline.py:19-22)."""
    return F.lpad(col, width, "0")


def concat_id(*cols: Column) -> Column:
    """P10 — string-concat hierarchy ids (ref: dim_hs_pipeline.py:27-32)."""
    return F.concat(*cols)


def substr_strip(col: Column, start: int, length: int | None = None) -> Column:
    """P12 — slicing recodes (ref: countries/russia/trade_monthly_pipeline.py:39-41)."""
    if length is None:
        return F.substring(col, start, 2**31 - 1)
    return F.substring(col, start, length)


def dict_recode(col: Column, mapping: Mapping, default=None) -> Column:
    """P14 — tiny dict-map recode as a when-chain (ref:
    countries/russia/trade_monthly_pipeline.py:36). For real mappings
    (hundreds+ of entries) prefer a broadcast-join against a dim — see
    ``broadcast_recode``."""
    expr: Column = F.lit(default)
    for k, v in reversed(list(mapping.items())):
        expr = F.when(col == F.lit(k), F.lit(v)).otherwise(expr)
    return expr


def broadcast_recode(
    df: DataFrame, key: str, dim: DataFrame, dim_key: str, how: str = "left"
) -> DataFrame:
    """S6/P14 at scale — side-input lookup as an explicit broadcast hash
    join (ref: countries/brazil/ncm_pipeline.py:40-43 reads a side CSV into a
    dict). Broadcasting the dim removes the shuffle entirely."""
    return df.join(F.broadcast(dim), df[key] == dim[dim_key], how)


def lossy_int(col: Column, default: int = 0) -> Column:
    """P16 — try-int-except-default (ref: countries/sweden/trade_monthly_pipeline.py:80-85):
    a failed cast yields NULL, coalesced to the default. Vectorized, no
    exception handling in the data path."""
    return F.coalesce(col.cast("long"), F.lit(default))


def constant_from_param(value) -> Column:
    """P15 — param-derived constant column (ref: countries/brazil/ncm_pipeline.py:30-31)."""
    return F.lit(value)
