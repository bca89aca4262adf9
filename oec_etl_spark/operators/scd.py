"""Slowly-changing-dimension Type-2 history from a change stream.

The reference materializes only *current* state (every pipeline ends in
a ClickHouse ``if_exists="append"`` load with no history semantics —
/root/reference/etl/trade_comtrade_monthly_pipeline.py:109). A CDC
engine can do better: since the change log carries every version of a
key, the full SCD Type-2 history — each version with its validity
interval — is one window pass away.

Scale design: a single shuffle on the key columns; within each key the
versions are sorted once and ``lead()`` closes each interval with the
next version's start. No self-join (the classic SCD2 anti-pattern of
joining the table to itself on key + date ranges), no second shuffle:
``lead`` and ``is_current`` come from the same window. At 10^10 events
the per-key sort is bounded by the max versions-per-key, and hot keys
are exactly the sink's hot-conversation problem — the caller can
pre-split with the same salting machinery if one key dominates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from oec_etl_spark.schemas import KEY_COLUMNS


def scd2(
    changes: DataFrame,
    keys: Sequence[str] = KEY_COLUMNS,
    order: Sequence[str] = ("ts",),
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Type-2 history: one row per *version* of each key, carrying
    ``[valid_from, valid_to)`` and an ``is_current`` marker.

    ``order`` is the version order within a key (LWW order plus a
    deterministic tiebreak — the same tuple the merge uses). The last
    version per key is open-ended (``valid_to IS NULL``).
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order])
    nxt = F.lead(F.col(ts_col)).over(w)
    return (
        changes.withColumn(valid_from, F.col(ts_col))
        .withColumn(valid_to, nxt)
        .withColumn(current_flag, nxt.isNull())
    )
