"""Change-data-feed: the row-level diff between two table states.

Downstream consumers of a CDC-maintained table usually want the table's
*own* change feed (Delta CDF / Iceberg changelog scan), not the raw
upstream log — post-compaction, post-LWW, one net change per key per
interval. The reference has no analog (append-only ClickHouse loads);
this supplies it for the new engine.

``table_diff`` classifies each key across two snapshots:

- ``insert``  — key exists only in the new state
- ``delete``  — key exists only in the old state (pre-image carried)
- ``update_postimage`` — key exists in both with any non-key column
  changed (post-image carried; ``table_diff_pre_post`` also emits the
  matching ``update_preimage`` row)

Unchanged keys are dropped.

Scale design: one full-outer join on the key columns — a single
co-partitioned shuffle of both states; the change classification and
the changed-column test are pure Column expressions on the joined row
(null-safe ``<=>`` per column, codegen'd, no Python). On the snapshot
sink both sides are bucketed by the same key hash, so at cluster scale
this join shuffles nothing that is already co-located; with Iceberg the
same diff is a metadata-pruned incremental scan between snapshot IDs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oec_etl_spark.schemas import KEY_COLUMNS

CHANGE_TYPE = "_change_type"


def _neq_any(cols: Sequence[str]) -> F.Column:
    """True when any listed column differs (null-safe) between the
    o.-prefixed and n.-prefixed sides of the joined row."""
    tests = [~F.col(f"o_{c}").eqNullSafe(F.col(f"n_{c}")) for c in cols]
    out = F.lit(False)
    for t in tests:
        out = out | t
    return out


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str] = KEY_COLUMNS,
    compare: Sequence[str] | None = None,
) -> DataFrame:
    """Net change feed old→new: one row per inserted/deleted/updated
    key with ``_change_type`` and the post-image (pre-image for
    deletes). ``compare`` limits which columns define "changed"
    (default: every shared non-key column)."""
    value_cols = [c for c in new.columns if c not in keys]
    shared = [c for c in value_cols if c in old.columns]
    cmp_cols = list(compare) if compare is not None else shared
    # side-presence probes: a constant-true marker per side survives the
    # full-outer join as NULL exactly when that side had no matching key
    o = old.select(*keys, F.lit(True).alias("__in_old"), *[F.col(c).alias(f"o_{c}") for c in shared])
    n = new.select(*keys, F.lit(True).alias("__in_new"), *[F.col(c).alias(f"n_{c}") for c in value_cols])
    j = o.join(n, on=list(keys), how="full_outer")
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(_neq_any(cmp_cols), F.lit("update_postimage"))
    )
    out_vals = [
        F.when(F.col("__in_new").isNull(), F.col(f"o_{c}") if c in shared else F.lit(None))
        .otherwise(F.col(f"n_{c}"))
        .alias(c)
        for c in value_cols
    ]
    return (
        j.withColumn(CHANGE_TYPE, change)
        .filter(F.col(CHANGE_TYPE).isNotNull())
        .select(*keys, *out_vals, CHANGE_TYPE)
    )


def table_diff_pre_post(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str] = KEY_COLUMNS,
    compare: Sequence[str] | None = None,
) -> DataFrame:
    """Delta-CDF-shaped feed: updates appear twice, as
    ``update_preimage`` (old values) and ``update_postimage`` (new
    values). Built from one ``table_diff`` plus a keyed semi-join back
    to the old state for the pre-images — both joins on the same key
    partitioning."""
    post = table_diff(old, new, keys, compare)
    upd_keys = post.filter(F.col(CHANGE_TYPE) == "update_postimage").select(*keys)
    shared = [c for c in new.columns if c not in keys and c in old.columns]
    pre = (
        old.join(upd_keys, on=list(keys), how="left_semi")
        .select(*keys, *shared, F.lit("update_preimage").alias(CHANGE_TYPE))
    )
    value_cols = [c for c in new.columns if c not in keys]
    pre_full = pre
    for c in value_cols:
        if c not in shared:
            pre_full = pre_full.withColumn(c, F.lit(None))
    pre_full = pre_full.select(*keys, *value_cols, CHANGE_TYPE)
    return post.unionByName(pre_full)
