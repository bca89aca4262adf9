"""Property-based tests (hypothesis) for the change-data-feed algebra:
for ANY pair of keyed tables, applying table_diff(old→new) onto old
must reproduce new exactly, diff(a, a) must be empty, and the pre/post
feed's signed deltas must re-derive any additive aggregate."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oec_etl_spark.operators.cdf import CHANGE_TYPE, table_diff, table_diff_pre_post

SCHEMA = "k int, s string, v long"

# small key domain to force inserts/deletes/updates/unchanged to coexist;
# None values exercise the null-safe change test
_row = st.tuples(
    st.integers(0, 7),
    st.one_of(st.none(), st.sampled_from(["x", "y"])),
    st.one_of(st.none(), st.integers(0, 3)),
)
_table = st.lists(_row, max_size=10, unique_by=lambda r: r[0])


def _apply(old_rows, feed_rows):
    state = {r[0]: r for r in old_rows}
    for r in feed_rows:
        k, s, v, ct = r
        if ct == "delete":
            state.pop(k, None)
        elif ct in ("insert", "update_postimage"):
            state[k] = (k, s, v)
    return sorted(state.values())


@pytest.mark.usefixtures("spark")
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(old=_table, new=_table)
def test_diff_apply_reproduces_new(spark, old, new):
    o = spark.createDataFrame(old, SCHEMA) if old else spark.createDataFrame([], SCHEMA)
    n = spark.createDataFrame(new, SCHEMA) if new else spark.createDataFrame([], SCHEMA)
    feed = [(r["k"], r["s"], r["v"], r[CHANGE_TYPE]) for r in table_diff(o, n, keys=("k",)).collect()]
    assert _apply(old, feed) == sorted((r[0], r[1], r[2]) for r in new)


@pytest.mark.usefixtures("spark")
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(t=_table)
def test_diff_self_is_empty(spark, t):
    df = spark.createDataFrame(t, SCHEMA) if t else spark.createDataFrame([], SCHEMA)
    assert table_diff(df, df, keys=("k",)).count() == 0


@pytest.mark.usefixtures("spark")
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(old=_table, new=_table)
def test_pre_post_signed_count_delta(spark, old, new):
    """sum over the feed of sign(change_type) == |new| - |old| — the
    invariant incremental view maintenance rests on."""
    o = spark.createDataFrame(old, SCHEMA) if old else spark.createDataFrame([], SCHEMA)
    n = spark.createDataFrame(new, SCHEMA) if new else spark.createDataFrame([], SCHEMA)
    sign = {"insert": 1, "update_postimage": 1, "update_preimage": -1, "delete": -1}
    feed = table_diff_pre_post(o, n, keys=("k",)).collect()
    assert sum(sign[r[CHANGE_TYPE]] for r in feed) == len(new) - len(old)
