"""Property test (hypothesis): maintenance never changes the table.

For ANY interleaving of merges with minor and major compactions over a
merge-on-read table, (a) each maintenance op leaves the visible table
byte-identical, and (b) the final state equals the batch oracle over
everything merged — the associativity claim the mor design rests on
(read-time LWW == fold-deltas-then-LWW == rewrite-everything-LWW),
exercised across op orders a hand-written test would never enumerate.
"""

from __future__ import annotations

import datetime
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oec_etl_spark.operators.lww import materialize
from oec_etl_spark.schemas import CHANGE_SCHEMA
from oec_etl_spark.streaming.sink import ParquetSnapshotSink

# tiny domains so inserts/updates/deletes/ts-ties collide constantly
_event = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.integers(0, 4),  # conv
    st.integers(0, 1),  # turn
    st.integers(0, 4),  # ts hour (ties exercise the seq tiebreak)
)
_ops = st.lists(
    st.one_of(
        st.tuples(st.just("merge"), st.lists(_event, min_size=1, max_size=5)),
        st.just("minor"),
        st.just("major"),
    ),
    min_size=3,
    max_size=7,
)


def _rows(events, seq0):
    out = []
    for i, (op, conv, turn, h) in enumerate(events):
        dead = op == "D"
        out.append((
            seq0 + i, op, f"c{conv}", turn,
            None if dead else "user",
            None if dead else f"t{seq0 + i}",
            None,
            datetime.datetime(2024, 1, 1, h),
            f"s{seq0 + i}", seq0 + i,
        ))
    return out


@pytest.mark.usefixtures("spark")
@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=_ops, fanout=st.sampled_from([1, 2, 3]),
       ts_split=st.sampled_from([1, 3]))
def test_maintenance_interleavings_preserve_table(spark, ops, fanout, ts_split):
    root = tempfile.mkdtemp(prefix="mnt-prop-")
    sink = ParquetSnapshotSink(spark, root, 4, table_mode="mor",
                               files_per_bucket=fanout)
    merged: list[tuple] = []
    seq = 0

    def table():
        try:
            df = sink.read_table()
        except FileNotFoundError:  # maintenance before any merge
            return []
        return sorted(map(tuple, df.select(*sorted(df.columns)).collect()))

    for i, op in enumerate(ops):
        if isinstance(op, tuple):
            rows = _rows(op[1], seq)
            seq += len(rows)
            merged += rows
            sink.merge(spark.createDataFrame(rows, CHANGE_SCHEMA), batch_id=i)
        else:
            before = table()
            (sink.compact_minor(min_deltas=1) if op == "minor"
             else sink.compact(ts_split_files=ts_split))
            assert table() == before  # maintenance is invisible
    if merged:
        oracle = materialize(spark.createDataFrame(merged, CHANGE_SCHEMA))
        assert table() == sorted(
            map(tuple, oracle.select(*sorted(oracle.columns)).collect())
        )
