"""Z-order layout: key correctness and the file-skipping property.

The oracle query (events_zorder_key) proves Spark/DuckDB parity of the
key itself; these tests pin (1) the bit-interleave against hand-computed
values, (2) monotone normalization at the range edges, and (3) the
actual layout payoff — a z-ordered write must let file-level min/max
stats prune BOTH dimensions, where a single-column sort prunes only its
leading column.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from oec_etl_spark.operators.layout import (
    files_matching_box,
    with_zorder_key,
    write_zordered,
)

X = "user_id"
Y = "unix_micros(cast(ts as timestamp))"
SF = "/root/testdata/sf0.01"


def _keys(spark, rows, bits=2):
    """z-keys for tiny integer frames where ranks == raw values:
    bounds (0, 2^bits - 1) make the normalization an identity."""
    hi = (1 << bits) - 1
    df = spark.createDataFrame([Row(x=x, y=y) for x, y in rows])
    from oec_etl_spark.functions.zorder import zorder_key_expr

    key = zorder_key_expr("x", "0", str(hi), "y", "0", str(hi), bits, "spark")
    out = df.selectExpr("x", "y", f"{key} as z").collect()
    return {(r["x"], r["y"]): r["z"] for r in out}


def test_interleave_matches_hand_computed(spark):
    # bits=2: z = x0 + 2*y0 + 4*x1 + 8*y1
    got = _keys(spark, [(1, 0), (0, 1), (3, 0), (0, 3), (2, 1), (3, 3)])
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(3, 0)] == 5
    assert got[(0, 3)] == 10
    assert got[(2, 1)] == 6
    assert got[(3, 3)] == 15


def test_key_covers_full_width_at_range_edges(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    keyed = with_zorder_key(ev, X, Y, key_col="z")
    lo, hi = keyed.agg(F.min("z"), F.max("z")).first()
    assert lo >= 0
    assert hi < 1 << 32  # 16+16 bits interleaved
    assert hi > 1 << 31  # top bit actually reached at the max corner


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "linear")
    write_zordered(ev, zpath, X, Y, n_files=16)
    (
        ev.repartitionByRange(16, F.col("user_id"))
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    exprs = {"u": X, "t": Y}
    t0 = int(dt.datetime(2024, 1, 10).timestamp() * 1e6)
    t1 = int(dt.datetime(2024, 1, 11).timestamp() * 1e6)
    ts_box = {"t": (t0, t1)}  # 1 day of 30 — selective on ts only
    u_box = {"u": (40, 54)}  # 15 users of 150 — selective on user only

    z_ts, n = files_matching_box(spark, zpath, exprs, ts_box)
    z_u, _ = files_matching_box(spark, zpath, exprs, u_box)
    l_ts, _ = files_matching_box(spark, lpath, exprs, ts_box)
    l_u, _ = files_matching_box(spark, lpath, exprs, u_box)

    assert n == 16
    # linear-by-user: perfect on user, useless on ts (every file spans all time)
    assert l_u <= 3 and l_ts == 16
    # z-order: prunes BOTH dims (measured 5 and 6 of 16; allow slack for
    # range-exchange sampling variation)
    assert z_ts <= 9, f"z-layout read {z_ts}/16 files for the ts box"
    assert z_u <= 9, f"z-layout read {z_u}/16 files for the user box"
    # and the written data is intact
    assert spark.read.parquet(zpath).count() == ev.count()
    assert "__z" not in spark.read.parquet(zpath).columns


def test_zorder_write_roundtrips_rows_exactly(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    path = str(tmp_path / "z")
    write_zordered(ev, path, X, Y, n_files=8)
    back = spark.read.parquet(path)
    assert back.columns == ev.columns or sorted(back.columns) == sorted(ev.columns)
    assert back.exceptAll(ev).count() == 0
    assert ev.exceptAll(back).count() == 0
