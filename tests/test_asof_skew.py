"""Bucketed as-of join: hot-key skew handling (VERDICT item 9).

Measured on local[32], 6M-row unions: balanced keys 1.5 s, one key
holding half the rows 3.0 s — the plain operator's per-key window
serializes the hot key into one task. ``asof_join_bucketed`` splits
each key's timeline into ts-range buckets with carry-in rows; these
tests pin exact equivalence with the plain operator on adversarial
inputs (hot key, empty-right keys, boundary ties, single-ts corpus).
"""

from __future__ import annotations

import random

import pytest

from oec_etl_spark.operators.asof import asof_join, asof_join_bucketed


def _dataset(seed: int, hot_rows: int = 300):
    rng = random.Random(seed)
    left, right = [], {}
    for i in range(300):
        left.append((f"k{rng.randrange(10)}", rng.randrange(500), i))
    for i in range(hot_rows):
        left.append(("HOT", rng.randrange(500), 10_000 + i))
    for i in range(150):  # unique (key, ts) right rows (deterministic winner)
        right[(f"k{rng.randrange(8)}", rng.randrange(500))] = float(i)  # k8,k9 never get right rows
    for i in range(hot_rows // 2):
        right[("HOT", rng.randrange(500))] = float(1000 + i)
    left.append(("lonely", 7, 99_999))  # key with zero right rows
    return left, [(k, t, v) for (k, t), v in right.items()]


@pytest.mark.parametrize("seed,n_buckets", [(3, 5), (4, 32), (5, 1)])
def test_bucketed_asof_equals_plain(spark, seed, n_buckets):
    lrows, rrows = _dataset(seed)
    ldf = spark.createDataFrame(lrows, "k string, ts long, lid long")
    rdf = spark.createDataFrame(rrows, "k string, ts long, val double")
    plain = {(r["lid"], r["val_asof"]) for r in asof_join(ldf, rdf, "k", "ts", ["val"]).collect()}
    buck = {
        (r["lid"], r["val_asof"])
        for r in asof_join_bucketed(ldf, rdf, "k", "ts", ["val"], n_buckets=n_buckets).collect()
    }
    assert buck == plain


def test_bucketed_asof_single_timestamp_and_explicit_bounds(spark):
    ldf = spark.createDataFrame([("a", 5, 1), ("b", 5, 2)], "k string, ts long, lid long")
    rdf = spark.createDataFrame([("a", 5, 9.0)], "k string, ts long, val double")
    out = {  # all ts equal → everything lands in bucket 0, inclusive tie
        (r["lid"], r["val_asof"])
        for r in asof_join_bucketed(ldf, rdf, "k", "ts", ["val"]).collect()
    }
    assert out == {(1, 9.0), (2, None)}
    out2 = {
        (r["lid"], r["val_asof"])
        for r in asof_join_bucketed(
            ldf, rdf, "k", "ts", ["val"], n_buckets=4, bounds=(0, 100)
        ).collect()
    }
    assert out2 == out
