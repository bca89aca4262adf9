"""Connected-components algorithms agree; two-phase wins on long chains.

The near-dup survivor fixpoint has two engines: min-label propagation
(O(diameter) rounds — oracle tier) and large-star/small-star
(O(log n) rounds — the billion-edge regime). Property: identical labels
on seeded random graphs; on a path graph (the propagation worst case)
two-phase converges in exponentially fewer rounds.
"""

from __future__ import annotations

import random

import pytest

from oec_etl_spark.operators.dedup import cc_propagate, cc_two_phase, dedup_survivors


def _labels(df):
    return {(r[0], r[1]) for r in df.collect()}


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_two_phase_matches_propagate_on_random_graphs(spark, seed):
    rng = random.Random(seed)
    n = 60
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(rng.randrange(n), rng.randrange(n)) for _ in range(45)],
        "doc_a long, doc_b long",
    ).filter("doc_a != doc_b")
    a = _labels(dedup_survivors(docs, pairs, max_iter=60, algorithm="propagate"))
    b = _labels(dedup_survivors(docs, pairs, max_iter=60, algorithm="two-phase"))
    assert a == b


def test_two_phase_converges_in_log_rounds_on_path_graph(spark):
    """Path 0-1-2-...-32: plain propagation needs O(diameter)=32 rounds
    to pull label 0 to the far end; large-star/small-star halves chain
    length every round and lands in O(log n)."""
    n = 33
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    two, r2 = cc_two_phase(pairs, max_iter=40)
    assert {(r[0], r[1]) for r in two.collect()} == {(i, 0) for i in range(n)}
    prop, r1 = cc_propagate(docs, pairs, max_iter=60)
    assert {(r[0], r[1]) for r in prop.collect()} == {(i, 0) for i in range(n)}
    assert r2 <= 8 < r1  # exponential vs linear round count
