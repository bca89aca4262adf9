"""Large-D plan for the trainable quality classifier
(operators/classifier.py) — round-4 verdict item 2.

The round-3 finding: ``margin_expr`` embedded all D weights as Catalyst
literals, capping the feature dim exactly like the round-2 centroid
literals (a 2^20-literal expression dies in analysis long before the
data does). The cure mirrors ``similarity.nearest_centroid_cols``'s
``LITERAL_K_MAX`` pattern: above ``LITERAL_DIM_MAX`` the bucketing
stays the SAME JVM expression and one Arrow UDF does the gather+dot
with the weights ndarray in the task closure. These tests pin:

- the Arrow path scores EXACTLY equal to the literal path at small D
  (both hash tiers) — callers never observe which plan ran;
- D=2^18 builds and runs end to end (margin, score, and train());
- the auto-switch threshold picks the literal plan at D ≤ max (no
  Python in the plan) and the Arrow plan above it;
- the Arrow scoring plan stays map-only (no Exchange).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from oec_etl_spark.operators import classifier as C

_WORDS = (
    "the a of to and in for on with by from at table row key value query "
    "scan join merge sort group window batch stream data fast slow big small"
).split()
_MARKERS = ["buy", "free", "click"]


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(11)
    rows = []
    for i in range(160):
        n = rng.randint(30, 60)
        toks = [rng.choice(_WORDS) for _ in range(n)]
        is_spam = rng.random() < 0.3
        if is_spam:
            for m in rng.sample(_MARKERS, 3):
                toks.insert(rng.randrange(len(toks) + 1), m)
        rows.append((i, " ".join(toks), int(is_spam)))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("portable", [True, False])
def test_arrow_path_scores_equal_literal(spark, corpus, portable):
    """Force the Arrow path at small D: scores (4dp) must be exactly
    the literal plan's, row for row, on both hash tiers."""
    clf = C.train(corpus, "label", dim=64, n_iter=2, portable_hash=portable)
    lit = corpus.select(
        "doc_id",
        C.score_expr(clf.weights, portable_hash=portable).alias("s"),
    )
    arr = corpus.select(
        "doc_id",
        C.score_expr(clf.weights, portable_hash=portable,
                     dim_literal_max=1).alias("s"),
    )
    assert "ArrowEvalPython" not in _plan(lit)
    assert "ArrowEvalPython" in _plan(arr)
    a = {r["doc_id"]: r["s"] for r in lit.collect()}
    b = {r["doc_id"]: r["s"] for r in arr.collect()}
    assert a == b


def test_large_dim_builds_and_runs(spark, corpus):
    """D=2^18: the literal plan would be a quarter-million-literal
    expression; the auto-selected Arrow plan builds instantly and
    scores valid probabilities."""
    dim = 2 ** 18
    rng = random.Random(3)
    w = [rng.uniform(-1, 1) for _ in range(dim)] + [0.1]
    scored = corpus.select("doc_id", C.score_expr(w).alias("s"))
    assert "ArrowEvalPython" in _plan(scored)
    rows = scored.collect()
    assert len(rows) == corpus.count()
    assert all(0.0 <= r["s"] <= 1.0 for r in rows)


def test_large_dim_train_end_to_end(spark, corpus):
    """train() at D=2^18 (production-bucket regime): per-iteration
    margins go through the Arrow plan, the gradient stays a JVM
    hash-aggregate, and the learned split is clean — at 2^18 buckets
    the markers can't collide with the common vocab."""
    import bisect

    train = corpus.filter("doc_id % 5 <> 0")
    test = corpus.filter("doc_id % 5 = 0")
    clf = C.train(train, "label", dim=2 ** 18, lr=20.0, n_iter=4,
                  portable_hash=False)
    assert clf.dim == 2 ** 18 and len(clf.weights) == 2 ** 18 + 1
    rows = [
        (float(r["s"]), int(r["label"]))
        for r in test.select(clf.score(dp=6).alias("s"), "label").collect()
    ]
    pos = sorted(s for s, y in rows if y == 1)
    neg = sorted(s for s, y in rows if y == 0)
    assert pos and neg
    wins = sum(
        bisect.bisect_left(neg, s)
        + 0.5 * (bisect.bisect_right(neg, s) - bisect.bisect_left(neg, s))
        for s in pos
    )
    assert wins / (len(pos) * len(neg)) >= 0.9


def test_auto_switch_threshold(spark, corpus):
    """D ≤ LITERAL_DIM_MAX stays pure JVM codegen; D above it (forced
    here with a tiny override) switches to the Arrow closure."""
    w9 = [0.1] * 8 + [0.0]
    lit = corpus.select(C.margin_expr(w9).alias("m"))
    assert "ArrowEvalPython" not in _plan(lit)
    assert "BatchEvalPython" not in _plan(lit)
    arr = corpus.select(C.margin_expr(w9, dim_literal_max=4).alias("m"))
    assert "ArrowEvalPython" in _plan(arr)


@pytest.mark.parametrize("portable", [True, False])
def test_spark_sql_rendering_matches_column(spark, corpus, portable):
    """score_spark_sql (the string the engine's declarative derives
    consume) must score exactly like the Column builder — same
    expression tree, so same rounding, same hash tier."""
    clf = C.train(corpus, "label", dim=64, n_iter=2, portable_hash=portable)
    got = corpus.select(
        "doc_id",
        C.score_expr(clf.weights, portable_hash=portable).alias("c"),
        F.expr(C.score_spark_sql(clf.weights, portable_hash=portable)).alias("s"),
    )
    assert got.filter("c <> s").isEmpty()


def test_spark_sql_rendering_rejects_arrow_dims():
    with pytest.raises(ValueError, match="LITERAL_DIM_MAX"):
        C.score_spark_sql([0.0] * (C.LITERAL_DIM_MAX + 2))


def test_arrow_scoring_is_map_only(spark, corpus):
    """The large-D plan must stay a scan → project pipeline: no join,
    no Exchange — same contract the literal plan is held to."""
    w = [0.1] * 8 + [0.0]
    plan = _plan(corpus.select(C.score_expr(w, dim_literal_max=4).alias("s")))
    assert "Exchange" not in plan, f"large-D scoring must not shuffle:\n{plan}"
    assert "Join" not in plan


@pytest.mark.parametrize("portable", [True, False])
def test_null_text_scores_null_on_both_plans(spark, portable):
    """NULL text must score NULL on BOTH plans. The literal plan gets
    this for free (split(NULL) → NULL → aggregate(NULL) → NULL); the
    Arrow plan sees a None token array and must not crash on len(None)
    — it returns NaN, which Spark surfaces as SQL NULL."""
    df = spark.createDataFrame(
        [(0, "the quick fox"), (1, None), (2, "buy free click")],
        "doc_id long, text string",
    )
    w = [0.1] * 8 + [0.05]
    got = df.select(
        "doc_id",
        C.score_expr(w, portable_hash=portable).alias("lit"),
        C.score_expr(w, portable_hash=portable, dim_literal_max=4).alias("arr"),
    ).orderBy("doc_id").collect()
    assert got[1].lit is None and got[1].arr is None
    for r in (got[0], got[2]):
        assert r.lit is not None
        assert r.lit == r.arr
