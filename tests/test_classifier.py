"""Trainable quality classifier (operators/classifier.py) — the
supervised half of the CCNet recipe.

Oracle parity (Spark trained weights == DuckDB CTE-chain weights,
scores hash-equal at 4dp) is covered by the registry gate in
test_queries_oracle.py via the `doc_quality_classifier` entry; these
tests pin what the oracle can't see:

- the supervised signal WINS where the unsupervised baseline can't:
  on fluent spam (normal bigrams + rare marker tokens) the classifier's
  held-out AUC must clearly beat bigram-LM cross-entropy ranking;
- scoring is a map-only expression (no shuffle, no Python in the plan);
- the per-iteration gradient aggregate is map-side combined;
- the xxhash64 production tier trains and scores end-to-end.
"""

from __future__ import annotations

import bisect
import random

import pytest
from pyspark.sql import functions as F

from oec_etl_spark.operators import classifier as C
from oec_etl_spark.operators import lm

_WORDS = (
    "the a of to and in for on with by from at table row key value query "
    "scan join merge sort group window batch stream data fast slow big small"
).split()
_MARKERS = ["buy", "free", "click"]


def _seeded_spam_corpus(spark, n_docs: int = 240, spam_frac: float = 0.3):
    """Fluent docs from a common vocab; a `spam_frac` slice additionally
    carries 3 rare marker tokens at random positions. The bigrams stay
    corpus-typical (markers are single-token insertions), so an
    unsupervised LM sees spam as only mildly atypical — the supervised
    label is the only clean separator."""
    rng = random.Random(7)
    rows = []
    for i in range(n_docs):
        n = rng.randint(30, 60)
        toks = [rng.choice(_WORDS) for _ in range(n)]
        is_spam = rng.random() < spam_frac
        if is_spam:
            for m in rng.sample(_MARKERS, 3):
                toks.insert(rng.randrange(len(toks) + 1), m)
        rows.append((i, " ".join(toks), int(is_spam)))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def _auc(score_label_rows) -> float:
    pos = sorted(s for s, y in score_label_rows if y == 1)
    neg = sorted(s for s, y in score_label_rows if y == 0)
    assert pos and neg, "degenerate held-out split"
    wins = sum(
        bisect.bisect_left(neg, s)
        + 0.5 * (bisect.bisect_right(neg, s) - bisect.bisect_left(neg, s))
        for s in pos
    )
    return wins / (len(pos) * len(neg))


@pytest.fixture(scope="module")
def corpus(spark):
    return _seeded_spam_corpus(spark).cache()


def test_classifier_beats_xent_baseline(spark, corpus):
    """Held-out AUC: supervised hashed-ngram LR must clearly beat the
    unsupervised bigram-xent ranking on fluent spam."""
    train = corpus.filter("doc_id % 5 <> 0")
    test = corpus.filter("doc_id % 5 = 0")
    clf = C.train(train, "label", dim=128, lr=20.0, n_iter=4)
    clf_rows = [
        (float(r["s"]), int(r["label"]))
        for r in test.select(clf.score(dp=6).alias("s"), "label").collect()
    ]
    clf_auc = _auc(clf_rows)

    xent = lm.score_bigram_xent(corpus)  # self-trained, unsupervised
    xent_rows = [
        (float(r["xent_bits"]), int(r["label"]))
        for r in test.join(xent, "doc_id").select("xent_bits", "label").collect()
    ]
    xent_auc = _auc(xent_rows)

    assert clf_auc >= 0.9, f"classifier held-out AUC too low: {clf_auc:.3f}"
    assert clf_auc >= xent_auc + 0.1, (
        f"supervised ({clf_auc:.3f}) must clearly beat "
        f"unsupervised xent ({xent_auc:.3f})"
    )


def test_scoring_is_map_only(spark, corpus):
    """The deployable score is ONE codegen'd expression: no shuffle, no
    Python in the plan — attachable at ingest like the PII derives."""
    clf = C.TrainedClassifier(
        weights=[0.01] * 128 + [-0.5], n_iter=0, dim=128, portable_hash=True
    )
    plan = (
        corpus.select("doc_id", clf.score().alias("q"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, f"scoring must not shuffle:\n{plan}"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_gradient_agg_is_map_side_combined(spark, corpus):
    """Each training iteration's gradient is a partial-aggregated hash
    agg (D+1 cells), so the shuffle carries ~(partitions x D) rows
    regardless of corpus size."""
    t = F.split(F.col("text"), " ")
    cells = F.transform(
        t,
        lambda tok: F.struct(
            C._bucket(tok, 128, True).alias("b"),
            (F.lit(1.0) / F.size(t)).alias("x"),
        ),
    )
    grad = (
        corpus.select(F.col("label").cast("double").alias("resid"),
                      F.explode(cells).alias("c"))
        .groupBy(F.col("c.b").alias("b"))
        .agg(F.sum(F.col("resid") * F.col("c.x")).alias("g"))
    )
    plan = grad._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan, f"gradient agg must map-side combine:\n{plan}"


def test_production_hash_tier(spark, corpus):
    """xxhash64 tier (portable_hash=False) trains and scores end to
    end; scores are valid probabilities and the split is learnable."""
    train = corpus.filter("doc_id % 5 <> 0")
    test = corpus.filter("doc_id % 5 = 0")
    # dim=256: xxhash64 buckets the vocab differently from md5, and at
    # 128 a marker collides with a common word (AUC 0.889); the fix at
    # any scale is more buckets, not a different hash.
    clf = C.train(train, "label", dim=256, lr=20.0, n_iter=4,
                  portable_hash=False)
    rows = [
        (float(r["s"]), int(r["label"]))
        for r in test.select(clf.score(dp=6).alias("s"), "label").collect()
    ]
    assert all(0.0 <= s <= 1.0 for s, _ in rows)
    assert _auc(rows) >= 0.9


def test_empty_corpus_rejected(spark, corpus):
    with pytest.raises(ValueError):
        C.train(corpus.filter("doc_id < 0"), "label")
