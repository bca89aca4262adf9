"""DSIR importance weights (operators/dsir.py): exact replay against a
pure-Python reference on a tiny corpus, target-slice ordering sanity,
tier agreement (portable md5 vs production xxhash64 plan shape), and
the plan gates (no Python eval, broadcast model join)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from oec_etl_spark.operators import dsir

DOCS = [
    # (doc_id, text, lang) — the "en" slice reuses a distinct vocabulary
    # so its buckets separate from the rest even under 64-way hashing.
    (0, "spark merge batch spark merge", "en"),
    (1, "spark batch table merge row", "en"),
    (2, "uno dos tres cuatro cinco", "es"),
    (3, "eins zwei drei vier", "de"),
    (4, "spark row merge batch table", "en"),
    (5, "uno dos eins zwei spark", "es"),
]


def _bucket_py(tok: str, n_buckets: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n_buckets


def _feats_py(text: str, ngram: int) -> list[str]:
    toks = text.split(" ")
    if ngram == 1:
        return toks
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _weights_py(docs, n_buckets=64, target_lang="en", ngram=1):
    """The definition, computed directly: add-one-smoothed bucket
    n-gram log-ratio, summed over each doc's feature occurrences."""
    raw, tgt = {}, {}
    for _id, text, lang in docs:
        for t in _feats_py(text, ngram):
            b = _bucket_py(t, n_buckets)
            raw[b] = raw.get(b, 0) + 1
            if lang == target_lang:
                tgt[b] = tgt.get(b, 0) + 1
    raw_t, tgt_t = sum(raw.values()), sum(tgt.values())
    out = {}
    for _id, text, lang in docs:
        w = 0.0
        for t in _feats_py(text, ngram):
            b = _bucket_py(t, n_buckets)
            w += math.log((tgt.get(b, 0) + 1.0) / (tgt_t + n_buckets)) - math.log(
                (raw[b] + 1.0) / (raw_t + n_buckets)
            )
        out[_id] = (len(_feats_py(text, ngram)), round(w, 4) + 0.0)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string")


def test_matches_python_reference(spark, docs_df):
    got = {
        r["doc_id"]: (r["n_tokens"], r["dsir_logweight"])
        for r in dsir.importance_weights(docs_df, F.col("lang") == "en").collect()
    }
    assert got == _weights_py(DOCS)


def test_target_docs_score_higher(spark, docs_df):
    rows = dsir.importance_weights(docs_df, F.col("lang") == "en").collect()
    by_id = {r["doc_id"]: r["dsir_logweight"] for r in rows}
    en = [by_id[i] for i, _, lang in DOCS if lang == "en"]
    other = [by_id[i] for i, _, lang in DOCS if lang != "en"]
    # every pure-target doc beats every pure-non-target doc; the mixed
    # doc (5) sits in between is not required — means suffice.
    assert min(en) > max(by_id[i] for i in (2, 3))
    assert sum(en) / len(en) > sum(other) / len(other)


def test_production_tier_same_shape_different_hash(spark, docs_df):
    port = dsir.importance_weights(docs_df, F.col("lang") == "en", portable_hash=True)
    prod = dsir.importance_weights(docs_df, F.col("lang") == "en", portable_hash=False)
    # same schema and doc set; token counts are hash-independent.
    assert port.schema == prod.schema
    p = {r["doc_id"]: r["n_tokens"] for r in port.collect()}
    q = {r["doc_id"]: r["n_tokens"] for r in prod.collect()}
    assert p == q


def test_plan_no_python_and_broadcast_model(spark, docs_df):
    plan = dsir.importance_weights(
        docs_df, F.col("lang") == "en"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan  # the 1-row totals join must broadcast
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_bigram_matches_python_reference(spark, docs_df):
    got = {
        r["doc_id"]: (r["n_tokens"], r["dsir_logweight"])
        for r in dsir.importance_weights(
            docs_df, F.col("lang") == "en", ngram=2
        ).collect()
    }
    assert got == _weights_py(DOCS, ngram=2)


def test_bigram_oracle_matches_duckdb_incl_degenerate_docs(spark):
    """Bigram feature-list parity where it can break: empty text (one
    empty token, zero bigrams) and single-token docs."""
    duckdb = pytest.importorskip("duckdb")
    docs = [(0, "a b c", "en"), (1, "", "en"), (2, "x", "es"), (3, "a b", "es")]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    oracle = {
        int(r.doc_id): (int(r.n_tokens), float(r.dsir_logweight))
        for r in con.sql(
            dsir.importance_weights_sql("documents", ngram=2)
        ).df().itertuples()
    }
    got = {
        r["doc_id"]: (r["n_tokens"], r["dsir_logweight"])
        for r in dsir.importance_weights(df, F.col("lang") == "en", ngram=2).collect()
    }
    assert got == oracle == _weights_py(docs, ngram=2)


@pytest.mark.parametrize("seed", [7, 101, 2026])
def test_matches_python_reference_on_random_corpora(spark, seed):
    """Parity holds on arbitrary corpora, not just the crafted one:
    seeded random docs (small alphabet so buckets collide, mixed langs,
    occasional empty text) replayed against the pure-Python
    definition."""
    import random

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for i in range(30):
        n = rng.randint(0, 12)
        text = " ".join(rng.choice(vocab) for _ in range(n))
        docs.append((i, text, rng.choice(["en", "en", "es", "de"])))
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    for ngram in (1, 2):
        got = {
            r["doc_id"]: (r["n_tokens"], r["dsir_logweight"])
            for r in dsir.importance_weights(
                df, F.col("lang") == "en", ngram=ngram
            ).collect()
        }
        assert got == _weights_py(docs, ngram=ngram)


def _gumbel_py(doc_id: int) -> float:
    u = (int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) + 1.0) / 4294967297.0
    return -math.log(-math.log(u))


def test_gumbel_topk_matches_python_reference(spark, docs_df):
    w = dsir.importance_weights(docs_df, F.col("lang") == "en")
    got = [(r["doc_id"], r["sample_score"]) for r in dsir.gumbel_topk(w, k=3).collect()]
    ref = _weights_py(DOCS)
    scored = sorted(
        ((round(ref[i][1] + _gumbel_py(i), 4) + 0.0, i) for i in ref),
        key=lambda t: (-t[0], t[1]),
    )[:3]
    assert got == [(i, s) for s, i in scored]


def test_gumbel_topk_is_deterministic_and_topk_planned(spark, docs_df):
    w = dsir.importance_weights(docs_df, F.col("lang") == "en")
    a = dsir.gumbel_topk(w, k=4).collect()
    b = dsir.gumbel_topk(w, k=4).collect()
    assert a == b
    plan = dsir.gumbel_topk(w, k=4)._jdf.queryExecution().executedPlan().toString()
    # per-partition top-k + k-row merge, never a global Sort of the corpus
    assert "TakeOrderedAndProject" in plan


def test_sample_oracle_matches_duckdb(docs_df, spark):
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    con.register("documents", docs_df.toPandas())
    oracle = [
        (int(r.doc_id), float(r.sample_score))
        for r in con.sql(
            dsir.sample_topk_sql("documents", k=3)
        ).df().itertuples()
    ]
    w = dsir.importance_weights(docs_df, F.col("lang") == "en")
    got = [(r["doc_id"], r["sample_score"]) for r in dsir.gumbel_topk(w, k=3).collect()]
    assert got == oracle


def test_trained_model_derive_matches_batch_weights(spark, docs_df):
    """fit → deploy as a map-only derive: per-row scores from the
    trained log-ratio model must equal the batch importance_weights
    output, on both the Column builder and the SQL renderer (the
    engine's `derives` form)."""
    lrs = dsir.fit_log_ratios(docs_df, F.col("lang") == "en")
    assert len(lrs) == dsir.N_BUCKETS
    batch = {
        r["doc_id"]: r["dsir_logweight"]
        for r in dsir.importance_weights(docs_df, F.col("lang") == "en").collect()
    }
    via_col = {
        r["doc_id"]: r["w"]
        for r in docs_df.select("doc_id", dsir.weight_expr(lrs).alias("w")).collect()
    }
    via_sql = {
        r["doc_id"]: r["w"]
        for r in docs_df.select(
            "doc_id", F.expr(dsir.weight_spark_sql(lrs)).alias("w")
        ).collect()
    }
    assert via_col == batch
    assert via_sql == batch


def test_trained_model_derive_is_map_only(spark, docs_df):
    lrs = dsir.fit_log_ratios(docs_df, F.col("lang") == "en")
    plan = (
        docs_df.select(dsir.weight_expr(lrs).alias("w"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_oracle_sql_matches_duckdb(docs_df, spark):
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    con.register("documents", docs_df.toPandas())
    oracle = {
        int(r.doc_id): (int(r.n_tokens), float(r.dsir_logweight))
        for r in con.sql(dsir.importance_weights_sql("documents")).df().itertuples()
    }
    got = {
        r["doc_id"]: (r["n_tokens"], r["dsir_logweight"])
        for r in dsir.importance_weights(docs_df, F.col("lang") == "en").collect()
    }
    assert got == oracle
