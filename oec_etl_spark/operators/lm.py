"""Corpus-trained n-gram language-model scoring (CCNet-style quality filter).

The classic LLM-corpus quality signal (Wenzek et al. 2019, "CCNet:
Extracting High Quality Monolingual Datasets from Web Crawl Data",
public): train a small LM on the corpus (or a trusted slice of it) and
rank documents by per-token cross-entropy — boilerplate, gibberish and
machine-generated spam score far from the corpus distribution. The
reference repo has no analog (its closest idea is the banded scalar
lookup ``hs6_converter``, ``/root/reference/etl/util.py:1-26``); this
operator is part of the training-data-pipeline surface the new engine
adds on top of SURVEY.md §2.

Model: an add-k-smoothed bigram LM over whitespace tokens.

    P(w2 | w1) = (c(w1 w2) + k) / (c(w1 ·) + k · V)

with c(w1 w2) the corpus bigram count, c(w1 ·) the count of w1 as a
bigram context (= sum of bigram counts with left token w1), V the
corpus vocabulary size and k a fixed smoothing constant. A document's
score is the mean of -log2 P over its bigrams (cross-entropy,
bits/token) — unseen bigrams and unseen contexts degrade smoothly to
the uniform floor instead of -inf.

Scale shape (the part that must survive 100 TB):

- Training is two hash aggregations over the exploded bigram stream
  (bigram counts, then context counts folded FROM the bigram table —
  never a second pass over the corpus) plus a scalar vocab count. All
  map-side-combinable; no joins.
- Scoring joins each document's bigrams to the LM. The gram key is
  Zipf-skewed: a handful of stop-pairs ("of the", "in a") account for
  a huge share of occurrences, and a plain shuffle join sends every
  one of them to a single reducer. The join is therefore SPLIT: the
  top ``head_k`` grams by count (a tiny, driver-bounded table) join
  broadcast; only the long tail — which is uniform by construction —
  takes the shuffle. Same trick as the stop-shingle df-cap in
  ``operators/dedup.py``, applied to a join instead of a filter.
- The context table c(w1 ·) is vocabulary-sized (≪ corpus); it also
  splits head/tail on the same rule.

Everything is built-in Column expressions — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SMOOTH_K = 0.5     # add-k smoothing constant
HEAD_K = 1024      # grams/contexts broadcast instead of shuffled

_toks = F.split


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per (doc, adjacent-token-pair occurrence). Multiplicity
    is preserved — a pair repeated in a doc scores (and trains) once
    per occurrence, exactly as in the oracle SQL."""
    t = _toks(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - 1),
        lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + F.lit(1))),
    )
    grams = F.when(F.size(t) >= 2, grams).otherwise(F.array().cast("array<string>"))
    return df.select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("g"))


def bigram_lm(train: DataFrame, text_col: str = "text") -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the LM. Returns (bigram_counts[g, c], context_counts[w1, cc],
    vocab[v]) — the third is a single-row DataFrame.

    Context counts are an aggregation OF the bigram table (sum of c
    grouped by the left token), so the corpus is scanned once for both
    tables; the vocab count is the only second scan and is a pure
    map-side distinct-count."""
    grams = _doc_bigrams(train.select(F.lit(0).alias("__id"), text_col), "__id", text_col)
    bi = grams.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("c"))
    ctx = (
        bi.select(F.split_part(F.col("g"), F.lit(" "), F.lit(1)).alias("w1"), "c")
        .groupBy("w1")
        .agg(F.sum("c").cast("long").alias("cc"))
    )
    vocab = (
        train.select(F.explode(_toks(F.col(text_col), " ")).alias("tok"))
        .agg(F.countDistinct("tok").cast("long").alias("v"))
    )
    return bi, ctx, vocab


def _skew_split_join(left: DataFrame, right: DataFrame, key: str, count_col: str,
                     head_k: int) -> DataFrame:
    """Left-join `left` to `right` on `key`, Zipf-aware: the `head_k`
    hottest right rows (by `count_col`) join broadcast so their —
    enormous — left fan-in never converges on single reducers; the
    uniform tail takes a normal shuffle join. Result is identical to a
    plain left join (each key lives in exactly one half)."""
    head = right.orderBy(F.col(count_col).desc(), F.col(key)).limit(head_k)
    tail = right.join(F.broadcast(head.select(key)), key, "left_anti")
    hit = left.join(F.broadcast(head), key, "inner")
    miss = left.join(F.broadcast(head.select(key)), key, "left_anti").join(tail, key, "left")
    return hit.unionByName(miss)


def score_bigram_xent(
    docs: DataFrame,
    train: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    smooth_k: float = SMOOTH_K,
    head_k: int = HEAD_K,
) -> DataFrame:
    """Per-document bigram cross-entropy against an LM trained on
    `train` (defaults to `docs` itself — self-perplexity, the usual
    first pass when no trusted slice exists yet).

    Returns (doc_id, n_bigrams, xent_bits): mean -log2 P(w2|w1) in
    bits, rounded to 4. Lower = closer to the corpus distribution;
    filter on a quantile of this column."""
    bi, ctx, vocab = bigram_lm(train if train is not None else docs, text_col)
    grams = _doc_bigrams(docs, id_col, text_col)
    scored = _skew_split_join(grams, bi, "g", "c", head_k)
    scored = scored.withColumn("w1", F.split_part(F.col("g"), F.lit(" "), F.lit(1)))
    scored = _skew_split_join(scored, ctx, "w1", "cc", head_k)
    nll = -F.log2(
        (F.coalesce(F.col("c"), F.lit(0)) + F.lit(smooth_k))
        / (F.coalesce(F.col("cc"), F.lit(0)) + F.lit(smooth_k) * F.col("v"))
    )
    return (
        scored.join(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.avg(nll), 4).alias("xent_bits"),
        )
    )


def score_bigram_xent_sql(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    smooth_k: float = SMOOTH_K,
) -> str:
    """DuckDB oracle for ``score_bigram_xent`` (self-trained form):
    single plain left joins — the head/tail split is a physical
    rewrite, not a semantic one, so the simple SQL is the spec."""
    return f"""
    WITH toks AS (
      SELECT {id_col} AS doc_id, string_split({text_col}, ' ') AS t FROM {table}
    ),
    grams AS (
      SELECT doc_id, u.g AS g
      FROM toks, LATERAL unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS u(g)
      WHERE len(t) >= 2
    ),
    bi AS (SELECT g, count(*)::BIGINT AS c FROM grams GROUP BY g),
    ctx AS (SELECT split_part(g, ' ', 1) AS w1, sum(c)::BIGINT AS cc FROM bi GROUP BY 1),
    vocab AS (
      SELECT count(DISTINCT u.tok)::BIGINT AS v FROM toks, LATERAL unnest(t) AS u(tok)
    ),
    scored AS (
      SELECT grams.doc_id,
             -log2((coalesce(bi.c, 0) + {smooth_k}) / (coalesce(ctx.cc, 0) + {smooth_k} * vocab.v)) AS nll
      FROM grams
      LEFT JOIN bi USING (g)
      LEFT JOIN ctx ON split_part(grams.g, ' ', 1) = ctx.w1
      CROSS JOIN vocab
    )
    SELECT doc_id, count(*)::BIGINT AS n_bigrams, round(avg(nll), 4) AS xent_bits
    FROM scored GROUP BY doc_id
    """
