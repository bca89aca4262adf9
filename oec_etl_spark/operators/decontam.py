"""Benchmark decontamination: flag corpus documents sharing any word
n-gram with a (small) benchmark/eval set.

The standard training-data hygiene step (GPT-3 appendix C / PaLM-style
13-gram overlap, public method): tokenize, form all n-word shingles,
and drop any training document that contains a shingle also present in
an evaluation benchmark. Reference analog: none — the reference
(`/root/reference/etl/*`) has no corpus hygiene at all; this is part of
the new-engine training-data surface (SURVEY.md §2.5).

Scale shape (the part that must survive 100×):
- The corpus side is a linear explode: each doc yields ~n_words shingles,
  map-side distinct'd per doc before the join.
- The benchmark side is SMALL by definition (eval sets are thousands of
  docs, not billions) → its distinct shingle set is broadcast, so the
  probe is a map-side broadcast hash semi-join over the corpus with NO
  shuffle of the exploded corpus grams. groupBy(doc_id) for the hit
  count shuffles only matched grams (rare), not the corpus.
- At 100 TB, hash the gram to a long (xxhash64) before broadcasting to
  keep the broadcast table compact; the oracle tier keeps raw strings so
  DuckDB can replicate exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

N_GRAM = 8  # oracle-tier shingle width (production: 13-gram typical)


def word_ngrams(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
                n: int = N_GRAM) -> DataFrame:
    """Distinct n-word shingles per doc: (id_col, gram). Pure built-in
    higher-order functions — the explode happens JVM-side, no Python."""
    t = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(t, i, n), " "),
    )
    safe = F.when(F.size(t) >= n, grams).otherwise(F.array().cast("array<string>"))
    return df.select(F.col(id_col), F.explode(F.array_distinct(safe)).alias("gram"))


def contamination(corpus: DataFrame, benchmark: DataFrame, *, id_col: str = "doc_id",
                  text_col: str = "text", n: int = N_GRAM) -> DataFrame:
    """Per-corpus-doc count of distinct shingles shared with the
    benchmark set: (id_col, n_contaminated_grams). Docs with zero
    overlap are absent — anti-join against this result to decontaminate.

    The benchmark gram set is explicitly broadcast: it is the small side
    by construction, and broadcasting keeps the corpus-side explode
    shuffle-free (plan-asserted in tests/test_plan_quality.py).
    """
    corpus_grams = word_ngrams(corpus, id_col=id_col, text_col=text_col, n=n)
    bench_grams = (
        word_ngrams(benchmark, id_col=id_col, text_col=text_col, n=n)
        .select("gram")
        .distinct()
    )
    return (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("n_contaminated_grams"))
    )


def decontaminate(corpus: DataFrame, benchmark: DataFrame, *, id_col: str = "doc_id",
                  text_col: str = "text", n: int = N_GRAM) -> DataFrame:
    """The corpus minus every document that shares an n-gram with the
    benchmark (broadcast anti-join on the contaminated-id set — the id
    set is at most |contaminated docs|, far smaller than the corpus)."""
    dirty = contamination(corpus, benchmark, id_col=id_col, text_col=text_col, n=n)
    return corpus.join(F.broadcast(dirty.select(id_col)), id_col, "left_anti")
