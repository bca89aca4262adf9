"""Exact substring (repeated-span) dedup: find and remove text spans
duplicated ACROSS documents — the distributed approximation of the
suffix-array method in Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better" (public). This is the dedup mode the
doc-level family (exact hash / MinHash / SimHash / embedding) cannot
express: two otherwise-distinct documents sharing one boilerplate
paragraph. Reference analog: none — the reference
(`/root/reference/etl/*`) has no corpus hygiene; this is new-engine
training-data surface (SURVEY.md §2.5).

Method (all built-in Column expressions — zero Python in the plan):
1. positional token windows: every ``width``-token window per doc as
   (doc_id, pos, gram) — linear explode, ~n_tokens rows per doc.
2. duplicated grams: windows whose gram occurs in ≥ ``min_docs``
   DISTINCT documents. Two-stage agg: distinct (gram, doc) pairs with
   map-side combine, then a plain count — never count_distinct's
   expand over the raw explode.
3. span merge per doc: matched window positions collapse into maximal
   duplicated spans with the classic gaps-and-islands window (windows
   at sorted positions p, fixed width w ⇒ ends are monotone, so a new
   island starts exactly when pos > lag(pos) + w).

Scale shape (what survives 100×):
- Step 1 is map-only. Step 2 shuffles (gram, doc) pairs once; gram
  keys are near-uniform (they're text shingles) so no salting needed,
  and the ``max_docs`` cap drops stop-grams (ubiquitous boilerplate
  like license headers) the same way MinHash caps stop-shingles —
  those are better handled by a dedicated boilerplate rule than by
  exploding a billion-row join against one gram.
- Step 3's per-doc window is bounded by tokens-per-doc, not corpus
  size.
- Production tier: hash the gram to xxhash64 BEFORE the shuffle so the
  wide string never leaves the map side; the oracle tier keeps raw
  strings so DuckDB replicates exactly (same dual-tier pattern as
  MinHash in operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WIDTH = 8  # tokens per window (production: 50-token spans typical)


def doc_windows(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
                width: int = WIDTH) -> DataFrame:
    """Positional ``width``-token windows: (id_col, pos, gram), pos
    1-based (matches DuckDB list indexing). Docs shorter than ``width``
    yield nothing. Map-only: split → sequence → transform → explode."""
    t = F.split(F.col(text_col), " ")
    wins = F.transform(
        F.sequence(F.lit(1), F.size(t) - F.lit(width - 1)),
        lambda i: F.struct(i.alias("pos"), F.array_join(F.slice(t, i, width), " ").alias("gram")),
    )
    safe = F.when(F.size(t) >= width, wins).otherwise(
        F.array().cast("array<struct<pos:int,gram:string>>")
    )
    return df.select(F.col(id_col), F.explode(safe).alias("w")).select(
        id_col, F.col("w.pos").alias("pos"), F.col("w.gram").alias("gram")
    )


def duplicated_grams(windows: DataFrame, *, id_col: str = "doc_id",
                     min_docs: int = 2, max_docs: int | None = None,
                     hashed: bool = False) -> DataFrame:
    """Grams occurring in ≥ min_docs distinct docs: (gram[, n_docs]).
    ``max_docs`` is the stop-gram cap (skew guard); ``hashed=True`` is
    the production tier — grams become xxhash64 longs before the
    shuffle (callers must hash their probe side identically)."""
    g = F.xxhash64("gram").alias("gram") if hashed else F.col("gram")
    pairs = windows.select(g, F.col(id_col)).distinct()
    counted = pairs.groupBy("gram").agg(F.count(F.lit(1)).alias("n_docs"))
    keep = counted.filter(F.col("n_docs") >= min_docs)
    if max_docs is not None:
        keep = keep.filter(F.col("n_docs") <= max_docs)
    return keep


def doc_dup_spans(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
                  width: int = WIDTH, min_docs: int = 2,
                  max_docs: int | None = None, hashed: bool = False) -> DataFrame:
    """Maximal cross-doc duplicated spans per doc:
    (id_col, span_start, span_end) — token positions, 1-based
    inclusive. Overlapping/adjacent duplicated windows are merged.

    ``hashed=True`` is the production tier: grams become xxhash64 longs
    BEFORE both shuffles (the distinct-pair agg and the probe join), so
    the wide window string never leaves the map side — the same
    dual-tier pattern as MinHash in operators/dedup.py. A 64-bit
    collision can only misflag a single window as duplicated (false
    positive), the usual hashed-dedup tradeoff; the default raw tier is
    exact and is what the DuckDB oracle replicates."""
    wins = doc_windows(df, id_col=id_col, text_col=text_col, width=width)
    dup = duplicated_grams(wins, id_col=id_col, min_docs=min_docs,
                           max_docs=max_docs, hashed=hashed)
    probe_gram = F.xxhash64("gram") if hashed else F.col("gram")
    probe = wins.select(F.col(id_col), "pos", probe_gram.alias("gram"))
    hits = probe.join(dup.select("gram"), "gram").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    flagged = hits.withColumn(
        "brk",
        F.when(
            F.lag("pos").over(w).isNull()
            | (F.col("pos") > F.lag("pos").over(w) + width),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    islands = flagged.withColumn(
        "isl", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        islands.groupBy(id_col, "isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(width - 1)).alias("span_end"),
        )
        .drop("isl")
    )


def span_dedup_stats(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
                     width: int = WIDTH, min_docs: int = 2,
                     max_docs: int | None = None, hashed: bool = False) -> DataFrame:
    """Per-doc duplicated-span summary for every doc carrying at least
    one cross-doc span: (id_col, n_dup_spans, dup_tokens, n_tokens,
    dup_ratio). dup_ratio is dup_tokens/n_tokens rounded to 4dp.
    ``hashed`` selects the production gram tier (see doc_dup_spans)."""
    spans = doc_dup_spans(df, id_col=id_col, text_col=text_col, width=width,
                          min_docs=min_docs, max_docs=max_docs, hashed=hashed)
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("dup_tokens"),
    )
    toks = df.select(F.col(id_col), F.size(F.split(F.col(text_col), " ")).alias("n_tokens"))
    return per_doc.join(toks, id_col).select(
        id_col,
        "n_dup_spans",
        "dup_tokens",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.col("dup_tokens") / F.col("n_tokens"), 4).alias("dup_ratio"),
    )


def strip_dup_spans(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
                    width: int = WIDTH, min_docs: int = 2,
                    max_docs: int | None = None, hashed: bool = False) -> DataFrame:
    """The corpus with every cross-doc duplicated span removed from
    every document (the conservative variant of Lee et al.'s
    remove-all-copies: identical spans vanish everywhere, so no global
    keep-one coordination — and hence no extra shuffle — is needed).
    Output: input columns + ``text_dedup``.

    The rewrite is a map-side expression: spans arrive per doc as a
    collected array (one left join), and tokens are kept when no span
    covers their position (higher-order ``filter`` + ``exists``)."""
    spans = (
        doc_dup_spans(df, id_col=id_col, text_col=text_col, width=width,
                      min_docs=min_docs, max_docs=max_docs, hashed=hashed)
        .groupBy(id_col)
        .agg(F.collect_list(F.struct("span_start", "span_end")).alias("__spans"))
    )
    joined = df.join(spans, id_col, "left")
    t = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(1), F.size(t))
    keep = F.filter(
        idx,
        lambda i: ~F.exists(
            F.coalesce(F.col("__spans"), F.array().cast(
                "array<struct<span_start:int,span_end:int>>")),
            lambda s: (i >= s["span_start"]) & (i <= s["span_end"]),
        ),
    )
    dedup = F.array_join(F.transform(keep, lambda i: F.element_at(t, i)), " ")
    return joined.withColumn("text_dedup", dedup).drop("__spans")
