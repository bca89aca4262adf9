"""DSIR-style data selection: hashed-n-gram importance weights.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023)
scores every raw document by how much more likely its hashed bag-of-
n-grams is under a *target* distribution than under the *raw* corpus
distribution; training data is then sampled proportionally to
exp(weight). Here the feature space is hashed unigram buckets and the
two distributions are estimated from the same corpus in ONE pass: the
target is a predicate over the document metadata (e.g. ``lang = 'en'``
— "give me more data that looks like my English slice").

log w(doc) = sum over token occurrences t of
             [ ln p_target(bucket(t)) - ln p_raw(bucket(t)) ]
with add-one smoothing over ``n_buckets`` cells.

Scale shape (the 100 TB question):
- one map-only explode, then a (doc_id, bucket) partial count — the
  only shuffle that sees token-scale data, and it is map-side combined
  down to at most ``n_buckets`` rows per document;
- the bucket unigram model is a ``n_buckets``-row aggregate (64 cells
  by default) + a 1-row totals aggregate — driver-sized metadata, the
  log-ratio table is broadcast back;
- per-doc weights come from one broadcast join + one reduce over the
  already-shrunk (doc_id, bucket) counts. No token-scale data crosses
  a second shuffle, no Python touches a row.

Two hash tiers behind ``portable_hash`` (same convention as
operators/dedup.py): md5-hex-parse for bit-identical DuckDB oracle
replay, xxhash64 for the production/bench path.

Reference analog: none — the reference (pedrocondor/oec-etl) has no
corpus-selection tooling; this extends the engine toward the
training-data-pipeline surface the brief mandates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 64


def _bucket(tok: Column, n_buckets: int, portable: bool) -> Column:
    """Hash a token into [0, n_buckets). Portable tier parses the
    leading 8 md5 hex chars (replicated in DuckDB via strpos
    arithmetic); production tier is xxhash64 + pmod (sign-safe,
    including Long.MIN_VALUE)."""
    if portable:
        h = F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")
    else:
        h = F.xxhash64(tok)
    return F.pmod(h, F.lit(n_buckets))


def _grams(text_col: str, ngram: int) -> Column:
    """Feature array for one document: the split tokens (ngram=1), plus
    space-joined adjacent pairs when ngram=2 — the paper's hashed
    unigram+bigram space. Pure built-ins (split/slice/zip_with/concat),
    map-only."""
    t = F.split(F.col(text_col), " ")
    if ngram == 1:
        return t
    if ngram != 2:
        raise ValueError(f"ngram must be 1 or 2, got {ngram}")
    n = F.size(t)
    big = F.zip_with(
        F.slice(t, 1, n - 1),
        F.slice(t, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.concat(t, big)


def importance_weights(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    portable_hash: bool = True,
    ngram: int = 1,
) -> DataFrame:
    """Per-document DSIR log importance weight of the corpus against
    the slice selected by the boolean ``target`` column expression.

    ``ngram=2`` hashes unigrams AND adjacent bigrams into the same
    bucket space (the feature space of the DSIR paper); ``n_tokens``
    then counts features, not words.

    Returns (id_col, n_tokens:bigint, dsir_logweight:double rounded 4).
    Higher = more target-like under the hashed n-gram model.
    """
    toks = df.select(
        F.col(id_col),
        target.alias("is_tgt"),
        F.explode(_grams(text_col, ngram)).alias("tok"),
    )
    # token-scale → (doc, bucket)-scale: the one big (map-side
    # combined) shuffle.
    db = (
        toks.select(id_col, "is_tgt", _bucket(F.col("tok"), n_buckets, portable_hash).alias("bucket"))
        .groupBy(id_col, "is_tgt", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # bucket unigram counts for both distributions in one aggregate.
    bc = db.groupBy("bucket").agg(
        F.sum("cnt").alias("raw_n"),
        F.sum(F.when(F.col("is_tgt"), F.col("cnt")).otherwise(F.lit(0))).alias("tgt_n"),
    )
    tot = bc.agg(F.sum("raw_n").alias("raw_t"), F.sum("tgt_n").alias("tgt_t"))
    lr = bc.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            F.log((F.col("tgt_n") + F.lit(1.0)) / (F.col("tgt_t") + F.lit(float(n_buckets))))
            - F.log((F.col("raw_n") + F.lit(1.0)) / (F.col("raw_t") + F.lit(float(n_buckets))))
        ).alias("lr"),
    )
    return (
        db.join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_tokens"),
            # + 0.0 folds IEEE -0.0 (a possible round() output on both
            # engines) to +0.0 so the value hash can't split on it.
            (F.round(F.sum(F.col("cnt") * F.col("lr")), 4) + F.lit(0.0)).alias("dsir_logweight"),
        )
    )


def fit_log_ratios(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    portable_hash: bool = True,
) -> list[float]:
    """Train the DSIR model and collect it to the driver: the
    ``n_buckets`` bucket log-ratios ln p_target - ln p_raw (add-one
    smoothed). The collect is O(n_buckets) control metadata — the same
    driver-sized-model discipline as the classifier's weights and the
    IVF centroids — so a trained selector deploys into the CDC loop as
    one declarative derive (:func:`weight_spark_sql`)."""
    toks = df.select(target.alias("is_tgt"), F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    bc = (
        toks.select("is_tgt", _bucket(F.col("tok"), n_buckets, portable_hash).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("raw_n"),
            F.sum(F.when(F.col("is_tgt"), 1).otherwise(0)).alias("tgt_n"),
        )
        .collect()
    )
    raw = [0] * n_buckets
    tgt = [0] * n_buckets
    for r in bc:
        raw[r["bucket"]] = r["raw_n"]
        tgt[r["bucket"]] = r["tgt_n"]
    raw_t, tgt_t = float(sum(raw)), float(sum(tgt))
    import math

    return [
        math.log((tgt[b] + 1.0) / (tgt_t + n_buckets)) - math.log((raw[b] + 1.0) / (raw_t + n_buckets))
        for b in range(n_buckets)
    ]


def weight_expr(
    log_ratios: list[float],
    text_col: str = "text",
    portable_hash: bool = True,
    dp: int = 4,
) -> Column:
    """Per-row DSIR log-weight from a trained model: one map-only
    higher-order aggregate over the split tokens, the model riding as a
    literal array — no join, no shuffle, codegen'd. Matches
    :func:`importance_weights`' ``dsir_logweight`` (same smoothing,
    same rounding, -0.0 folded)."""
    n = len(log_ratios)
    arr = F.array(*[F.lit(float(x)) for x in log_ratios])
    toks = F.split(F.col(text_col), " ")
    acc = F.aggregate(
        toks,
        F.lit(0.0),
        lambda a, t: a + F.element_at(arr, _bucket(t, n, portable_hash).cast("int") + 1),
    )
    return F.round(acc, dp) + F.lit(0.0)


def weight_spark_sql(
    log_ratios: list[float],
    text_col: str = "text",
    portable_hash: bool = True,
    dp: int = 4,
) -> str:
    """:func:`weight_expr` rendered as a Spark-SQL STRING — the form
    the streaming engine's declarative ``derives`` accept, so a trained
    selector attaches its weight at ingest:

        derives={"dsir_w": weight_spark_sql(fit_log_ratios(corpus, tgt))}

    Log-ratios ride as ``CAST('<repr>' AS DOUBLE)`` literals (repr
    round-trips IEEE doubles; the string cast dodges SQL's decimal
    default), so the stored derive and a post-hoc :func:`weight_expr`
    rescoring agree bit-for-bit."""
    n = len(log_ratios)
    if portable_hash:
        bucket = f"CAST(CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT) % {n} AS INT)"
    else:
        bucket = f"CAST(pmod(xxhash64(tok), {n}) AS INT)"
    lits = ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in log_ratios)
    agg = (
        f"aggregate(split({text_col}, ' '), CAST(0.0 AS DOUBLE), "
        f"(acc, tok) -> acc + element_at(array({lits}), {bucket} + 1))"
    )
    return f"round({agg}, {dp}) + 0.0D"


def gumbel_topk(
    weights: DataFrame,
    k: int = 100,
    id_col: str = "doc_id",
    weight_col: str = "dsir_logweight",
) -> DataFrame:
    """The resampling step of DSIR: draw a without-replacement sample
    of ``k`` docs with probability ∝ exp(log-weight) via the Gumbel
    top-k trick — score = logweight + Gumbel(0,1), take the k largest.

    The Gumbel noise is seeded from the doc id (uniform u in (0,1)
    parsed from the leading md5 hex, g = -ln(-ln(u))), so the sample is
    a pure function of the corpus: replay-deterministic, no RNG state,
    identical in the DuckDB oracle. Selection orders by the ROUNDED
    score (4 dp, doc-id tiebreak) so an engine's last-ulp ln()
    difference cannot flip the boundary. Spark plans this as
    TakeOrderedAndProject — per-partition top-k then a k-row merge on
    the driver side of the exchange, never a global sort of the corpus.
    """
    u = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast("double") + 1.0) / F.lit(
        4294967297.0
    )
    score = F.round(F.col(weight_col) + (-F.log(-F.log(u))), 4) + F.lit(0.0)
    return (
        weights.select(F.col(id_col), F.col(weight_col), score.alias("sample_score"))
        .orderBy(F.col("sample_score").desc(), F.col(id_col))
        .limit(k)
    )


def sample_topk_sql(
    table: str = "documents",
    target_predicate: str = "lang = 'en'",
    k: int = 100,
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> str:
    """DuckDB oracle for ``importance_weights`` → ``gumbel_topk``."""
    hexdig = "0123456789abcdef"
    hm = " + ".join(
        f"(strpos('{hexdig}', substr(m, {i + 1}, 1)) - 1) * {16 ** (7 - i)}" for i in range(8)
    )
    weights = importance_weights_sql(table, target_predicate, id_col=id_col, n_buckets=n_buckets)
    return f"""
    WITH w AS ({weights}),
    g AS (
      SELECT {id_col}, dsir_logweight,
             (CAST(({hm}) AS BIGINT) + 1.0) / 4294967297.0 AS u
      FROM (SELECT {id_col}, dsir_logweight, md5(CAST({id_col} AS VARCHAR)) AS m FROM w)
    )
    SELECT {id_col}, dsir_logweight,
           round(dsir_logweight + (-ln(-ln(u))), 4) + 0.0 AS sample_score
    FROM g
    ORDER BY sample_score DESC, {id_col}
    LIMIT {k}
    """


def importance_weights_sql(
    table: str = "documents",
    target_predicate: str = "lang = 'en'",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    ngram: int = 1,
) -> str:
    """DuckDB oracle: the identical computation over the same md5
    bucket hash (leading 8 hex chars parsed positionally — the
    convention shared with the simhash oracle). ``ngram=2`` appends
    space-joined adjacent pairs to the feature list, mirroring
    :func:`_grams` (DuckDB lists are 1-indexed; ``range(1, len)`` is
    half-open, so ``i`` runs over the bigram start positions)."""
    hexdig = "0123456789abcdef"
    h = " + ".join(
        f"(strpos('{hexdig}', substr(m, {i + 1}, 1)) - 1) * {16 ** (7 - i)}" for i in range(8)
    )
    if ngram == 1:
        feats = f"string_split({text_col}, ' ')"
    elif ngram == 2:
        feats = (
            f"list_concat(string_split({text_col}, ' '), "
            f"list_transform(range(1, len(string_split({text_col}, ' '))), "
            f"i -> string_split({text_col}, ' ')[i] || ' ' || string_split({text_col}, ' ')[i + 1]))"
        )
    else:
        raise ValueError(f"ngram must be 1 or 2, got {ngram}")
    return f"""
    WITH toks AS (
      SELECT {id_col}, ({target_predicate}) AS is_tgt,
             md5(unnest({feats})) AS m
      FROM {table}
    ),
    hb AS (
      SELECT {id_col}, is_tgt, CAST(({h}) AS BIGINT) % {n_buckets} AS bucket FROM toks
    ),
    db AS (
      SELECT {id_col}, is_tgt, bucket, count(*)::BIGINT AS cnt
      FROM hb GROUP BY 1, 2, 3
    ),
    bc AS (
      SELECT bucket, sum(cnt)::BIGINT AS raw_n,
             sum(CASE WHEN is_tgt THEN cnt ELSE 0 END)::BIGINT AS tgt_n
      FROM db GROUP BY 1
    ),
    tot AS (SELECT sum(raw_n)::BIGINT AS raw_t, sum(tgt_n)::BIGINT AS tgt_t FROM bc),
    lr AS (
      SELECT bucket,
             ln((tgt_n + 1.0) / (tgt_t + {n_buckets}))
             - ln((raw_n + 1.0) / (raw_t + {n_buckets})) AS lr
      FROM bc, tot
    )
    SELECT db.{id_col}, sum(cnt)::BIGINT AS n_tokens,
           round(sum(cnt * lr.lr), 4) + 0.0 AS dsir_logweight
    FROM db JOIN lr USING (bucket)
    GROUP BY db.{id_col}
    """
