"""Distributed BPE tokenizer training (byte-pair encoding, Sennrich et
al. 2016 — public).

Training a subword tokenizer is the first compute step of every LLM
data pipeline, and at 100 TB it is a distributed-counting problem: the
classic trainers (e.g. the public HuggingFace ``tokenizers`` crate)
already reduce the corpus to a (word, count) table and learn merges
from THAT — corpus size only affects the initial count. This module is
the Spark-native version of exactly that algorithm:

1. one corpus pass builds the distinct-word count table (hash
   aggregate, map-side combined — the only scan of the raw text);
2. each of the ``n_merges`` iterations explodes the CURRENT subword
   representation of the (tiny, vocabulary-sized) word table into
   adjacent-pair occurrences, hash-aggregates pair weights, and takes
   the argmax — one small shuffle per merge, corpus never re-read;
3. the chosen pair is applied as a literal string replace on the
   representation column (codegen'd), and the loop continues.

The argmax itself is a driver-side decision over ONE row per
iteration — the same O(1)-per-round driver involvement as the k-means
centroid update in ``operators/similarity.py`` — never a corpus
collect.

Representation trick (shared with the DuckDB oracle so both engines
are bit-identical): a word's subword sequence is stored as a string
with every token wrapped in angle brackets, ``hello`` →
``<h><e><l><l><o>``. A merge of pair (l, l) is then the plain string
replace ``'<l><l>' -> '<ll>'``: wrappers make adjacent matches share
no characters, so replace-all == BPE's "merge every occurrence
left-to-right", including the overlapping-run case (``<l><l><l>`` →
``<ll><l>``, exactly the greedy BPE result). No regex, no lookaround —
portable across Spark and DuckDB by construction.

The reference repo tokenizes nothing (closest: zfill/substring string
massaging, ``/root/reference/etl/dim_hs_pipeline.py:19-32``); this is
part of the LLM-pipeline surface the new engine adds.

Precondition (shared with the DuckDB oracle, so both engines agree on
every input they agree is valid): whitespace tokens must not contain
the wrapper characters ``<`` ``>`` — a ``>`` inside a word breaks the
bracket token stream. Tokenizer-training pipelines strip markup before
BPE anyway (HTML tags would otherwise dominate the learned merges);
run text through a markup-stripping derive first, or remap the two
characters, if the corpus carries raw HTML.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

N_MERGES = 6  # oracle-tier default: keeps the generated CTE chain readable

_TOK_RE = "<[^>]+>"


@dataclass(frozen=True)
class Merge:
    rank: int
    left: str
    right: str
    weight: int

    @property
    def pair(self) -> str:
        return f"<{self.left}><{self.right}>"

    @property
    def merged(self) -> str:
        return f"<{self.left}{self.right}>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over whitespace tokens — the single corpus pass."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _wrap_chars(col) -> F.Column:
    return F.array_join(
        F.transform(
            F.regexp_extract_all(col, F.lit("."), F.lit(0)),
            lambda c: F.concat(F.lit("<"), c, F.lit(">")),
        ),
        "",
    )


def _pair_weights(words: DataFrame) -> DataFrame:
    """Adjacent-subword-pair weights of the current representation,
    counted with within-word multiplicity and weighted by word count."""
    tk = F.regexp_extract_all(F.col("repr"), F.lit(_TOK_RE), F.lit(0))
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(tk) - 1),
        lambda i: F.concat(F.element_at(tk, i), F.element_at(tk, i + F.lit(1))),
    )
    pairs = F.when(F.size(tk) >= 2, pairs).otherwise(F.array().cast("array<string>"))
    return (
        words.select(F.explode(pairs).alias("pair"), "cnt")
        .groupBy("pair")
        .agg(F.sum("cnt").cast("long").alias("wgt"))
    )


def learn_merges(
    docs: DataFrame, *, text_col: str = "text", n_merges: int = N_MERGES
) -> tuple[list[Merge], DataFrame]:
    """Train ``n_merges`` BPE merges. Returns (merges in rank order,
    final word table with columns word, cnt, repr).

    Ties in pair weight break lexicographically on the pair string —
    fixed and identical in the SQL oracle, so training is fully
    deterministic."""
    words = (
        word_counts(docs, text_col)
        .withColumn("repr", _wrap_chars(F.col("word")))
        .localCheckpoint(eager=True)  # truncate lineage; corpus is never re-read
    )
    merges: list[Merge] = []
    for rank in range(1, n_merges + 1):
        top = _pair_weights(words).orderBy(F.desc("wgt"), "pair").limit(1).collect()
        if not top:
            break
        pair, wgt = top[0]["pair"], int(top[0]["wgt"])
        left, right = pair[1:-1].split("><", 1)
        m = Merge(rank, left, right, wgt)
        merges.append(m)
        words = words.withColumn("repr", F.replace(F.col("repr"), F.lit(m.pair), F.lit(m.merged)))
    return merges, words


def merges_df(spark: SparkSession, merges: list[Merge]) -> DataFrame:
    return spark.createDataFrame(
        [(m.rank, m.left, m.right, m.weight) for m in merges],
        "rank int, lhs string, rhs string, weight long",
    )


def compression(words: DataFrame) -> DataFrame:
    """Corpus-level compression of the trained tokenizer: total
    whitespace words / chars / post-merge subword tokens, and tokens
    per char. One exact-integer row; the ratio is a single division so
    both engines produce the identical double."""
    n_tok = F.size(F.regexp_extract_all(F.col("repr"), F.lit(_TOK_RE), F.lit(0)))
    return words.agg(
        F.sum("cnt").cast("long").alias("words"),
        F.sum(F.col("cnt") * F.length("word")).cast("long").alias("chars"),
        F.sum(F.col("cnt") * n_tok).cast("long").alias("tokens"),
        F.round(
            F.sum(F.col("cnt") * n_tok) / F.sum(F.col("cnt") * F.length("word")), 6
        ).alias("tok_per_char"),
    )


# ------------------------------------------------------------------ encoding
def vocab(merges: list[Merge], words: DataFrame) -> dict[str, int]:
    """Deterministic token→id table: every single char seen in the
    trained word table, sorted, gets ids 0..n-1; merge tokens follow in
    rank order (the standard BPE id scheme: base alphabet then merges).
    The collect is driver-side control metadata — vocab size is
    |alphabet| + n_merges, never corpus-sized."""
    chars = sorted(
        r["c"]
        for r in words.select(
            F.explode(F.regexp_extract_all(F.col("word"), F.lit("."), F.lit(0))).alias("c")
        ).distinct().collect()
    )
    v = {c: i for i, c in enumerate(chars)}
    for m in merges:
        v[m.left + m.right] = len(v)
    return v


def _encode_word(merges: list[Merge]):
    """word → array of bracket-stripped subword tokens, as one chained
    codegen'd expression (wrap chars, apply each merge as a literal
    replace in rank order, extract). Applying the chain to a word is
    exactly the trained table's final repr for that word — the chain is
    word-local — so encoding needs NO join against the word table."""
    def enc(w):
        r = _wrap_chars(w)
        for m in merges:
            r = F.replace(r, F.lit(m.pair), F.lit(m.merged))
        toks = F.regexp_extract_all(r, F.lit(_TOK_RE), F.lit(0))
        return F.transform(toks, lambda t: t.substr(F.lit(2), F.length(t) - 2))
    return enc


def encode_words(docs: DataFrame, merges: list[Merge], *, text_col: str = "text") -> DataFrame:
    """docs + ``word_tokens: array<array<string>>`` (outer: words in
    order, inner: that word's BPE tokens). Map-only — the merge chain
    rides as literals, the corpus is scanned once, nothing shuffles."""
    words = F.split(F.col(text_col), " ")
    return docs.withColumn("word_tokens", F.transform(words, _encode_word(merges)))


def decode(df: DataFrame, col: str = "word_tokens") -> F.Column:
    """Inverse of :func:`encode_words`: concat each word's tokens, join
    words with single spaces. decode(encode(x)) == x for any corpus
    (BPE merges never cross the space separator)."""
    return F.array_join(
        F.transform(F.col(col), lambda w: F.array_join(w, "")), " "
    )


def encode(docs: DataFrame, merges: list[Merge], vocab_map: dict[str, int], *,
           id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Tokenize the corpus with a trained merge list: (id_col, n_words,
    n_bpe_tokens, token_ids) where token_ids is the doc's full BPE id
    sequence. Unknown tokens (chars absent from the training corpus)
    encode as -1 rather than nulls so downstream array math never
    NPEs. Entirely map-only: merges AND vocab ride as plan literals
    (both are |alphabet|+n_merges small — same justification as
    small-k centroid literals in operators/similarity.py)."""
    lut = F.create_map(*[F.lit(x) for kv in sorted(vocab_map.items()) for x in kv])
    enc = encode_words(docs, merges, text_col=text_col)
    flat = F.flatten(F.col("word_tokens"))
    return enc.select(
        F.col(id_col),
        F.size(F.col("word_tokens")).cast("long").alias("n_words"),
        F.size(flat).cast("long").alias("n_bpe_tokens"),
        F.transform(flat, lambda t: F.coalesce(lut[t], F.lit(-1)).cast("int")).alias("token_ids"),
    )


# --------------------------------------------------------------------- oracle
def _chain_ctes(table: str, text_col: str, n_merges: int) -> str:
    """The shared CTE chain: w → r0 → (p1,m1,r1) → … → (pK,mK,rK)."""
    parts = [
        f"""w AS (
      SELECT u.w AS word, count(*)::BIGINT AS cnt
      FROM {table}, LATERAL unnest(string_split({text_col}, ' ')) AS u(w)
      GROUP BY 1
    ),
    r0 AS (
      SELECT word, cnt,
             list_aggregate(list_transform(regexp_extract_all(word, '.'), c -> '<' || c || '>'),
                            'string_agg', '') AS repr
      FROM w
    )"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(f"""p{i} AS (
      SELECT u.pair AS pair, sum(cnt)::BIGINT AS wgt
      FROM (SELECT cnt, regexp_extract_all(repr, '{_TOK_RE}') AS tk FROM r{i - 1}) s,
           LATERAL unnest(list_transform(range(1, len(tk)), i -> tk[i] || tk[i + 1])) AS u(pair)
      GROUP BY 1
    ),
    m{i} AS (SELECT pair, wgt FROM p{i} ORDER BY wgt DESC, pair LIMIT 1),
    r{i} AS (
      SELECT word, cnt,
             replace(repr, (SELECT pair FROM m{i}),
                     replace((SELECT pair FROM m{i}), '><', '')) AS repr
      FROM r{i - 1}
    )""")
    return ",\n    ".join(parts)


def learn_merges_sql(table: str = "documents", text_col: str = "text",
                     n_merges: int = N_MERGES) -> str:
    """DuckDB oracle replaying the exact training loop as a generated
    CTE chain (one p/m/r stage per merge)."""
    ranked = "\n      UNION ALL ".join(
        f"SELECT {i} AS rank, pair, wgt FROM m{i}" for i in range(1, n_merges + 1)
    )
    return f"""
    WITH {_chain_ctes(table, text_col, n_merges)}
    SELECT rank::INT AS rank,
           string_split(substr(pair, 2, length(pair) - 2), '><')[1] AS lhs,
           string_split(substr(pair, 2, length(pair) - 2), '><')[2] AS rhs,
           wgt AS weight
    FROM ({ranked})
    """


def encode_sql(table: str = "documents", text_col: str = "text",
               id_col: str = "doc_id", n_merges: int = N_MERGES) -> str:
    """DuckDB oracle for :func:`encode`: re-learns the merge chain with
    the shared CTEs, derives the identical char+merge vocab, joins each
    doc word to its final repr in the trained table, and emits the id
    sequence as a CSV string (ordered by word position then token
    position)."""
    ranked = "\n      UNION ALL ".join(
        f"SELECT {i} AS rank, pair FROM m{i}" for i in range(1, n_merges + 1)
    )
    return f"""
    WITH {_chain_ctes(table, text_col, n_merges)},
    chars AS (SELECT DISTINCT unnest(regexp_extract_all(word, '.')) AS tok FROM w),
    vocab AS (
      SELECT tok, (row_number() OVER (ORDER BY tok) - 1)::INT AS id FROM chars
      UNION ALL
      SELECT substr(replace(pair, '><', ''), 2, length(replace(pair, '><', '')) - 2) AS tok,
             ((SELECT count(*) FROM chars) + rank - 1)::INT AS id
      FROM ({ranked})),
    dw AS (
      SELECT {id_col}, s.wpos AS wpos, s.word AS word FROM (
        SELECT {id_col},
               unnest(list_transform(range(1, len(t) + 1),
                   i -> struct_pack(wpos := i, word := t[i]))) AS s
        FROM (SELECT {id_col}, string_split({text_col}, ' ') AS t FROM {table}))),
    dt AS (
      SELECT {id_col}, wpos, s.tpos AS tpos, s.tok AS tok FROM (
        SELECT {id_col}, wpos,
               unnest(list_transform(range(1, len(tk) + 1),
                   i -> struct_pack(tpos := i,
                                    tok := substr(tk[i], 2, length(tk[i]) - 2)))) AS s
        FROM (SELECT dw.{id_col}, dw.wpos,
                     regexp_extract_all(r.repr, '{_TOK_RE}') AS tk
              FROM dw JOIN r{n_merges} r USING (word)))),
    per_doc AS (
      SELECT {id_col},
             count(*)::BIGINT AS n_bpe_tokens,
             string_agg(v.id, ',' ORDER BY wpos, tpos) AS ids_csv
      FROM dt JOIN vocab v USING (tok)
      GROUP BY {id_col})
    SELECT d.{id_col},
           len(string_split(d.{text_col}, ' '))::BIGINT AS n_words,
           coalesce(p.n_bpe_tokens, 0)::BIGINT AS n_bpe_tokens,
           coalesce(p.ids_csv, '') AS ids_csv
    FROM {table} d LEFT JOIN per_doc p USING ({id_col})
    """


def compression_sql(table: str = "documents", text_col: str = "text",
                    n_merges: int = N_MERGES) -> str:
    return f"""
    WITH {_chain_ctes(table, text_col, n_merges)}
    SELECT sum(cnt)::BIGINT AS words,
           sum(cnt * length(word))::BIGINT AS chars,
           sum(cnt * len(regexp_extract_all(repr, '{_TOK_RE}')))::BIGINT AS tokens,
           round(sum(cnt * len(regexp_extract_all(repr, '{_TOK_RE}')))::DOUBLE
                 / sum(cnt * length(word)), 6) AS tok_per_char
    FROM r{n_merges}
    """
