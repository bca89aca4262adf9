"""Text-analysis functions for training-data pipelines.

Each function exists twice from ONE definition: a Spark Column builder
(pure pyspark.sql.functions — codegen'd, no Python in the hot path)
and an ANSI-SQL renderer for the DuckDB oracle. Occurrence counting is
done with length/replace arithmetic (identical semantics in every SQL
engine) instead of regex wherever possible, so engine and oracle can
never drift on dialect.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# marker words per language for the n-gram/marker language-ID heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "es": [" el ", " la ", " de "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " les ", " et "],
    "zh": [" zh ", " shi ", " de "],
}
STOPWORDS = [" the ", " a ", " and ", " of "]
PUNCT = [".", ",", "!", "?"]


# ------------------------------------------------------------ building blocks
def occurrences(col: Column, sub: str) -> Column:
    """# of occurrences of a literal substring (length/replace arithmetic)."""
    return (F.length(col) - F.length(F.replace(col, F.lit(sub), F.lit("")))) / F.lit(len(sub))


def occurrences_sql(expr: str, sub: str) -> str:
    lit = sub.replace("'", "''")
    return f"((length({expr}) - length(replace({expr}, '{lit}', ''))) / {len(sub)})"


def n_tokens(col: Column) -> Column:
    """Whitespace token count: spaces + 1 (generator/driver text is
    single-space separated; deterministic in both engines)."""
    return (occurrences(col, " ") + 1).cast("long")


def n_tokens_sql(expr: str) -> str:
    return f"CAST({occurrences_sql(expr, ' ')} + 1 AS BIGINT)"


# --------------------------------------------------------------- quality score
def quality_score(col: Column) -> Column:
    """Deterministic quality heuristic: favors mid-length docs with a
    sane stopword ratio and low punctuation density. Returns [0, 1]."""
    toks = n_tokens(col)
    stop = sum((occurrences(col, s) for s in STOPWORDS), F.lit(0))
    punct = sum((occurrences(col, p) for p in PUNCT), F.lit(0))
    stop_ratio = stop / toks
    punct_ratio = punct / F.length(col)
    len_score = F.least(F.length(col) / F.lit(500.0), F.lit(1.0))
    return F.round(
        F.greatest(
            F.lit(0.0),
            F.least(F.lit(1.0), len_score * 0.5 + stop_ratio * 2.0 - punct_ratio * 5.0 + 0.25),
        ),
        4,
    )


def quality_score_sql(expr: str) -> str:
    toks = n_tokens_sql(expr)
    stop = " + ".join(occurrences_sql(expr, s) for s in STOPWORDS)
    punct = " + ".join(occurrences_sql(expr, p) for p in PUNCT)
    return (
        f"round(greatest(0.0, least(1.0, "
        f"least(length({expr}) / 500.0, 1.0) * 0.5 + (({stop}) / {toks}) * 2.0 "
        f"- (({punct}) / length({expr})) * 5.0 + 0.25)), 4)"
    )


# ------------------------------------------------------------------ lang id
def lang_scores(col: Column) -> dict[str, Column]:
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    return {lang: sum((occurrences(padded, m) for m in marks), F.lit(0)) for lang, marks in LANG_MARKERS.items()}


def predict_lang(col: Column) -> Column:
    """Marker-frequency language ID: argmax score, ties broken by the
    fixed language order, 'unk' when nothing matches."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    expr: Column = F.lit("unk")
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def predict_lang_sql(expr: str) -> str:
    padded = f"(' ' || lower({expr}) || ' ')"
    scores = {
        lang: "(" + " + ".join(occurrences_sql(padded, m) for m in marks) + ")"
        for lang, marks in LANG_MARKERS.items()
    }
    best = f"greatest({', '.join(scores.values())})"
    out = "'unk'"
    for lang in reversed(list(LANG_MARKERS)):
        out = f"CASE WHEN {scores[lang]} > 0 AND {scores[lang]} = {best} THEN '{lang}' ELSE {out} END"
    return f"({out})"


# -------------------------------------------------------------- BPE-ish tokens
# GPT-2-style coarse pre-tokenizer: letter runs | digit runs | single
# non-alnum marks. RE2-compatible, so Spark (Java regex) and DuckDB
# (RE2) agree exactly.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(BPE_PATTERN), F.lit(0))).cast("long")


def bpe_token_count_sql(expr: str) -> str:
    return f"CAST(len(regexp_extract_all({expr}, '{BPE_PATTERN}')) AS BIGINT)"


# ------------------------------------------------------------- fingerprinting
def doc_fingerprint(col: Column) -> Column:
    """Whitespace-normalized md5 content fingerprint."""
    return F.md5(F.lower(F.regexp_replace(col, r"\s+", " ")))


def doc_fingerprint_sql(expr: str) -> str:
    return f"md5(lower(regexp_replace({expr}, '\\s+', ' ', 'g')))"


# ------------------------------------------------------------- PII redaction
# Training-data scrubbing: replace emails / SSNs / phone numbers / IPv4
# addresses with typed placeholder tokens. Patterns are RE2-compatible
# (no lookarounds, no backrefs) so Spark's Java regex and DuckDB's RE2
# produce byte-identical output. Order matters: SSN (3-2-4) before
# phone (3-3-4) — the group widths are disjoint, so neither can consume
# the other's match, but applying the more specific shape first keeps
# that true if a pattern is ever loosened.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


def pii_redact(col: Column) -> Column:
    """Redact all PII_PATTERNS occurrences (chained regexp_replace —
    codegen'd JVM regex, no Python in the row path)."""
    out = col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_redact_sql(expr: str) -> str:
    out = expr
    for _, pat, repl in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


def pii_redact_spark_sql(expr: str) -> str:
    """Spark-SQL rendering of the same redaction chain (3-arg
    regexp_replace replaces ALL matches; no 'g' flag in Spark). This
    is the expression to hand to ``EngineConfig.derives`` /
    ``--derive`` for ingest-time scrubbing: PII never reaches the
    stored table, every downstream consumer (exports, change feed,
    indexes) sees only redacted text, and the whole chain is one
    codegen'd projection inside the existing pre-merge pass."""
    out = expr
    for _, pat, repl in PII_PATTERNS:
        p = pat.replace("\\", "\\\\")
        out = f"regexp_replace({out}, '{p}', '{repl}')"
    return out


# --------------------------------------------- within-doc repetition metrics
# Gopher-style repetition/quality signals (Rae et al. 2021 §A1.1, public):
# fraction of duplicate words / word-bigrams and mean word length over the
# single-space-separated token stream. One definition, two renderers:
# Spark higher-order array functions vs DuckDB list functions.

def tokens(col: Column) -> Column:
    return F.split(col, " ")


def dup_word_frac(col: Column) -> Column:
    t = tokens(col)
    return F.round(F.lit(1.0) - F.size(F.array_distinct(t)) / F.size(t), 4)


def dup_word_frac_sql(t: str) -> str:
    return f"round(1.0 - CAST(len(list_distinct({t})) AS DOUBLE) / len({t}), 4)"


def word_bigrams(col: Column) -> Column:
    """All adjacent word pairs (1-based element_at, matching DuckDB's
    1-based list indexing). Empty array for single-word docs — the
    guard matters because sequence(1, 0) would DESCEND in Spark."""
    t = tokens(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - 1),
        lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + F.lit(1))),
    )
    return F.when(F.size(t) >= 2, grams).otherwise(F.array().cast("array<string>"))


def dup_bigram_frac(col: Column) -> Column:
    g = word_bigrams(col)
    return F.when(
        F.size(g) > 0,
        F.round(F.lit(1.0) - F.size(F.array_distinct(g)) / F.size(g), 4),
    ).otherwise(F.lit(0.0))


def dup_bigram_frac_sql(t: str) -> str:
    grams = f"list_transform(range(1, len({t})), i -> {t}[i] || ' ' || {t}[i+1])"
    return (
        f"CASE WHEN len({t}) >= 2 THEN "
        f"round(1.0 - CAST(len(list_distinct({grams})) AS DOUBLE) / (len({t}) - 1), 4) "
        f"ELSE 0.0 END"
    )


def mean_word_len(col: Column) -> Column:
    """(total chars - separators) / word count — exact for the
    single-space-separated corpus, no per-word pass needed."""
    t = tokens(col)
    return F.round((F.length(col) - (F.size(t) - 1)) / F.size(t), 4)


def mean_word_len_sql(expr: str, t: str) -> str:
    return f"round(CAST(length({expr}) - (len({t}) - 1) AS DOUBLE) / len({t}), 4)"


# ----------------------------------------------------------- chunking
def chunk_text(col: Column, size: int, stride: int) -> Column:
    """Sliding token windows over a document — the context-window
    chunking step every RAG / long-context training pipeline runs
    before embedding. Chunk i covers tokens [i*stride+1, i*stride+size]
    (1-based); a document shorter than ``size`` yields exactly one
    chunk; the final chunk may be short (never empty). Pure built-in
    Column expressions (split → sequence → transform → slice), so the
    whole thing is codegen'd and map-only: at 100 TB this parallelizes
    per input split with zero shuffle and zero Python.

    Returns array<struct<chunk_id:int, chunk:string,
    n_chunk_tokens:int>> — explode() it for one row per chunk."""
    if stride <= 0 or size <= 0 or stride > size:
        raise ValueError("need 0 < stride <= size")
    t = tokens(col)
    n = F.size(t)
    n_chunks = F.when(n <= size, F.lit(1)).otherwise(
        (F.floor((n - size + stride - 1) / stride) + 1).cast("int")
    )
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            F.array_join(F.slice(t, i * stride + 1, size), " ").alias("chunk"),
            F.least(F.lit(size), n - i * stride).cast("int").alias("n_chunk_tokens"),
        ),
    )
