"""Exact substring (repeated-span) dedup: planted cross-doc spans must
be recovered with exact boundaries, merged when overlapping, ignored
when within-doc only, and strip_dup_spans must remove exactly the
duplicated tokens from every carrier."""

from __future__ import annotations

import pytest

from oec_etl_spark.operators.span_dedup import (
    doc_dup_spans,
    duplicated_grams,
    doc_windows,
    span_dedup_stats,
    strip_dup_spans,
)


def _w(i):  # distinct filler words so no accidental cross-doc n-grams
    return f"w{i:04d}"


def _docs(spark):
    """Three docs: docs 0 and 1 share a planted 12-token span (at
    different offsets); doc 2 is all-unique filler. Window width 8 ⇒
    the shared span yields 5 duplicated windows per doc that must merge
    into ONE maximal span of exactly 12 tokens."""
    span = " ".join(f"dup{i}" for i in range(12))
    d0 = " ".join(_w(i) for i in range(10)) + " " + span + " " + " ".join(_w(i) for i in range(100, 110))
    d1 = span + " " + " ".join(_w(i) for i in range(200, 220))
    d2 = " ".join(_w(i) for i in range(300, 340))
    return spark.createDataFrame(
        [(0, d0), (1, d1), (2, d2)], "doc_id long, text string"
    )


def test_planted_span_recovered_with_exact_boundaries(spark):
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in doc_dup_spans(_docs(spark)).collect()
    }
    # doc 0: span occupies 1-based token positions 11..22; doc 1: 1..12
    assert spans == {0: (11, 22), 1: (1, 12)}


def test_stats_and_ratio(spark):
    rows = {r["doc_id"]: r for r in span_dedup_stats(_docs(spark)).collect()}
    assert set(rows) == {0, 1}  # doc 2 clean → absent
    assert rows[0]["n_dup_spans"] == 1 and rows[0]["dup_tokens"] == 12
    assert rows[0]["n_tokens"] == 32
    assert rows[0]["dup_ratio"] == pytest.approx(12 / 32, abs=1e-4)
    assert rows[1]["dup_tokens"] == 12 and rows[1]["n_tokens"] == 32


def test_within_doc_repetition_is_not_cross_doc(spark):
    """A doc repeating its own 8-gram twice must NOT be flagged: the
    dup test is distinct-doc count, not occurrence count."""
    rep = " ".join(f"r{i}" for i in range(8))
    df = spark.createDataFrame(
        [(0, rep + " " + " ".join(_w(i) for i in range(8)) + " " + rep),
         (1, " ".join(_w(i) for i in range(500, 540)))],
        "doc_id long, text string",
    )
    assert doc_dup_spans(df).count() == 0


def test_two_separate_shared_spans_stay_separate(spark):
    """Two planted spans separated by unique filler in both docs must
    come back as two islands, not one."""
    a = " ".join(f"a{i}" for i in range(9))
    b = " ".join(f"b{i}" for i in range(9))
    d0 = a + " " + " ".join(_w(i) for i in range(20)) + " " + b
    d1 = b + " " + " ".join(_w(i) for i in range(100, 120)) + " " + a
    df = spark.createDataFrame([(0, d0), (1, d1)], "doc_id long, text string")
    per_doc = {r["doc_id"]: r["n_dup_spans"]
               for r in span_dedup_stats(df).collect()}
    assert per_doc == {0: 2, 1: 2}


def test_strip_removes_exactly_the_duplicated_tokens(spark):
    out = {r["doc_id"]: r["text_dedup"] for r in strip_dup_spans(_docs(spark)).collect()}
    assert out[0] == " ".join(_w(i) for i in range(10)) + " " + " ".join(
        _w(i) for i in range(100, 110))
    assert out[1] == " ".join(_w(i) for i in range(200, 220))
    # clean doc passes through untouched
    assert out[2] == " ".join(_w(i) for i in range(300, 340))
    # and no duplicated 8-gram survives in the stripped corpus
    stripped = strip_dup_spans(_docs(spark)).select("doc_id", "text_dedup")
    wins = doc_windows(stripped, text_col="text_dedup")
    assert duplicated_grams(wins).count() == 0


def test_stop_gram_cap_drops_ubiquitous_spans(spark):
    """max_docs: a span present in EVERY doc (license-header shape) is
    excluded by the cap, while a 2-doc span is kept."""
    common = " ".join(f"c{i}" for i in range(8))
    rare = " ".join(f"q{i}" for i in range(8))
    rows = []
    for d in range(6):
        extra = (" " + rare) if d < 2 else ""
        rows.append((d, common + " " + " ".join(_w(100 * d + i) for i in range(10)) + extra))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = doc_dup_spans(df, max_docs=3).collect()
    assert {r["doc_id"] for r in capped} == {0, 1}
    uncapped = doc_dup_spans(df).collect()
    assert {r["doc_id"] for r in uncapped} == {0, 1, 2, 3, 4, 5}


def test_hashed_tier_matches_string_tier(spark):
    """Production tier (xxhash64 grams) must flag the same gram set
    cardinality as the oracle tier on the same corpus."""
    wins = doc_windows(_docs(spark))
    assert duplicated_grams(wins, hashed=True).count() == duplicated_grams(wins).count()


def test_hashed_tier_end_to_end_equals_raw(spark):
    """The production tier (grams as xxhash64 longs through BOTH
    shuffles — the distinct-pair agg and the probe join) must produce
    the same spans, stats, and stripped text as the exact raw tier."""
    docs = _docs(spark)
    raw = sorted(map(tuple, doc_dup_spans(docs).collect()))
    hsh = sorted(map(tuple, doc_dup_spans(docs, hashed=True).collect()))
    assert raw == hsh
    raw_stats = sorted(map(tuple, span_dedup_stats(docs).collect()))
    hsh_stats = sorted(map(tuple, span_dedup_stats(docs, hashed=True).collect()))
    assert raw_stats == hsh_stats
    raw_strip = sorted(map(tuple, strip_dup_spans(docs).select("doc_id", "text_dedup").collect()))
    hsh_strip = sorted(map(tuple, strip_dup_spans(docs, hashed=True).select("doc_id", "text_dedup").collect()))
    assert raw_strip == hsh_strip


def test_hashed_tier_shuffles_longs_not_strings(spark):
    """Scale contract: in the hashed plan, every gram shuffle key is a
    LONG (xxhash64 applied map-side), never the raw window string. In
    Spark's physical-plan rendering long attributes carry the ``L``
    suffix (``gram#12L``); a string gram would render bare."""
    import re

    plan = doc_dup_spans(_docs(spark), hashed=True)._jdf.queryExecution() \
        .executedPlan().toString()
    keys = re.findall(r"hashpartitioning\([^)]*?(gram#\d+L?)", plan)
    assert keys, f"expected gram shuffles in the plan:\n{plan}"
    bare = [k for k in keys if not k.endswith("L")]
    assert not bare, f"raw string gram crossed an Exchange: {bare}"
