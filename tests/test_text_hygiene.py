"""Edge-case tests for the training-data hygiene operators:
PII redaction, Gopher-style repetition metrics, and benchmark
decontamination (n-gram overlap).

The oracle queries (doc_pii_redact / doc_repetition_filter /
doc_decontaminate) prove parity with DuckDB on the corpus; these tests
pin the semantic corners the corpus can't reach — pattern
disambiguation, single-word docs, sub-n-gram docs — and the plan shape
(benchmark grams must broadcast).
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from oec_etl_spark.functions import text as tx
from oec_etl_spark.operators import decontam


def _redact(spark, s: str) -> str:
    df = spark.createDataFrame([Row(text=s)])
    return df.select(tx.pii_redact(F.col("text")).alias("r")).first()["r"]


def test_pii_each_pattern_redacts(spark):
    assert _redact(spark, "mail a.b+c_d@sub.example.co now") == "mail <EMAIL> now"
    assert _redact(spark, "ssn 123-45-6789 end") == "ssn <SSN> end"
    assert _redact(spark, "call 555-123-4567 or 555.123.4567") == "call <PHONE> or <PHONE>"
    assert _redact(spark, "host 192.168.0.1 up") == "host <IP> up"


def test_pii_ssn_phone_shapes_are_disjoint(spark):
    # 3-2-4 is an SSN, 3-3-4 a phone; neither pattern may consume the other
    assert _redact(spark, "123-45-6789 555-123-4567") == "<SSN> <PHONE>"


def test_pii_leaves_clean_text_untouched(spark):
    s = "no pii here just words and 42 numbers like 2024"
    assert _redact(spark, s) == s


def test_pii_mid_token_digits_not_redacted(spark):
    # \b guards: digit runs embedded in identifiers must survive
    s = "id x123-45-6789y stays"
    assert _redact(spark, s) == s


def _rep(spark, s: str):
    df = spark.createDataFrame([Row(text=s)])
    return df.select(
        tx.dup_word_frac(F.col("text")).alias("w"),
        tx.dup_bigram_frac(F.col("text")).alias("b"),
        tx.mean_word_len(F.col("text")).alias("m"),
    ).first()


def test_repetition_single_word_doc(spark):
    # guards against Spark's descending sequence(1, 0) trap
    r = _rep(spark, "lonely")
    assert r["w"] == 0.0 and r["b"] == 0.0 and r["m"] == 6.0


def test_repetition_fully_repeated_doc(spark):
    r = _rep(spark, "a a a a")
    assert r["w"] == 0.75  # 1 distinct of 4
    assert r["b"] == round(1 - 1 / 3, 4)  # bigram "a a" x3
    assert r["m"] == 1.0


def test_repetition_all_distinct_doc(spark):
    r = _rep(spark, "one two three four")
    assert r["w"] == 0.0 and r["b"] == 0.0
    assert r["m"] == round((len("one two three four") - 3) / 4, 4)


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_decontamination_flags_only_overlapping_docs(spark):
    bench = _docs(spark, [(0, "w1 w2 w3 w4 w5 w6 w7 w8 tail")])
    corpus = _docs(
        spark,
        [
            (1, "pre w1 w2 w3 w4 w5 w6 w7 w8 post"),  # shares the 8-gram
            (2, "w1 w2 w3 w4 w5 w6 w7 other post x"),  # only a 7-gram prefix
            (3, "short doc under eight"),  # < n words: no grams at all
        ],
    )
    hits = {r["doc_id"]: r["n_contaminated_grams"]
            for r in decontam.contamination(corpus, bench).collect()}
    assert hits == {1: 1}
    clean = sorted(r["doc_id"] for r in decontam.decontaminate(corpus, bench).collect())
    assert clean == [2, 3]


def test_decontamination_benchmark_side_is_broadcast(spark):
    bench = _docs(spark, [(0, "w1 w2 w3 w4 w5 w6 w7 w8")])
    corpus = _docs(spark, [(1, "w1 w2 w3 w4 w5 w6 w7 w8 more")])
    df = decontam.contamination(corpus, bench)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_word_ngrams_distinct_within_doc(spark):
    # a doc repeating one 8-gram twice yields it once
    text = " ".join(["a b c d e f g h"] * 2 + ["i"])
    grams = decontam.word_ngrams(_docs(spark, [(7, text)])).collect()
    gram_set = {g["gram"] for g in grams}
    assert len(grams) == len(gram_set)
    assert "a b c d e f g h" in gram_set
