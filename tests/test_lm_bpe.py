"""Bigram-LM perplexity scoring (operators/lm.py) and distributed BPE
training (operators/bpe.py) — semantics beyond the registry oracle
sweep in test_queries_oracle.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from oec_etl_spark.operators import bpe, lm


# ---------------------------------------------------------------- bigram LM
def test_lm_separate_train_corpus(spark):
    """Docs matching the training distribution score lower xent than an
    out-of-distribution doc under a model trained on a SEPARATE corpus."""
    train = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(20)], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "zq xv qq zz xx vv")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["xent_bits"] for r in lm.score_bigram_xent(docs, train).collect()}
    assert out[1] < out[2]


def test_lm_unseen_bigram_floors_not_inf(spark):
    """Add-k smoothing: a doc of entirely unseen tokens gets a finite
    score (the uniform floor), never NULL/inf."""
    train = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    docs = spark.createDataFrame([(9, "zz yy xx")], "doc_id long, text string")
    row = lm.score_bigram_xent(docs, train).collect()[0]
    assert row["n_bigrams"] == 2
    assert row["xent_bits"] is not None and row["xent_bits"] > 0


def test_lm_head_split_equals_plain_join(spark, sf_dir):
    """The Zipf head/tail join split is a physical rewrite only: a tiny
    head_k (forcing almost everything through the tail) and a huge one
    (everything through the broadcast head) agree exactly."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    a = lm.score_bigram_xent(docs, head_k=1).orderBy("doc_id").collect()
    b = lm.score_bigram_xent(docs, head_k=1 << 20).orderBy("doc_id").collect()
    assert a == b


def test_lm_scoring_join_has_broadcast_head(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = lm.score_bigram_xent(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# --------------------------------------------------------------------- BPE
def _ref_bpe(word_counts: dict[str, int], n_merges: int):
    """Plain-Python reference BPE trainer (greedy left-to-right
    replace-all merge, ties lexicographic on the wrapped pair)."""
    reprs = {w: "".join(f"<{c}>" for c in w) for w in word_counts}
    merges = []
    for rank in range(1, n_merges + 1):
        weights: dict[str, int] = {}
        for w, cnt in word_counts.items():
            toks = reprs[w].replace("><", ">\x00<").split("\x00")
            for i in range(len(toks) - 1):
                p = toks[i] + toks[i + 1]
                weights[p] = weights.get(p, 0) + cnt
        if not weights:
            break
        best = min(weights, key=lambda p: (-weights[p], p))
        merges.append((rank, best, weights[best]))
        merged = best.replace("><", "")
        reprs = {w: r.replace(best, merged) for w, r in reprs.items()}
    return merges, reprs


def test_bpe_matches_python_reference(spark):
    rows = [(0, "low low lower lowest"), (1, "new newer newest low"), (2, "wide wider widest")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    wc: dict[str, int] = {}
    for _, t in rows:
        for w in t.split(" "):
            wc[w] = wc.get(w, 0) + 1
    ref_merges, ref_reprs = _ref_bpe(wc, 5)
    got_merges, words = bpe.learn_merges(docs, n_merges=5)
    assert [(m.rank, m.pair, m.weight) for m in got_merges] == ref_merges
    got_reprs = {r["word"]: r["repr"] for r in words.collect()}
    assert got_reprs == ref_reprs


def test_bpe_overlapping_run_merges_left_to_right(spark):
    """'lll' with top pair (l,l) must become [ll, l] — the greedy BPE
    result — not [l, ll] or a double merge."""
    docs = spark.createDataFrame([(0, "lll lll lo")], "doc_id long, text string")
    merges, words = bpe.learn_merges(docs, n_merges=1)
    assert (merges[0].left, merges[0].right) == ("l", "l")
    reprs = {r["word"]: r["repr"] for r in words.collect()}
    assert reprs["lll"] == "<ll><l>"


def test_bpe_merge_count_capped_by_available_pairs(spark):
    """Single-char words yield no pairs: training stops early instead
    of looping or failing."""
    docs = spark.createDataFrame([(0, "a b a b")], "doc_id long, text string")
    merges, _ = bpe.learn_merges(docs, n_merges=4)
    assert merges == []


def test_bpe_compression_decreases_tokens(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    _, words = bpe.learn_merges(docs, n_merges=4)
    row = bpe.compression(words).collect()[0]
    assert row["tokens"] < row["chars"]  # every merge strictly shrinks
    assert abs(row["tok_per_char"] - row["tokens"] / row["chars"]) < 5e-7  # round(_, 6)


def test_bpe_corpus_scanned_once(spark, sf_dir):
    """The training loop iterates on a localCheckpointed word table —
    the final words plan must not re-read the parquet corpus."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    _, words = bpe.learn_merges(docs, n_merges=2)
    plan = words._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" not in plan


def test_lm_doc_without_bigrams_excluded(spark):
    docs = spark.createDataFrame(
        [(1, "solo"), (2, "two words")], "doc_id long, text string"
    )
    out = lm.score_bigram_xent(docs).select("doc_id").collect()
    assert {r["doc_id"] for r in out} == {2}


def test_bpe_encode_roundtrip_and_ids(spark):
    """decode(encode(x)) == x for every doc, ids are consistent with
    the deterministic vocab (chars sorted, then merges in rank order),
    and chain-application equals the trained table's final reprs."""
    rows = [(0, "low low lower lowest"), (1, "new newer newest low"), (2, "a bb a")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges, words = bpe.learn_merges(docs, n_merges=4)
    v = bpe.vocab(merges, words)
    # vocab layout: sorted alphabet first, merge tokens after in rank order
    alpha = sorted({c for _, t in rows for c in t.replace(" ", "")})
    assert [t for t, _ in sorted(v.items(), key=lambda kv: kv[1])[: len(alpha)]] == alpha
    for i, m in enumerate(merges):
        assert v[m.left + m.right] == len(alpha) + i

    enc = bpe.encode_words(docs, merges)
    got = {r["doc_id"]: r["txt"] for r in enc.select("doc_id", bpe.decode(enc).alias("txt")).collect()}
    assert got == {i: t for i, t in rows}

    ids = {r["doc_id"]: r for r in bpe.encode(docs, merges, v).collect()}
    inv = {i: t for t, i in v.items()}
    for d, t in rows:
        assert ids[d]["n_words"] == len(t.split(" "))
        assert "".join(inv[i] for i in ids[d]["token_ids"]) == t.replace(" ", "")
        assert ids[d]["n_bpe_tokens"] == len(ids[d]["token_ids"])


def test_bpe_encode_unknown_char_is_minus_one(spark):
    """Encoding a corpus containing a char the TRAINING corpus never
    saw must yield -1, not null."""
    train = spark.createDataFrame([(0, "aa ab aa")], "doc_id long, text string")
    merges, words = bpe.learn_merges(train, n_merges=2)
    v = bpe.vocab(merges, words)
    other = spark.createDataFrame([(9, "aa zz")], "doc_id long, text string")
    row = bpe.encode(other, merges, v).collect()[0]
    assert -1 in row["token_ids"] and None not in row["token_ids"]
