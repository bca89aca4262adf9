"""MinHash-LSH recall property at production tuning (VERDICT item 4).

The oracle-tier defaults (8 hashes / 4 bands) exist for DuckDB
comparability; production near-dup wants 128 hashes / 16 bands. This
test pins the property that matters: on a seeded corpus whose true
near-dup pairs are high-Jaccard copies, the LSH candidate set CONTAINS
every pair with exact shingle-Jaccard ≥ 0.5. (With b=16 bands of r=8
rows the S-curve midpoint is (1/16)^(1/8) ≈ 0.71, and the constructed
dup pairs sit at J ≥ 0.8 where catch probability is ≈ 1-(1-J^8)^16 >
0.999 — deterministic under the fixed seed.) Verified for BOTH hash
tiers: portable md5 and production xxhash64.
"""

from __future__ import annotations

import random

import pytest

from oec_etl_spark.operators import dedup as dd

VOCAB = [f"w{i:03d}" for i in range(400)]


def _corpus():
    rng = random.Random(1234)
    docs = []
    for i in range(30):
        words = [rng.choice(VOCAB) for _ in range(40)]
        docs.append((i, " ".join(words)))
        if i < 10:  # near-dup copy: one word substituted → J ≈ 0.9+
            dup = list(words)
            dup[rng.randrange(len(dup))] = rng.choice(VOCAB)
            docs.append((100 + i, " ".join(dup)))
    return docs


@pytest.mark.parametrize("portable", [True, False])
def test_lsh_candidates_contain_all_high_jaccard_pairs(spark, portable):
    docs = spark.createDataFrame(_corpus(), "doc_id long, text string")
    truth = {
        (r["doc_a"], r["doc_b"])
        for r in dd.ngram_jaccard_pairs(
            docs, threshold=0.5, max_shingle_df=10**9  # exact: no stop-shingle cap
        ).collect()
    }
    assert len(truth) >= 10  # every planted dup pair is high-Jaccard
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in dd.dedup_minhash_lsh(
            docs, n_minhash=128, n_bands=16, portable_hash=portable
        ).collect()
    }
    assert truth <= cands  # recall: no true near-dup missed


def test_oracle_tier_defaults_unchanged():
    """The registered CORRECTNESS queries bake these into their SQL —
    changing them must be a deliberate oracle migration."""
    assert (dd.N_MINHASH, dd.N_BANDS, dd.SHINGLE_LEN, dd.MAX_SHINGLE_DF) == (8, 4, 12, 50)
