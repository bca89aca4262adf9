"""IVF recall gate (round-4 verdict item 5): the partition-pruned ANN
index needs a quality number next to its speed number. Uses the same
measurement the BENCH artifact is rendered from
(scripts/bench_ann_recall.py).

Two corpora, two claims:

- clustered corpus (deterministic synthetic, the regime IVF serves):
  recall@10 ≥ 0.9 while scanning 4/16 partitions, monotone in nprobe;
- driver testdata corpus (near-random — mean same-label cosine 0.019,
  the worst case for ANY cell-probing index, where even an oracle
  label-partition gets ~0.21 recall@10): the index must still
  CONCENTRATE true neighbors ≥3× over scanning a random nprobe/16
  share of the files.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from bench_ann_recall import make_clustered_corpus, measure_recall  # noqa: E402


@pytest.fixture(scope="module")
def clustered(spark):
    return measure_recall(spark, make_clustered_corpus(spark, n=1000), n_queries=10)


@pytest.fixture(scope="module")
def testdata(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return measure_recall(spark, emb, n_queries=10)


def test_clustered_recall_at_nprobe4_is_high(clustered):
    """nprobe=4 of 16 centroids reads 25% of the index partitions and
    must recover ≥ 0.9 of the exact top-10 on clusterable data."""
    assert clustered["recall"][4] >= 0.9, clustered["recall"]


def test_clustered_recall_monotone_in_nprobe(clustered):
    """More probed partitions can only add candidates — recall must be
    non-decreasing in nprobe (the IVF quality/throughput dial)."""
    r = clustered["recall"]
    assert r[1] <= r[2] <= r[4], r


def test_clustered_nprobe1_already_useful(clustered):
    """One probed partition (6% of the index) catches most true
    neighbors when the corpus actually clusters."""
    assert clustered["recall"][1] >= 0.7, clustered["recall"]


def test_testdata_concentration_beats_random_scan(testdata):
    """On the near-random testdata embeddings absolute recall is
    information-theoretically capped (~0.21 even for an oracle
    partitioner at nprobe=1), so the gate is the concentration factor:
    the learned cells must hold ≥3× more of the true top-10 than a
    random same-sized share of the corpus."""
    assert testdata["concentration"][1] >= 3.0, testdata["concentration"]


def test_testdata_recall_monotone_in_nprobe(testdata):
    r = testdata["recall"]
    assert r[1] <= r[2] <= r[4], r
