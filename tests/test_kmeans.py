"""Spherical k-means trainer for IVF centroids: cluster recovery on
separated blobs, determinism, monotone objective, empty-cluster
survival, and end-to-end integration with the IVF index build/query."""

from __future__ import annotations

import math

import numpy as np
import pytest

from oec_etl_spark.operators.similarity import (
    brute_topk,
    ivf_index_build,
    ivf_topk,
    kmeans_fit,
)


def _blobs(spark, n_per=30, dim=16, n_blobs=3, spread=0.05, rng_seed=11):
    """Unit-ish vectors in n_blobs well-separated directions."""
    rng = np.random.default_rng(rng_seed)
    dirs = []
    for b in range(n_blobs):
        d = np.zeros(dim)
        d[b] = 1.0  # orthogonal blob centers
        dirs.append(d)
    rows = []
    for b, d in enumerate(dirs):
        for i in range(n_per):
            v = d + rng.normal(0, spread, dim)
            rows.append((f"b{b}_{i:03d}", b, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id string, blob int, embedding array<double>")


def test_kmeans_recovers_separated_blobs(spark):
    df = _blobs(spark)
    res = kmeans_fit(df, k=3, max_iter=10, seed=7)
    cents = res.centroids.collect()
    assert len(cents) == 3
    # every centroid is unit-norm and points at exactly one blob axis
    owners = []
    for r in cents:
        v = r["centroid"]
        assert abs(sum(x * x for x in v) - 1.0) < 1e-9
        owners.append(int(np.argmax(np.abs(v))))
    assert sorted(owners) == [0, 1, 2]  # one centroid per blob, none merged
    # objective (mean max-cosine) converged near 1 and never decreased
    # noise spread 0.05 across 16 dims puts the expected within-blob
    # cosine around 0.98; converged means close to that, far above the
    # ~0.33 of a random 3-way split
    assert res.objective[-1] > 0.97
    assert all(b >= a - 1e-9 for a, b in zip(res.objective, res.objective[1:]))
    assert res.n_iter <= 10


def test_kmeans_is_deterministic(spark):
    df = _blobs(spark, rng_seed=12)
    a = kmeans_fit(df, k=3, seed=7)
    b = kmeans_fit(df, k=3, seed=7)
    ca = sorted(map(tuple, ((r["centroid_id"], tuple(r["centroid"])) for r in a.centroids.collect())))
    cb = sorted(map(tuple, ((r["centroid_id"], tuple(r["centroid"])) for r in b.centroids.collect())))
    assert a.n_iter == b.n_iter
    for (ia, va), (ib, vb) in zip(ca, cb):
        assert ia == ib
        # double sums across shuffle partitions may differ in the last ulp
        assert all(abs(x - y) < 1e-9 for x, y in zip(va, vb))


def test_kmeans_survives_empty_clusters(spark):
    # 5 identical vectors, k=3: two clusters must end empty and keep
    # their (initial) centroid instead of crashing or emitting NaN
    rows = [(f"v{i}", [1.0, 0.0, 0.0, 0.0]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    res = kmeans_fit(df, k=3, max_iter=5)
    cents = res.centroids.collect()
    assert len(cents) == 3
    for r in cents:
        assert all(math.isfinite(x) for x in r["centroid"])


def test_kmeans_k_larger_than_corpus_raises(spark):
    df = spark.createDataFrame([("v0", [1.0, 0.0])], "vec_id string, embedding array<double>")
    with pytest.raises(ValueError, match="exceeds corpus size"):
        kmeans_fit(df, k=2)


def test_trained_centroids_drive_ivf_end_to_end(spark, tmp_path):
    """kmeans_fit → ivf_index_build → ivf_topk: with nprobe=1 on
    well-separated blobs, IVF answers equal brute force (the query's
    whole true top-k lives in one cluster) while scanning only that
    cluster's partition."""
    df = _blobs(spark, rng_seed=13).drop("blob")
    res = kmeans_fit(df, k=3, seed=7)
    index = str(tmp_path / "ivf")
    ivf_index_build(df, res.centroids, index)
    q = [1.0] + [0.0] * 15  # dead-center of blob 0
    want = brute_topk(df, q, k=5).collect()
    got_df = ivf_topk(spark, index, res.centroids, q, k=5, nprobe=1)
    got = got_df.collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in want]
    # brute rounds cos to 6 decimals, ivf to 4 — compare at ivf precision
    assert all(abs(g["cos"] - w["cos"]) < 1e-4 for g, w in zip(got, want))
    # the probed scan is partition-pruned to 1 of 3 cluster dirs
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
