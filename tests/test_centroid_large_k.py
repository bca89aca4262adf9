"""Large-k nearest-centroid assignment (VERDICT r2 item 1): above
LITERAL_K_MAX the literal-centroid expression is replaced by a map-only
Arrow matmul UDF whose plan size is independent of k. Tests: exact
parity with the literal path (values AND tie rule), plan shape (one
ArrowEvalPython, no join/exchange), a k=2048 plan that the literal path
could not reasonably build, and kmeans/IVF integration through the
auto-selected path."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from oec_etl_spark.operators import similarity
from oec_etl_spark.operators.similarity import (
    LITERAL_K_MAX,
    brute_topk,
    ivf_index_build,
    ivf_topk,
    kmeans_fit,
    nearest_centroid_cols,
)


def _vectors(spark, n=120, dim=8, seed=5):
    rng = np.random.default_rng(seed)
    rows = [(f"v{i:04d}", [float(x) for x in rng.normal(0, 1, dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id string, embedding array<double>")


def _centroids(k, dim=8, seed=9):
    rng = np.random.default_rng(seed)
    return [
        {"centroid_id": i, "centroid": [float(x) for x in rng.normal(0, 1, dim)]}
        for i in range(k)
    ]


def _assign(df, rows, **kw):
    cid, cos = nearest_centroid_cols(rows, "embedding", "centroid_id", "centroid", **kw)
    return {
        r["vec_id"]: (r["centroid_id"], r["cos"])
        for r in df.select("vec_id", cid, cos).collect()
    }


def test_arrow_path_matches_literal_path_exactly(spark):
    """Same data, same centroids, k=40: force each path via the
    threshold and require byte-identical assignments (cos is rounded to
    6dp in both, so equality is exact, not approximate)."""
    df = _vectors(spark)
    rows = _centroids(40)
    lit = _assign(df, rows, k_literal_max=10**9)   # force literal
    arw = _assign(df, rows, k_literal_max=0)       # force Arrow matmul
    assert lit == arw


def test_tie_breaks_to_lowest_centroid_id_in_both_paths(spark):
    """Two identical centroids: the winner must be the LOWER id in both
    plans (argmax-first-max on the Arrow side, -id struct max on the
    literal side)."""
    df = _vectors(spark, n=20)
    c = [0.5, -0.25, 1.0, 0.0, 0.75, -0.5, 0.25, 1.5]
    rows = [
        {"centroid_id": 3, "centroid": c},
        {"centroid_id": 7, "centroid": list(c)},
    ]
    for forced in (10**9, 0):
        got = _assign(df, rows, k_literal_max=forced)
        assert all(cid == 3 for cid, _ in got.values()), f"k_literal_max={forced}"


def test_arrow_plan_is_map_only_single_udf(spark):
    """The large-k plan must stay map-only: exactly one ArrowEvalPython
    (both struct fields dedupe into one UDF call) and zero joins or
    exchanges."""
    df = _vectors(spark, n=30)
    cid, cos = nearest_centroid_cols(
        _centroids(32), "embedding", "centroid_id", "centroid", k_literal_max=0
    )
    out = df.select("vec_id", cid, cos)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan
    for bad in ("Join", "Exchange"):
        assert bad not in plan, plan
    assert out.count() == 30


def test_k_2048_builds_and_runs(spark):
    """k=2048 — far beyond what the literal plan could hold (2048
    structs × dim doubles in one expression) — must analyze, build a
    constant-size plan, and produce assignments that match a numpy
    oracle computed driver-side."""
    k, dim = 2048, 8
    assert k > LITERAL_K_MAX
    df = _vectors(spark, n=50, dim=dim, seed=21)
    rows = _centroids(k, dim=dim, seed=22)
    cid, cos = nearest_centroid_cols(rows, "embedding", "centroid_id", "centroid")
    out = df.select("vec_id", cid, cos)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan  # the auto-selected large-k path
    got = {r["vec_id"]: (r["centroid_id"], r["cos"]) for r in out.collect()}

    C = np.array([r["centroid"] for r in rows])
    Cn = np.linalg.norm(C, axis=1)
    for r in df.collect():
        v = np.array(r["embedding"])
        s = np.round((C @ v) / (Cn * np.linalg.norm(v)), 6)
        want_id = int(np.argmax(s))
        assert got[r["vec_id"]] == (want_id, s[want_id])


def test_kmeans_and_ivf_auto_select_arrow_path(spark, tmp_path, monkeypatch):
    """Drop the threshold to 2 and run the existing kmeans→IVF→query
    chain end-to-end: every assignment inside kmeans_fit and
    ivf_index_build now goes through the Arrow path, and IVF top-k must
    still equal brute force with partition pruning intact."""
    monkeypatch.setattr(similarity, "LITERAL_K_MAX", 2)
    rng = np.random.default_rng(13)
    rows = []
    for b in range(3):
        d = np.zeros(16)
        d[b] = 1.0
        for i in range(30):
            v = d + rng.normal(0, 0.05, 16)
            rows.append((f"b{b}_{i:03d}", [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")

    res = kmeans_fit(df, k=3, seed=7)
    assert res.objective[-1] > 0.97
    index = str(tmp_path / "ivf_arrow")
    ivf_index_build(df, res.centroids, index)
    q = [1.0] + [0.0] * 15
    want = brute_topk(df, q, k=5).collect()
    got_df = ivf_topk(spark, index, res.centroids, q, k=5, nprobe=1)
    got = got_df.collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in want]
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
