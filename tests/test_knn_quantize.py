"""Semantics of the k-NN graph join and int8 quantization helpers
(round-2 sixth pass). The registered queries carry the DuckDB oracle;
these tests pin the properties the oracle can't see: rank contiguity,
self-exclusion, duplicate recall, and the round-to-nearest error bound.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from oec_etl_spark.functions.vectors import (
    dequantize_max_err,
    quantize_int8,
    quantize_scale,
)
from oec_etl_spark.operators import similarity


def _vecs(n: int, dim: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(n)]


def test_knn_join_ranks_and_self_exclusion(spark):
    dim = 16
    base = _vecs(40, dim, seed=3)
    base.append(list(base[0]))  # vec 40 duplicates vec 0 → cos 1.0
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(base)], "vec_id long, embedding array<float>"
    )
    planes = similarity.rp_hyperplanes(n_planes=16, dim=dim, seed=11)
    out = similarity.knn_join(df, planes, n_bands=4, k=3).collect()

    assert all(r["vec_id"] != r["neighbor_id"] for r in out)
    by_vec: dict[int, list] = {}
    for r in out:
        by_vec.setdefault(r["vec_id"], []).append(r)
    for vid, rows in by_vec.items():
        rows.sort(key=lambda r: r["nn_rank"])
        assert [r["nn_rank"] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= 3
        cosines = [r["cos"] for r in rows]
        assert cosines == sorted(cosines, reverse=True)
    # an exact duplicate always shares every LSH band → must be rank 1
    assert by_vec[0][0]["neighbor_id"] == 40 and by_vec[0][0]["cos"] == 1.0
    assert by_vec[40][0]["neighbor_id"] == 0


def test_quantize_roundtrip_error_bound_and_code_range(spark):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(_vecs(50, 32, seed=9))],
        "vec_id long, embedding array<float>",
    )
    scale = quantize_scale(F.col("embedding"))
    rows = df.select(
        scale.alias("scale"),
        dequantize_max_err(F.col("embedding"), scale).alias("max_err"),
        F.array_max(quantize_int8(F.col("embedding"), scale)).alias("qmax"),
        F.array_min(quantize_int8(F.col("embedding"), scale)).alias("qmin"),
    ).collect()
    for r in rows:
        # round-to-nearest: reconstruction error is at most half a step
        assert r["max_err"] <= r["scale"] / 2 + 1e-12
        assert -127 <= r["qmin"] <= r["qmax"] <= 127
