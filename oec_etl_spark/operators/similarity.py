"""Similarity search over embedding columns (array<float>).

- ``brute_topk``: exact cosine top-k against one query vector. The
  query vector rides along as a literal array → the scan stays a single
  map-only stage plus one small top-k (no shuffle of the vectors).
- ``ivf_assign`` / ``ivf_topk``: the scale path. Centroids are a small
  broadcast table; each vector joins only its nearest centroid's
  cluster, so a query probes 1/k of the corpus. (Real IVF trains
  centroids with k-means; deterministic seeding by taking the first k
  vectors keeps the oracle reproducible — the *plumbing* — assignment
  join, cluster pruning — is the part that matters at 100 TB.)
- embedding near-dup: pairs with cosine ≥ τ within a bucket (full
  cross-join bounded to small corpora / within-cluster at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oec_etl_spark.functions.vectors import cosine


def brute_topk(
    df: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine. Output: (vec_id, cos) ordered desc, id asc."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    out = df.select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("cos"))
    return out.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)


def ivf_assign(
    df: DataFrame, centroids: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    cent_id: str = "centroid_id", cent_vec: str = "centroid",
) -> DataFrame:
    """Assign each vector to its max-cosine centroid via a broadcast
    join + max_by — one pass, no shuffle of the big side.
    Output: (vec_id, centroid_id, cos)."""
    joined = df.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col(cent_id),
        F.round(cosine(F.col(vec_col), F.col(cent_vec)), 6).alias("cos"),
    )
    best = joined.groupBy(id_col).agg(
        F.max_by(F.struct(F.col(cent_id), F.col("cos")), F.struct(F.col("cos"), (-F.col(cent_id)).alias("nid"))).alias("_b")
    )
    return best.select(id_col, F.col(f"_b.{cent_id}").alias(cent_id), F.col("_b.cos").alias("cos"))


def embedding_neardup_pairs(
    df: DataFrame, threshold: float, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Pairs with cosine ≥ threshold. Quadratic candidate space — at
    scale, call this *within* an IVF cluster or LSH bucket; the operator
    itself is the verify step."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


# ----------------------------------------------------- random-hyperplane LSH
def rp_hyperplanes(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Seeded random hyperplanes for sign-LSH (SimHash for real vectors).
    Components rounded so the identical literals can be embedded in the
    DuckDB oracle SQL — engine and oracle can never disagree on a sign."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return [[round(float(x), 6) for x in rng.standard_normal(dim)] for _ in range(n_planes)]


def rp_lsh_signature(
    df: DataFrame, planes: list[list[float]], id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """n-bit LSH bucket id: bit i = sign(v · plane_i). Map-only (no
    shuffle); vectors close in cosine land in the same bucket with
    probability 1 - θ/π per bit. All arithmetic in double on both
    engine and oracle sides."""
    v = F.col(vec_col).cast("array<double>")
    sig = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        dot = F.aggregate(F.zip_with(v, plane, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)
        sig = sig + (dot >= 0).cast("int") * (1 << i)
    return df.select(F.col(id_col), F.col(vec_col), sig.alias("bucket"))


def rp_lsh_neardup_pairs(
    df: DataFrame, planes: list[list[float]], threshold: float,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """ANN near-dup: candidate pairs share an LSH bucket (equi-join on
    bucket — a real hash join, never an all-pairs product), verified by
    exact cosine ≥ threshold. The scale path for embedding dedup: the
    cross product is confined to each bucket (corpus/2^bits expected)."""
    sigs = rp_lsh_signature(df, planes, id_col, vec_col)
    a = sigs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket")
    b = sigs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket")
    return (
        a.join(b, ["bucket"]).filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def ivf_topk(
    df: DataFrame, centroids: DataFrame, query_vec: list[float], k: int = 10, nprobe: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
    cent_id: str = "centroid_id", cent_vec: str = "centroid",
) -> DataFrame:
    """IVF query: rank centroids against the query, search only vectors
    assigned to the ``nprobe`` nearest clusters, exact cosine inside.
    The corpus-side scan prunes to nprobe/n_centroids of the data — the
    standard recall/throughput trade at 10^10-vector scale (probed
    clusters are partition-pruned when the table is written bucketed by
    centroid_id). Output: (vec_id, cos) top-k."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probed = [
        r[0]
        for r in centroids.select(cent_id, F.round(cosine(F.col(cent_vec), q), 6).alias("c"))
        .orderBy(F.desc("c"), F.asc(cent_id))
        .limit(nprobe)
        .collect()
    ]
    assigned = ivf_assign(df, centroids, id_col, vec_col, cent_id, cent_vec)
    cand = df.join(
        assigned.filter(F.col(cent_id).isin(probed)).select(id_col), id_col
    )
    out = cand.select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 4).alias("cos"))
    return out.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)
