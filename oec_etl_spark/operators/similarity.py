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
