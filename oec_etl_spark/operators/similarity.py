"""Similarity search over embedding columns (array<float>).

- ``brute_topk``: exact cosine top-k against one query vector. The
  query vector rides along as a literal array → the scan stays a single
  map-only stage plus one small top-k (no shuffle of the vectors).
- ``ivf_assign`` / ``ivf_index_build`` / ``ivf_topk``: the scale path.
  Centroids are a small broadcast/literal table; the index build
  assigns each vector to its nearest centroid with a MAP-ONLY
  expression (no shuffle) and persists the corpus partitioned by
  ``centroid_id``; a query then ranks centroids driver-side and scans
  ONLY the ``nprobe`` probed partitions — partition pruning does the
  1/k corpus cut, so a query never re-reads (let alone re-assigns) the
  whole corpus. (Real IVF trains centroids with k-means; deterministic
  seeding by taking the first k vectors keeps the oracle reproducible —
  the *plumbing* — assignment, partitioned layout, pruned scan — is the
  part that matters at 10^10 vectors.)
- embedding near-dup: ``rp_lsh_banded_pairs`` is the registered scale
  path (banded sign-LSH candidates via bucket equi-join, exact cosine
  verify inside); ``embedding_neardup_pairs`` (all-pairs) survives only
  as the within-bucket verify / tiny-corpus baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
    """Pairs with cosine ≥ threshold by ALL-PAIRS comparison. Quadratic
    candidate space — never call this on a full corpus; it exists as the
    within-bucket/within-cluster verify step and a tiny-corpus baseline.
    The registered near-dup query routes through ``rp_lsh_banded_pairs``
    (bucket equi-join) instead."""
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


def rp_lsh_banded_pairs(
    df: DataFrame, planes: list[list[float]], n_bands: int, threshold: float,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """The near-dup SCALE path: banded sign-LSH. The len(planes)-bit
    signature is split into ``n_bands`` bands; two vectors become a
    candidate pair iff they agree on AT LEAST ONE whole band (multi-band
    OR-construction: recall at cosine c is 1-(1-p^r)^b with p=1-θ/π,
    r bits/band — banding trades one big bucket for b small ones, the
    same construction as MinHash-LSH). Candidates come from a bucket
    EQUI-join on (band_idx, band_key) — never an all-pairs product; the
    cross product is confined to each band bucket. Exact cosine ≥
    threshold verifies candidates. Output: (id_a, id_b, cos) distinct."""
    r = len(planes) // n_bands
    sigs = rp_lsh_signature(df, planes, id_col, vec_col)
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band_idx"),
            F.shiftright(F.col("bucket"), b * r).bitwiseAND(F.lit((1 << r) - 1)).alias("band_key"),
        )
        for b in range(n_bands)
    ])
    ex = sigs.select(F.col(id_col), F.col(vec_col), F.explode(bands).alias("band")).select(
        id_col, vec_col, "band.band_idx", "band.band_key"
    )
    a = ex.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "band_idx", "band_key")
    b_ = ex.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "band_idx", "band_key")
    cand = (
        a.join(b_, ["band_idx", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])  # a pair may share several bands
    )
    return (
        cand.select("id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def _nearest_centroid_cols(centroid_rows, vec_col: str, cent_id: str, cent_vec: str):
    """(centroid_id, cos) columns picking each row's max-cosine centroid
    as a single MAP-ONLY expression (array_max over (cos, -id) structs)
    — no join, no shuffle, whole corpus assigned in one scan. Centroids
    ride along as literals (they are broadcast-small by definition).
    Tie rule: highest cosine, then lowest centroid_id — identical to the
    row_number ordering in the DuckDB oracle."""
    best = F.array_max(
        F.array(*[
            F.struct(
                F.round(cosine(F.col(vec_col), F.array(*[F.lit(float(x)) for x in r[cent_vec]])), 6).alias("cos"),
                F.lit(-int(r[cent_id])).alias("nid"),
            )
            for r in centroid_rows
        ])
    )
    return (-best["nid"]).cast("int").alias(cent_id), best["cos"].alias("cos")


def ivf_index_build(
    df: DataFrame, centroids: DataFrame, path: str,
    id_col: str = "vec_id", vec_col: str = "embedding",
    cent_id: str = "centroid_id", cent_vec: str = "centroid",
) -> None:
    """Build the IVF index: assign every vector to its nearest centroid
    (map-only expression) and persist the corpus PARTITIONED BY
    centroid_id. One corpus pass at build time; every query thereafter
    reads only its probed partitions. The repartition aligns the write
    with the partition layout (one task per cluster dir, no small-file
    fan-out — same trick as the CDC sink's bucket-aligned write)."""
    rows = centroids.collect()
    cid, _cos = _nearest_centroid_cols(rows, vec_col, cent_id, cent_vec)
    indexed = df.withColumn(cent_id, cid)
    indexed.repartition(F.col(cent_id)).write.mode("overwrite").partitionBy(cent_id).parquet(path)


def ivf_topk(
    spark: SparkSession, index_path: str, centroids: DataFrame, query_vec: list[float],
    k: int = 10, nprobe: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
    cent_id: str = "centroid_id", cent_vec: str = "centroid",
) -> DataFrame:
    """IVF query over a persisted index: rank centroids against the
    query DRIVER-SIDE (centroids are tiny), then scan only the
    ``nprobe`` probed partitions of the index — the `centroid_id IN
    (...)` filter is a partition filter on the index layout, so the
    corpus scan prunes to nprobe/n_centroids of the files (assert-able
    in the physical plan as PartitionFilters). Exact cosine inside.
    Output: (vec_id, cos) top-k."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probed = [
        r[0]
        for r in centroids.select(cent_id, F.round(cosine(F.col(cent_vec), q), 6).alias("c"))
        .orderBy(F.desc("c"), F.asc(cent_id))
        .limit(nprobe)
        .collect()
    ]
    cand = spark.read.parquet(index_path).filter(F.col(cent_id).isin(probed))
    out = cand.select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 4).alias("cos"))
    return out.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)
