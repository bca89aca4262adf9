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
  whole corpus. ``kmeans_fit`` trains real centroids (spherical
  k-means, one map-only corpus scan + one k*dim-cell shuffle per
  iteration); the registered oracle queries keep deterministic seed
  centroids so DuckDB can reproduce them exactly.
- embedding near-dup: ``rp_lsh_banded_pairs`` is the registered scale
  path (banded sign-LSH candidates via bucket equi-join, exact cosine
  verify inside); ``embedding_neardup_pairs`` (all-pairs) survives only
  as the within-bucket verify / tiny-corpus baseline.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oec_etl_spark.functions.vectors import cosine, dot, norm


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


def semdedup_exemplars(
    df: DataFrame, centroids: DataFrame, threshold: float,
    id_col: str = "vec_id", vec_col: str = "embedding",
    cent_id: str = "centroid_id", cent_vec: str = "centroid",
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the
    corpus with IVF centroids, find cosine-≥-threshold pairs ONLY
    within each cluster, connect them into components, and keep one
    exemplar per component — the member closest to its centroid
    (semantically most central), ties to the smallest id.

    Scale shape: the quadratic pair search is confined per cluster —
    at 10^9 docs one picks k so clusters hold ~10^4-10^5 vectors (the
    published SemDeDup regime), making the within-cluster join a
    bucket-confined product like the LSH paths, never corpus².
    Assignment is the map-only broadcast ``ivf_assign``; components
    use min-label propagation (clusters are shallow by construction —
    pairs share a centroid, so component diameter is tiny).

    Output: one row per input vector —
    (vec_id, centroid_id, exemplar_id, is_exemplar)."""
    from oec_etl_spark.operators.dedup import cc_propagate

    assign = ivf_assign(df, centroids, id_col, vec_col, cent_id, cent_vec)
    with_vec = assign.join(df.select(id_col, vec_col), id_col)
    a = with_vec.select(
        F.col(id_col).alias("doc_a"), cent_id, F.col(vec_col).alias("__va")
    )
    b = with_vec.select(
        F.col(id_col).alias("doc_b"), cent_id, F.col(vec_col).alias("__vb")
    )
    pairs = (
        a.join(b, cent_id)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b",
            F.round(cosine(F.col("__va"), F.col("__vb")), 4).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select("doc_a", "doc_b")
    )
    labels, _ = cc_propagate(df.select(id_col), pairs, id_col=id_col)
    full = assign.join(
        labels.withColumnRenamed("u", id_col).withColumnRenamed("lbl", "__comp"),
        id_col,
    )
    exemplars = full.groupBy("__comp").agg(
        F.max_by(
            F.col(id_col),
            F.struct(F.col("cos"), (-F.col(id_col)).alias("__nid")),
        ).alias("exemplar_id")
    )
    return full.join(exemplars, "__comp").select(
        id_col,
        cent_id,
        "exemplar_id",
        (F.col(id_col) == F.col("exemplar_id")).alias("is_exemplar"),
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


def knn_join(
    df: DataFrame, planes: list[list[float]], n_bands: int, k: int,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate k-NN self-join: for EVERY vector, its top-k nearest
    neighbors by cosine among banded sign-LSH candidates. The all-pairs
    k-NN graph (the clustering / semantic-dedup building block) without
    the O(n²) product: candidates come from the same multi-band bucket
    EQUI-join as ``rp_lsh_banded_pairs`` (both orientations kept, since
    each row needs its own neighbor list), then one window ranks each
    row's candidates by exact cosine. At 100 TB the only shuffles are
    the band-bucket hash join and the per-vector rank — both keyed,
    never a cross product; candidate counts per vector are bounded by
    bucket occupancy (corpus/2^bits expected per band).

    Output: (vec_id, neighbor_id, cos, nn_rank) with nn_rank 1..k,
    ties broken by neighbor id — deterministic for the oracle."""
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
    a = ex.select(F.col(id_col).alias("__knn_id"), F.col(vec_col).alias("va"), "band_idx", "band_key")
    b_ = ex.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vb"), "band_idx", "band_key")
    cand = (
        a.join(b_, ["band_idx", "band_key"])
        .filter(F.col("__knn_id") != F.col("neighbor_id"))
        .dropDuplicates(["__knn_id", "neighbor_id"])  # a pair may share several bands
    )
    scored = cand.select(
        "__knn_id", "neighbor_id", F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cos")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("__knn_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
        .withColumnRenamed("__knn_id", id_col)
    )


LITERAL_K_MAX = 256
"""Above this many centroids the literal-centroid expression is the
wrong plan: the generated expression holds k structs × dim doubles and
codegen/analysis cost grows with k long before the data does. The
auto-selected large-k path is :func:`_nearest_centroid_arrow` — see
``nearest_centroid_cols``."""


def _nearest_centroid_arrow(centroid_rows, cent_id: str, cent_vec: str):
    """Large-k nearest-centroid assignment as ONE vectorized Arrow UDF:
    the centroid matrix rides in the task closure (PySpark auto-
    broadcasts large pickled commands), each Arrow batch is assigned
    with a single BLAS matmul (batch×dim @ dim×k), and the operator
    stays MAP-ONLY — no join, no k× row amplification, no shuffle.

    Why not the broadcast-join variant at large k: crossJoin(broadcast)
    + max_by materializes k rows per vector before the re-aggregate —
    at k=10^5 over 10^10 vectors that is a 10^15-row intermediate; the
    matmul does the same FLOPs with zero row blowup. (``ivf_assign``
    remains the mid-k join-shaped alternative.)

    Semantics parity with ``_nearest_centroid_cols``: cosine rounded to
    6dp, ties broken to the LOWEST centroid_id (centroids sorted by id;
    argmax returns the first maximum). Zero-norm vectors (input or
    centroid) are defined as cos 0.0 against everything in BOTH plans —
    without the guard, 0/0 here yields NaN cosines and numpy argmax
    picks the first NaN, silently diverging from the literal plan."""
    from pyspark.sql.functions import pandas_udf

    ordered = sorted(centroid_rows, key=lambda r: int(r[cent_id]))
    ids = np.array([int(r[cent_id]) for r in ordered], dtype=np.int64)
    C = np.array([[float(x) for x in r[cent_vec]] for r in ordered], dtype=np.float64)
    Cn = np.linalg.norm(C, axis=1)
    Cn = np.where(Cn == 0.0, 1.0, Cn)  # zero centroid ⇒ dot 0 ⇒ cos 0.0

    @pandas_udf(f"struct<{cent_id}:int, cos:double>")
    def _assign(v: pd.Series) -> pd.DataFrame:
        if len(v) == 0:
            return pd.DataFrame({
                cent_id: pd.Series([], dtype="int32"),
                "cos": pd.Series([], dtype="float64"),
            })
        M = np.array(v.tolist(), dtype=np.float64)
        Mn = np.linalg.norm(M, axis=1, keepdims=True)
        Mn = np.where(Mn == 0.0, 1.0, Mn)  # zero vector ⇒ cos 0.0 everywhere
        S = np.round((M @ C.T) / (Mn * Cn[None, :]), 6)
        best = np.argmax(S, axis=1)  # first max ⇒ lowest centroid_id on ties
        return pd.DataFrame({
            cent_id: ids[best].astype("int32"),
            "cos": S[np.arange(len(best)), best],
        })

    return _assign


def nearest_centroid_cols(
    centroid_rows, vec_col: str, cent_id: str, cent_vec: str,
    k_literal_max: int | None = None,
):
    """(centroid_id, cos) assignment columns, auto-selecting the plan by
    k: at k ≤ ``k_literal_max`` (default :data:`LITERAL_K_MAX`, read at
    call time so tests can force either path) the literal-centroid
    expression (pure JVM codegen, fastest); above it the Arrow matmul
    UDF (map-only, plan size independent of k — the 10^5-centroid IVF
    regime). Both share the exact tie rule (max cos 6dp, then lowest
    id), so callers and oracles never observe which plan ran."""
    if k_literal_max is None:
        k_literal_max = LITERAL_K_MAX
    if len(centroid_rows) <= k_literal_max:
        return _nearest_centroid_cols(centroid_rows, vec_col, cent_id, cent_vec)
    b = _nearest_centroid_arrow(centroid_rows, cent_id, cent_vec)(F.col(vec_col))
    # both fields extract from ONE UDF call: ExtractPythonUDFs dedupes
    # the canonically-equal expression into a single ArrowEvalPython
    return b[cent_id].alias(cent_id), b["cos"].alias("cos")


def _nearest_centroid_cols(centroid_rows, vec_col: str, cent_id: str, cent_vec: str):
    """(centroid_id, cos) columns picking each row's max-cosine centroid
    as a single MAP-ONLY expression (array_max over (cos, -id) structs)
    — no join, no shuffle, whole corpus assigned in one scan. Centroids
    ride along as literals (they are broadcast-small by definition).
    Tie rule: highest cosine, then lowest centroid_id — identical to the
    row_number ordering in the DuckDB oracle. Zero-norm vectors (input
    or centroid) make ``cosine``'s denominator 0 — a DIVIDE_BY_ZERO
    error under ANSI mode (Spark 4 default), NaN otherwise; try_divide
    + coalesce pins them to cos 0.0 so this plan and the large-k Arrow
    plan stay bit-identical on degenerate rows (both then tie-break to
    the lowest id). Nonzero norms take the exact same arithmetic as
    ``cosine``."""
    def _cos0(a, b):
        return F.coalesce(F.try_divide(dot(a, b), norm(a) * norm(b)), F.lit(0.0))

    best = F.array_max(
        F.array(*[
            F.struct(
                F.round(_cos0(F.col(vec_col), F.array(*[F.lit(float(x)) for x in r[cent_vec]])), 6).alias("cos"),
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
    cid, _cos = nearest_centroid_cols(rows, vec_col, cent_id, cent_vec)
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


# ----------------------------------------------------- k-means trainer
@dataclasses.dataclass
class KMeansResult:
    centroids: DataFrame  # (centroid_id int, centroid array<double>), unit-norm
    n_iter: int
    # mean max-cosine of the assignment entering each iteration —
    # spherical k-means is monotone in this, so the list never decreases
    objective: list[float]


def _unit(v: list[float]) -> list[float]:
    import math

    nrm = math.sqrt(sum(x * x for x in v)) or 1.0
    return [x / nrm for x in v]


def kmeans_fit(
    df: DataFrame, k: int,
    id_col: str = "vec_id", vec_col: str = "embedding",
    max_iter: int = 10, tol: float = 1e-4, seed: int = 7,
) -> KMeansResult:
    """Spherical k-means (Lloyd's iterations under cosine) to train the
    IVF centroids that the rest of this module consumes — replacing the
    deterministic-seed placeholder with a real trainer while keeping
    the same (centroid_id, centroid) contract.

    Scale shape per iteration (the part that must survive 10^10
    vectors): ONE corpus scan — the assignment is the same map-only
    literal-centroid expression ``ivf_index_build`` uses (no join, no
    shuffle of the vectors) — followed by a partial-aggregated shuffle
    of only k*dim (cluster, dimension) cells; the driver sees k*dim
    numbers per iteration, never vectors. Nothing is cached or
    collected at corpus scale.

    Determinism: init picks the k vectors with the smallest
    ``xxhash64(id, seed)`` (a seeded uniform draw with no Python RNG —
    reproducible across runs and partitionings); ties in assignment
    break to the lowest centroid_id exactly like the IVF oracle.
    Empty clusters keep their previous centroid. Stops early when no
    centroid moves by more than ``tol`` (1 - cos between old and new).

    The reference has no vector operators at all; this supports the
    new-engine ANN surface (SURVEY §2.4 / VERDICT round-1 item 1).
    """
    init_rows = (
        df.select(id_col, vec_col)
        .withColumn("__h", F.xxhash64(F.col(id_col).cast("string"), F.lit(int(seed))))
        .orderBy("__h", id_col)
        .limit(k)
        .collect()
    )
    if len(init_rows) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(init_rows)}")
    cents = [_unit([float(x) for x in r[vec_col]]) for r in init_rows]
    dim = len(cents[0])

    objective: list[float] = []
    n_iter = 0
    for n_iter in range(1, max_iter + 1):
        rows = [{"centroid_id": i, "centroid": c} for i, c in enumerate(cents)]
        cid, cos = nearest_centroid_cols(rows, vec_col, "centroid_id", "centroid")
        assigned = df.select(cid, cos, F.col(vec_col))
        # one shuffle of k*dim cells: per-(cluster, dimension) sums with
        # map-side combine; cluster size and mean cosine ride along on
        # the pos=0 cell so the objective costs no extra pass
        stats = (
            assigned.select("centroid_id", "cos", F.posexplode(vec_col).alias("pos", "val"))
            .groupBy("centroid_id", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"), F.avg("cos").alias("avc"))
        ).collect()

        sums: dict[int, list[float]] = {}
        size: dict[int, int] = {}
        obj_num = obj_den = 0.0
        for r in stats:
            c = int(r["centroid_id"])
            sums.setdefault(c, [0.0] * dim)[int(r["pos"])] = float(r["s"])
            if int(r["pos"]) == 0:
                size[c] = int(r["n"])
                obj_num += float(r["avc"]) * int(r["n"])
                obj_den += int(r["n"])
        objective.append(obj_num / obj_den if obj_den else 0.0)

        new_cents = [
            _unit([x / size[i] for x in sums[i]]) if size.get(i) else cents[i]
            for i in range(k)
        ]
        shift = max(
            1.0 - sum(a * b for a, b in zip(old, new))
            for old, new in zip(cents, new_cents)
        )
        cents = new_cents
        if shift < tol:
            break

    spark = df.sparkSession
    out = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)],
        "centroid_id int, centroid array<double>",
    )
    return KMeansResult(centroids=out, n_iter=n_iter, objective=objective)
