"""Deduplication operators for large-scale text corpora.

The scale path for each:
- exact: one hash-groupBy — shuffles only (hash, doc_id) pairs after
  map-side partial aggregation.
- MinHash+LSH: shingle → k minhashes → b bands → bucket-join. Only
  docs sharing a band bucket are ever paired, so the candidate join is
  linear-ish in corpus size instead of O(n²).
- n-gram Jaccard: exact verification on candidate pairs (or bounded
  self-join for small corpora) with a document-frequency cap dropping
  stop-shingles before the join — the classic skew guard.
- SimHash: 64-bit signed-projection fingerprint; near-dups differ in
  few bits.
- embedding cosine: see operators/similarity.py.

Two hash tiers behind one ``portable_hash`` flag (same convention as
``simhash``): the PRODUCTION tier hashes with xxhash64 (JVM-codegen'd,
fixed-width longs — what a 100 TB corpus should run); the ORACLE tier
(portable_hash=True) hashes with md5 strings so the DuckDB oracle can
run the *identical* computation (xxhash64 has no DuckDB equivalent).
All logic is built-ins; SimHash uses bit arithmetic over exploded
tokens — still no Python in the row path.

Tuning (signature length, bands, shingle width, stop-shingle cap) is
parameterized per call; the module constants are the oracle-tier
defaults baked into the registered CORRECTNESS queries. Production
near-dup at scale typically wants n_minhash=128 / n_bands=16+ (see
``tests/test_dedup_recall.py`` for the recall property at that
setting).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_MINHASH = 8  # minhash signature length (oracle-tier default)
N_BANDS = 4  # LSH bands (rows per band = n_minhash // n_bands)
SHINGLE_LEN = 12  # char-shingle width
MAX_SHINGLE_DF = 50  # document-frequency cap (stop-shingle guard)


# ------------------------------------------------------------------ exact
def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: md5(text) groupBy, survivor = min id. Returns
    (text_hash, survivor_id, n_copies)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.min(id_col).alias("survivor_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# ------------------------------------------------------------- shingling
def char_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    shingle_len: int = SHINGLE_LEN,
) -> DataFrame:
    """Distinct char n-gram shingles per doc: explode over a position
    sequence (no Python). Output: (id, shingle)."""
    n = F.length(F.col(text_col)) - (shingle_len - 1)
    return (
        df.select(id_col, text_col)
        .filter(n > 0)
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(1), n)).alias("pos"),
            F.col(text_col),
        )
        .select(F.col(id_col), F.expr(f"substring({text_col}, pos, {shingle_len})").alias("shingle"))
        .distinct()
    )


# ---------------------------------------------------------- minhash + LSH
def _shingle_hash(i: int, portable: bool) -> Column:
    """The i-th independent shingle hash: xxhash64 seeded by column
    position (production) or md5 over a seed-prefixed string (oracle)."""
    if portable:
        return F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))
    return F.xxhash64(F.lit(i), F.col("shingle"))


def minhash_signatures(
    shingles: DataFrame, id_col: str = "doc_id",
    n_minhash: int = N_MINHASH, portable_hash: bool = True,
) -> DataFrame:
    """k independent minhashes per doc (min over per-seed hashes;
    long order for xxhash64, string order for the portable md5 tier)."""
    aggs = [
        F.min(_shingle_hash(i, portable_hash)).alias(f"mh{i}") for i in range(n_minhash)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def lsh_bands(
    signatures: DataFrame, id_col: str = "doc_id",
    n_minhash: int = N_MINHASH, n_bands: int = N_BANDS, portable_hash: bool = True,
) -> DataFrame:
    """Band keys: hash of each band's signature rows. Output:
    (id, band_idx, band_key). band_key is a string (md5) on the
    portable tier, a long (xxhash64) on the production tier."""
    rows_per_band = n_minhash // n_bands
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        key = F.md5(F.concat(*cols)) if portable_hash else F.xxhash64(*cols)
        bands.append(F.struct(F.lit(b).alias("band_idx"), key.alias("band_key")))
    return signatures.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("band")
    ).select(id_col, "band.band_idx", "band.band_key")


def dedup_minhash_lsh(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n_minhash: int = N_MINHASH, n_bands: int = N_BANDS,
    shingle_len: int = SHINGLE_LEN, portable_hash: bool = True,
) -> DataFrame:
    """Near-duplicate *candidate pairs*: docs sharing any LSH band.
    Output: (doc_a, doc_b) with doc_a < doc_b, distinct."""
    bands = lsh_bands(
        minhash_signatures(
            char_shingles(df, text_col, id_col, shingle_len),
            id_col, n_minhash, portable_hash,
        ),
        id_col, n_minhash, n_bands, portable_hash,
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


# ------------------------------------------------------- n-gram jaccard
def ngram_jaccard_pairs(
    df: DataFrame, threshold: float, text_col: str = "text", id_col: str = "doc_id",
    shingle_len: int = SHINGLE_LEN, max_shingle_df: int = MAX_SHINGLE_DF,
) -> DataFrame:
    """Exact Jaccard over distinct char shingles for co-shingled pairs.
    Stop-shingles (df > max_shingle_df) are dropped before the self-join
    — without this cap one ubiquitous shingle creates an O(n²) hot key.
    Output: (doc_a, doc_b, jaccard) for pairs ≥ threshold."""
    sh = char_shingles(df, text_col, id_col, shingle_len)
    rare = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df_cnt"))
        .filter(F.col("df_cnt") <= max_shingle_df)
        .select("shingle")
    )
    sh = sh.join(rare, "shingle")  # broadcast-able at small scale; AQE decides
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------- simhash
def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    portable_hash: bool = False,
) -> DataFrame:
    """SimHash fingerprint: per token, a 64-bit hash → for each bit,
    +1/-1 vote; fingerprint bit b = sign of the vote sum. Computed with
    `bits` aggregate expressions (JVM codegen), one shuffle. Output:
    (id, simhash:long).

    ``portable_hash`` swaps xxhash64 (fastest, JVM-only) for a 32-bit
    int parsed from the leading md5 hex — bit-identical in DuckDB, so
    the oracle can verify the full fingerprint."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    if portable_hash:
        toks = toks.withColumn("h", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long"))
    else:
        toks = toks.withColumn("h", F.xxhash64("tok"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    fp = None
    for b in range(bits):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(2**b).cast("long")
        fp = term if fp is None else fp + term
    return agg.select(F.col(id_col), fp.alias("simhash"))


# -------------------------------------------------- survivor resolution
def cc_propagate(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id", max_iter: int = 20
) -> tuple[DataFrame, int]:
    """Min-label propagation to fixpoint. Returns (labels(u, lbl),
    rounds used). Converges in O(component diameter) rounds — fine for
    shallow near-dup clusters, degenerate on long chains (see
    ``cc_two_phase``)."""
    edges = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    edges = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct().localCheckpoint()
    labels = docs.select(F.col(id_col).alias("u")).distinct().withColumn("lbl", F.col("u"))
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        nbr_min = (
            edges.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("lbl").alias("nbr"))
        )
        new = (
            labels.join(nbr_min, "u", "left")
            .select("u", F.least("lbl", F.coalesce("nbr", "lbl")).alias("lbl"), (F.col("nbr") < F.col("lbl")).alias("chg"))
        ).localCheckpoint()
        changed = new.filter(F.col("chg")).limit(1).count()
        labels = new.drop("chg")
        if changed == 0:
            break
    return labels, rounds


def cc_two_phase(pairs: DataFrame, max_iter: int = 20) -> tuple[DataFrame, int]:
    """Large-star/small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond") — the billion-edge
    regime. Each round alternates:

    - large-star: every node connects its LARGER neighbors to its
      minimum neighborhood label (halves long chains), then
    - small-star: every node and its smaller neighbors collapse onto
      the minimum (forms stars).

    Converges in O(log n) rounds regardless of component diameter —
    vs O(diameter) for plain propagation — and every round is two
    groupBy+join passes over the edge set, same per-round shuffle shape.
    Returns (labels(u, lbl) for every node appearing in ``pairs``,
    rounds used); label = component minimum. Root nodes label
    themselves; singletons never appear in ``pairs`` and are handled by
    the caller's left join.
    """
    # canonical direction: u > v (larger endpoint first)
    a = (
        pairs.select(
            F.greatest("doc_a", "doc_b").alias("u"), F.least("doc_a", "doc_b").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    rounds = 0
    prev_sig = None
    for _ in range(max_iter):
        rounds += 1
        # ---- large-star over the symmetric adjacency
        sym = a.unionByName(a.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        b = (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))  # larger neighbors re-pointed to m
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # ---- small-star over the u>v directed edges
        mn = b.groupBy("u").agg(F.min("v").alias("m"))
        a = (
            b.join(mn, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))  # smaller nbrs → m
            .unionByName(mn.select("u", F.col("m").alias("v")))  # u itself → m
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        sig = a.agg(
            F.count(F.lit(1)).alias("n"), F.bit_xor(F.xxhash64("u", "v")).alias("h")
        ).collect()[0]
        if prev_sig == (sig["n"], sig["h"]):
            break
        prev_sig = (sig["n"], sig["h"])
    # star forest: non-roots point at the component min; roots label
    # themselves. The min-agg guards the max_iter-exhausted case (a
    # not-yet-star edge set could list a node under two labels; one
    # label per node is an invariant callers join on).
    labels = (
        a.select("u", F.col("v").alias("lbl"))
        .unionByName(a.select(F.col("v").alias("u"), F.col("v").alias("lbl")))
        .groupBy("u")
        .agg(F.min("lbl").alias("lbl"))
    )
    return labels, rounds


def dedup_survivors(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id", max_iter: int = 20,
    algorithm: str = "propagate",
) -> DataFrame:
    """Connected-component survivor assignment: every doc maps to the
    minimum doc_id reachable through the near-dup pair graph (survivor
    == itself for unique docs).

    ``algorithm="propagate"`` (default, oracle tier): min-label
    propagation, O(diameter) rounds — near-dup clusters are shallow, so
    a handful. ``algorithm="two-phase"``: large-star/small-star,
    O(log n) rounds — the billion-edge/long-chain regime. Identical
    fixpoint (property-tested in tests/test_cc_two_phase.py).
    ``localCheckpoint`` truncates the plan each round (iterative joins
    otherwise stack exponentially deep lineage).
    """
    if algorithm == "two-phase":
        labels, _ = cc_two_phase(pairs, max_iter)
        base = docs.select(F.col(id_col)).distinct()
        return (
            base.join(labels.withColumnRenamed("u", id_col), id_col, "left")
            .select(id_col, F.coalesce("lbl", F.col(id_col)).alias("survivor_id"))
        )
    labels, _ = cc_propagate(docs, pairs, id_col, max_iter)
    return labels.select(F.col("u").alias(id_col), F.col("lbl").alias("survivor_id"))


def dedup_best_survivors(
    docs: DataFrame, pairs: DataFrame, quality: Column,
    id_col: str = "doc_id", max_iter: int = 20,
) -> DataFrame:
    """Cluster-exemplar selection: within each near-dup component, keep
    the HIGHEST-QUALITY document (tiebreak: lowest id) instead of the
    arbitrary min-id survivor — what a real corpus pipeline wants, since
    near-dups differ in boilerplate/truncation and the keeper should be
    the cleanest copy. One extra hash aggregate (``max_by`` over a
    (quality, -id) struct per component) and one broadcast-size join
    beyond ``dedup_survivors``; components are near-dup clusters, so
    the per-group state is tiny no matter the corpus size.

    Output: (id, survivor_id, survivor_quality) — survivor_quality is
    the keeper's score, rounded for oracle-stable hashing."""
    comp = dedup_survivors(docs, pairs, id_col, max_iter).withColumnRenamed(
        "survivor_id", "__comp"
    )
    q = docs.select(F.col(id_col), quality.alias("__q"))
    lq = comp.join(q, id_col)
    best = lq.groupBy("__comp").agg(
        F.max_by(
            F.struct(F.col(id_col).alias("bid"), F.col("__q").alias("bq")),
            F.struct(F.col("__q"), (-F.col(id_col)).alias("__negid")),
        ).alias("__b")
    )
    return comp.join(best, "__comp").select(
        id_col,
        F.col("__b.bid").alias("survivor_id"),
        F.round(F.col("__b.bq"), 6).alias("survivor_quality"),
    )
