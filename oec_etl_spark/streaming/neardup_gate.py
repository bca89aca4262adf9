"""Ingest-time near-duplicate suppression gate.

The corpus-hygiene question a training-data ingest pipeline asks of
every batch is: *does this incoming document near-duplicate anything
we already ingested — or anything else arriving in the same batch?*
``MinHashIndexView.probe`` answers the first half as an O(batch ×
band-collisions) query against the CDC-maintained LSH index
(streaming/dedup_index.py); this module turns that answer into an
enforcement point inside the engine loop (``EngineConfig.
neardup_gate``): matching rows are diverted to the quarantine DLQ
tagged ``__reject='neardup'`` (same reason-attribution contract as
CHECK constraints, same ``requeue`` drain path back) and never merge.

Semantics:

- Gated ops: full-content rows only — I, U and R. Deletes and
  truncates carry no payload; patches (op 'P') carry partial payload
  and patch an EXISTING row, so blocking them on similarity to their
  own row would be self-defeating.
- Self-matches are exempt: an update (or redelivered insert) always
  resembles its own key's stored text; only matches against a
  DIFFERENT key reject. Editing a turn never trips the gate.
- Within-batch pairs (both docs new in this batch, so neither is in
  the index yet) are caught by an LSH self-join of the batch's own
  band table, verified with exact shingle Jaccard. The EARLIER row
  by (seq, conv_id, turn_idx) survives; later rows that match any
  earlier row are rejected — deterministic, no iteration. A
  transitive chain (B dups A, C dups B) rejects both B and C even
  though C's anchor was itself rejected: conservative toward dedup,
  and reversible through the DLQ ``requeue`` path.
- Consistency: the gate syncs the index to the sink's committed HEAD
  before probing (normally a no-op — the in-loop post-merge sync
  already did it; on bootstrap over a pre-existing table it builds,
  and after a crash between commit and sync it catches up), so the
  corpus side is exactly "everything committed before this batch".

Cost shape at 10^10 rows: the corpus probe is O(batch × band
collisions) — independent of corpus size (the index join is a bucket
equi-join on (band_idx, band_key), never an all-pairs product); the
within-batch check is an O(batch) band self-join whose cross products
are confined per band bucket, with the same stop-shingle DF cap as
the static near-dup operators guarding the verify join against
ubiquitous shingles. Nothing here scans the corpus.

The gate requires its index to be declared in ``EngineConfig.indexes``
(kind='minhash', same path): enforcement without the post-merge sync
contract would silently probe an ever-staler corpus.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oec_etl_spark.operators.dedup import (
    char_shingles,
    lsh_bands,
    minhash_signatures,
)
from oec_etl_spark.streaming.dedup_index import MinHashIndexView
from oec_etl_spark.streaming.sink import ParquetSnapshotSink

_GID = "__gate_id"
_GATED_OPS = ("I", "U", "R")
REJECT_REASON = "neardup"


class NearDupGate:
    """Compiled from ``EngineConfig.neardup_gate``:

    ``{"index_path": <path of a declared kind='minhash' index>,
       "threshold": 0.5, "max_shingle_df": 50, "within_batch": True}``
    """

    def __init__(self, spark: SparkSession, cfg):
        spec = dict(cfg.neardup_gate or {})
        path = spec.pop("index_path", None)
        if not path:
            raise ValueError("neardup_gate.index_path is required")
        self.threshold = float(spec.pop("threshold", 0.5))
        if not (0.0 < self.threshold <= 1.0):
            raise ValueError(f"neardup_gate.threshold must be in (0, 1], got {self.threshold}")
        self.max_shingle_df = spec.pop("max_shingle_df", None)
        if self.max_shingle_df is not None:
            self.max_shingle_df = int(self.max_shingle_df)
        self.within_batch = bool(spec.pop("within_batch", True))
        if spec:
            raise ValueError(f"unknown neardup_gate keys: {sorted(spec)}")
        idx = next(
            (
                i for i in (cfg.indexes or [])
                if i.get("kind") == "minhash" and i.get("path") == path
            ),
            None,
        )
        if idx is None:
            raise ValueError(
                f"neardup_gate.index_path {path!r} must match a declared "
                "EngineConfig.indexes entry with kind='minhash' — the gate "
                "depends on the in-loop post-merge index sync"
            )
        self.view = MinHashIndexView(
            spark, path,
            text_expr=idx.get("text_expr", "coalesce(text, '')"),
            n_minhash=int(idx.get("n_minhash", 8)),
            n_bands=int(idx.get("n_bands", 4)),
            shingle_len=int(idx.get("shingle_len", 12)),
        )
        self._cached: list[DataFrame] = []

    # ------------------------------------------------------------ split
    def split(
        self, sink: ParquetSnapshotSink, valid: DataFrame
    ) -> tuple[DataFrame, DataFrame, int]:
        """(kept, rejected, n_rejected). ``rejected`` carries
        ``__reject='neardup'`` and the same change columns as ``valid``
        (DLQ-union-compatible with quarantine_split's output). Call
        :meth:`finish` after the batch's terminal action to release
        the gate's cached intermediates."""
        keys = list(self.view.keys)
        gateable = valid.filter(F.col("op").isin(*_GATED_OPS))
        rest = valid.filter(~F.col("op").isin(*_GATED_OPS))
        gid = F.concat_ws(
            "\x1f",
            F.col("conv_id"),
            F.col("turn_idx").cast("string"),
            F.col("seq").cast("string"),
            F.coalesce(F.col("source_file"), F.lit("")),
            F.coalesce(F.col("offset").cast("string"), F.lit("")),
        )
        tagged = gateable.withColumn(_GID, gid)
        docs = tagged.select(
            _GID, *keys, "seq", F.expr(self.view.text_expr).alias("__text")
        ).cache()
        self._cached.append(docs)

        hit_ids: DataFrame | None = None
        if sink.load_manifest() is not None:
            # catch the index up to the committed HEAD (no-op when the
            # in-loop sync already ran; builds on first sight)
            self.view.sync(sink)
            matches = self.view.probe(
                sink, docs, text_col="__text", id_col=_GID,
                threshold=self.threshold, max_shingle_df=self.max_shingle_df,
            )
            own = docs.select(_GID, *[F.col(k).alias(f"__own_{k}") for k in keys])
            same_key = reduce(
                lambda a, b: a & b,
                [F.col(k).eqNullSafe(F.col(f"__own_{k}")) for k in keys],
            )
            hit_ids = (
                matches.join(own, _GID).filter(~same_key).select(_GID).distinct()
            )

        if self.within_batch:
            wb = self._within_batch_losers(docs, keys)
            hit_ids = wb if hit_ids is None else hit_ids.unionByName(wb).distinct()

        if hit_ids is None:
            return valid, valid.filter(F.lit(False)).withColumn(
                "__reject", F.lit(REJECT_REASON)
            ), 0
        hit_ids = hit_ids.cache()
        self._cached.append(hit_ids)
        n = hit_ids.count()
        if n == 0:
            return valid, valid.filter(F.lit(False)).withColumn(
                "__reject", F.lit(REJECT_REASON)
            ), 0
        kept = tagged.join(hit_ids, _GID, "left_anti").drop(_GID).unionByName(rest)
        rejected = (
            tagged.join(hit_ids, _GID, "left_semi")
            .drop(_GID)
            .withColumn("__reject", F.lit(REJECT_REASON))
        )
        return kept, rejected, n

    # -------------------------------------------------- within-batch
    def _within_batch_losers(self, docs: DataFrame, keys: list[str]) -> DataFrame:
        """Ids of batch rows that near-match an EARLIER same-batch row
        of a different key. Candidates from a band self-join (cross
        products confined per band bucket), verified with exact
        char-shingle Jaccard over candidate ids only."""
        v = self.view
        bands = lsh_bands(
            minhash_signatures(
                char_shingles(docs, "__text", _GID, v.shingle_len),
                _GID, v.n_minhash, portable_hash=False,
            ),
            _GID, v.n_minhash, v.n_bands, portable_hash=False,
        )
        rank = docs.select(
            _GID,
            F.struct(
                F.col("seq"), *[F.col(k).cast("string") for k in keys]
            ).alias("__rank"),
            *[F.col(k).alias(f"__k_{k}") for k in keys],
        )
        br = bands.join(rank, _GID)
        a = br.select(
            F.col(_GID).alias("__ga"), F.col("__rank").alias("__ra"),
            *[F.col(f"__k_{k}").alias(f"__ka_{k}") for k in keys],
            "band_idx", "band_key",
        )
        b = br.select(
            F.col(_GID).alias("__gb"), F.col("__rank").alias("__rb"),
            *[F.col(f"__k_{k}").alias(f"__kb_{k}") for k in keys],
            "band_idx", "band_key",
        )
        same_key = reduce(
            lambda x, y: x & y,
            [F.col(f"__ka_{k}").eqNullSafe(F.col(f"__kb_{k}")) for k in keys],
        )
        cand = (
            a.join(b, ["band_idx", "band_key"])
            .filter((F.col("__ra") < F.col("__rb")) & ~same_key)
            .select("__ga", "__gb")
            .distinct()
        )
        sh = char_shingles(docs, "__text", _GID, v.shingle_len)
        cand_ids = (
            cand.select(F.col("__ga").alias(_GID))
            .unionByName(cand.select(F.col("__gb").alias(_GID)))
            .distinct()
        )
        sh = sh.join(cand_ids, _GID, "left_semi")
        if self.max_shingle_df is not None:
            rare = (
                sh.groupBy("shingle")
                .agg(F.count(F.lit(1)).alias("__df"))
                .filter(F.col("__df") <= self.max_shingle_df)
                .select("shingle")
            )
            sh = sh.join(rare, "shingle", "left_semi")
        sz = sh.groupBy(_GID).agg(F.count(F.lit(1)).alias("__sz"))
        inter = (
            sh.select(F.col(_GID).alias("__ga"), "shingle")
            .join(sh.select(F.col(_GID).alias("__gb"), "shingle"), "shingle")
            .groupBy("__ga", "__gb")
            .agg(F.count(F.lit(1)).alias("__inter"))
        )
        return (
            cand.join(inter, ["__ga", "__gb"], "left")
            .join(sz.withColumnsRenamed({_GID: "__ga", "__sz": "__sz_a"}), "__ga")
            .join(sz.withColumnsRenamed({_GID: "__gb", "__sz": "__sz_b"}), "__gb")
            .withColumn(
                "__j",
                F.coalesce(F.col("__inter"), F.lit(0))
                / (F.col("__sz_a") + F.col("__sz_b") - F.coalesce(F.col("__inter"), F.lit(0))),
            )
            .filter(F.col("__j") >= self.threshold)
            .select(F.col("__gb").alias(_GID))
            .distinct()
        )

    def finish(self) -> None:
        """Release cached per-batch intermediates (call in the engine's
        finally, after the merge — the kept/rejected frames reference
        them lazily)."""
        for df in self._cached:
            df.unpersist()
        self._cached.clear()
