"""CDC-maintained MinHash-LSH near-dup index: online dedup at ingest.

``operators/dedup.dedup_minhash_lsh`` answers "find near-duplicate
pairs inside a static corpus" — one self-join over the whole band
table. The question a training-data ingest pipeline actually asks is
incremental: *does this incoming batch duplicate anything already
ingested?* Recomputing the corpus self-join per batch is O(corpus)
work for an O(batch) question. ``MinHashIndexView`` closes that gap
with the same pattern as the engine's other derived artifacts
(``streaming/mview.py`` aggregates, ``streaming/ann_index.py`` ANN):
a persisted index pinned to a base snapshot version, an O(changed
keys) ``refresh()`` off the sink's change feed, and exact reads under
a merge-on-read dirty overlay.

State layout (atomic manifest swap, one-predecessor retention):

- ``state/v{N}/`` — the band table: one row per (key, band) with the
  band's signature hash, PARTITIONED BY ``band_idx``. At Iceberg
  scale this is a table bucketed by ``band_key`` so the probe join is
  co-located; here the equi-join shuffles on (band_idx, band_key),
  which is the linear LSH shape either way — never an all-pairs
  product.
- ``dirty/v{N}/`` — net band rows for every key changed since the
  base was built (n_bands rows per live changed key, one dead marker
  per deleted key). Folded per key, so it stays O(changed keys).

Operations and their cost shapes at 10^10 rows:

- ``refresh()`` — CDF diff (changed keys only) → shingle → minhash →
  band rows for just those keys, folded into the overlay. The base
  band table is never read.
- ``probe(docs)`` — the ingest-time query: band the incoming docs,
  equi-join against the CURRENT band table (base minus dirty keys
  plus alive overlay rows), then verify candidates with exact
  char-shingle Jaccard against only the candidate corpus rows
  (fetched via a keyed semi-join — the decontamination broadcast-
  probe shape). O(batch × band collisions), independent of corpus
  pair count.
- ``compact()`` — folds the overlay into the base. Every doc owns a
  row in every band, so band partitions cannot be selectively
  skipped (unlike the ANN index's clusters); the rewrite is one full
  pass of the band table, amortized exactly like the sink's
  compaction.

Production tier hashing (xxhash64, JVM-codegen'd) throughout — this
index never needs a DuckDB twin; its correctness gate is equivalence
with the from-scratch band table at the same base version (pytest).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oec_etl_spark.operators.dedup import (
    char_shingles,
    lsh_bands,
    minhash_signatures,
)
from oec_etl_spark.schemas import KEY_COLUMNS
from oec_etl_spark.streaming.sink import ParquetSnapshotSink

_ALIVE = "__alive"
_DID = "__did"


class DedupIndexSpecMismatch(ValueError):
    """On-disk index was created with different tuning/expr/keys."""


class MinHashIndexView:
    """A persisted MinHash-LSH band index over a
    :class:`ParquetSnapshotSink` table, incrementally maintained off
    the table's change feed."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        text_expr: str = "coalesce(text, '')",
        n_minhash: int = 8,
        n_bands: int = 4,
        shingle_len: int = 12,
        keys: tuple[str, ...] = KEY_COLUMNS,
    ):
        if n_minhash % n_bands:
            raise ValueError("n_minhash must be divisible by n_bands")
        self.spark = spark
        self.path = path
        self.text_expr = text_expr
        self.n_minhash = int(n_minhash)
        self.n_bands = int(n_bands)
        self.shingle_len = int(shingle_len)
        self.keys = tuple(keys)
        os.makedirs(path, exist_ok=True)

    # ------------------------------------------------------------ state
    def _spec(self) -> dict:
        return {
            "text_expr": self.text_expr,
            "n_minhash": self.n_minhash,
            "n_bands": self.n_bands,
            "shingle_len": self.shingle_len,
            "keys": list(self.keys),
        }

    def _manifest_path(self) -> str:
        return os.path.join(self.path, "MANIFEST.json")

    def _load_manifest(self) -> dict | None:
        p = self._manifest_path()
        if not os.path.exists(p):
            return None
        with open(p) as f:
            man = json.load(f)
        if {k: man[k] for k in self._spec()} != self._spec():
            raise DedupIndexSpecMismatch(
                f"index at {self.path} was created with different "
                f"tuning/text_expr/keys than this handle declares"
            )
        return man

    def _commit(self, man: dict) -> dict:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, self._manifest_path())
        for root in ("state", "dirty"):
            rdir = os.path.join(self.path, root)
            if not os.path.isdir(rdir):
                continue
            vs = sorted(d for d in os.listdir(rdir) if d.startswith("v"))
            for d in vs[:-2]:  # live + one predecessor for in-flight readers
                shutil.rmtree(os.path.join(rdir, d))
        return man

    # ------------------------------------------------------------ bands
    def _band_rows(self, base: DataFrame) -> DataFrame:
        """(keys..., band_idx, band_key) for every row of ``base`` —
        shingle → minhash → band, production xxhash64 tier."""
        docs = base.select(
            F.concat_ws("#", *[F.col(k).cast("string") for k in self.keys]).alias(_DID),
            *self.keys,
            F.expr(self.text_expr).alias("__text"),
        )
        # the base table is key-unique by construction (one live row per
        # key), so _DID is already distinct — no dedup shuffle needed
        ids = docs.select(_DID, *self.keys)
        bands = lsh_bands(
            minhash_signatures(
                char_shingles(docs, "__text", _DID, self.shingle_len),
                _DID, self.n_minhash, portable_hash=False,
            ),
            _DID, self.n_minhash, self.n_bands, portable_hash=False,
        )
        return bands.join(ids, _DID).select(*self.keys, "band_idx", "band_key")

    # ------------------------------------------------------------ build
    def build(self, sink: ParquetSnapshotSink) -> dict:
        base_man = sink.load_manifest()
        if base_man is None:
            raise FileNotFoundError(f"no committed snapshot under {sink.root}")
        head = int(base_man["version"])
        state_dir = "state/v000001"
        out = os.path.join(self.path, state_dir)
        shutil.rmtree(out, ignore_errors=True)
        (
            self._band_rows(sink.read_table(version=head))
            .repartition(F.col("band_idx"))
            .write.mode("overwrite")
            .partitionBy("band_idx")
            .parquet(out)
        )
        man = self._commit({
            "index_version": 1,
            "base_version": head,
            "state_dir": state_dir,
            "dirty_dir": None,
            **self._spec(),
        })
        return {"mode": "full", "base_to": head, "index_version": man["index_version"]}

    def sync(self, sink: ParquetSnapshotSink) -> dict:
        """Build if the index doesn't exist yet, else refresh — the
        idempotent entry point the streaming loop calls after each
        batch commit (``EngineConfig.indexes``)."""
        if self._load_manifest() is None:
            return self.build(sink)
        return self.refresh(sink)

    # ---------------------------------------------------------- refresh
    def _read_dirty(self, man: dict) -> DataFrame | None:
        if not man.get("dirty_dir"):
            return None
        return self.spark.read.parquet(os.path.join(self.path, man["dirty_dir"]))

    def refresh(self, sink: ParquetSnapshotSink) -> dict:
        man = self._load_manifest()
        if man is None:
            raise FileNotFoundError(f"no built index under {self.path} — build() first")
        head = int(sink.load_manifest()["version"])
        last = int(man["base_version"])
        if head == last:
            return {"mode": "noop", "base_from": last, "base_to": head,
                    "dirty_keys": self._dirty_key_count(man)}

        feed = sink.changelog(last, head)
        live = feed.filter(F.col("_change_type") != "delete")
        ups = self._band_rows(live).withColumn(_ALIVE, F.lit(True))
        # a live short doc can shingle to zero bands — it still needs a
        # marker so its previous band rows are retired from the base
        no_bands = live.select(*self.keys).exceptAll(ups.select(*self.keys))
        dels = (
            feed.filter(F.col("_change_type") == "delete").select(*self.keys)
            .unionByName(no_bands)
            .select(
                *self.keys,
                F.lit(-1).alias("band_idx"),
                F.lit(None).cast("long").alias("band_key"),
                F.lit(False).alias(_ALIVE),
            )
        )
        delta = ups.unionByName(dels)
        prev = self._read_dirty(man)
        if prev is not None:
            ch = feed.select(*self.keys).distinct()
            delta = prev.join(ch, on=list(self.keys), how="left_anti").unionByName(delta)
        dv = man["index_version"] + 1
        dirty_dir = f"dirty/v{dv:06d}"
        delta.repartition(1).write.mode("overwrite").parquet(os.path.join(self.path, dirty_dir))
        new_man = self._commit(dict(man, index_version=dv, base_version=head, dirty_dir=dirty_dir))
        return {"mode": "incremental", "base_from": last, "base_to": head,
                "dirty_keys": self._dirty_key_count(new_man)}

    def _dirty_key_count(self, man: dict) -> int:
        d = self._read_dirty(man)
        return 0 if d is None else d.select(*self.keys).distinct().count()

    # ------------------------------------------------------------- read
    def bands_current(self) -> DataFrame:
        """The logical current band table: base minus every dirty key,
        plus the overlay's alive band rows — exactly the band table a
        from-scratch build at the current base version would produce."""
        man = self._load_manifest()
        if man is None:
            raise FileNotFoundError(f"no built index under {self.path} — build() first")
        base = self.spark.read.parquet(os.path.join(self.path, man["state_dir"]))
        cols = [*self.keys, "band_idx", "band_key"]
        base = base.select(*cols)
        dirty = self._read_dirty(man)
        if dirty is None:
            return base
        dkeys = dirty.select(*self.keys).distinct()
        return base.join(F.broadcast(dkeys), on=list(self.keys), how="left_anti") \
            .unionByName(dirty.filter(F.col(_ALIVE)).select(*cols))

    # ------------------------------------------------------------ probe
    def probe(
        self,
        sink: ParquetSnapshotSink,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        threshold: float = 0.5,
        max_shingle_df: int | None = None,
    ) -> DataFrame:
        """Ingest-time near-dup check: which incoming docs near-match
        something already in the table? Bands the incoming batch,
        equi-joins the current band table for candidates, then
        verifies with exact char-shingle Jaccard computed ONLY over
        the candidate (incoming, corpus) pairs — corpus text fetched
        by a keyed semi-join, so the verify cost follows the candidate
        count, not the corpus. Output: (id_col, keys..., jaccard) for
        pairs ≥ threshold.

        Consistency: candidates come from the index (pinned base +
        overlay), verification text from the sink's HEAD — exact when
        the index is synced to head (the in-loop contract); an
        unsynced index can miss docs changed since its pin."""
        in_docs = docs.select(F.col(id_col).cast("string").alias(id_col), F.col(text_col))
        in_bands = lsh_bands(
            minhash_signatures(
                char_shingles(in_docs, text_col, id_col, self.shingle_len),
                id_col, self.n_minhash, portable_hash=False,
            ),
            id_col, self.n_minhash, self.n_bands, portable_hash=False,
        )
        cand = (
            in_bands.join(self.bands_current(), on=["band_idx", "band_key"])
            .select(id_col, *self.keys)
            .distinct()
        )
        corpus = (
            sink.read_table()
            .join(cand.select(*self.keys).distinct(), on=list(self.keys), how="left_semi")
            .select(
                F.concat_ws("#", *[F.col(k).cast("string") for k in self.keys]).alias(_DID),
                *self.keys,
                F.expr(self.text_expr).alias("__text"),
            )
        )
        pairs = cand.join(corpus.select(_DID, *self.keys), on=list(self.keys))
        # intersection sizes via a shingle EQUI-join between the two
        # candidate-restricted shingle sets (the corpus side is already
        # candidates-only; the incoming side is semi-pruned to docs with
        # any candidate) — linear in co-shingled pairs, never a per-pair
        # shingle cross product
        sh_in = char_shingles(in_docs, text_col, id_col, self.shingle_len) \
            .join(cand.select(id_col).distinct(), id_col, "left_semi")
        sh_co = char_shingles(corpus, "__text", _DID, self.shingle_len)
        if max_shingle_df is not None:
            # stop-shingle guard (same skew fix as ngram_jaccard_pairs):
            # a shingle ubiquitous among the CORPUS candidates would fan
            # the equi-join out quadratically — drop it from BOTH sides
            # so the (approximate) Jaccard stays symmetric
            rare = (
                sh_co.groupBy("shingle")
                .agg(F.count(F.lit(1)).alias("__df"))
                .filter(F.col("__df") <= max_shingle_df)
                .select("shingle")
            )
            sh_in = sh_in.join(rare, "shingle", "left_semi")
            sh_co = sh_co.join(rare, "shingle", "left_semi")
        sz_in = sh_in.groupBy(id_col).agg(F.count(F.lit(1)).alias("__sz_a"))
        sz_co = sh_co.groupBy(_DID).agg(F.count(F.lit(1)).alias("__sz_b"))
        inter = (
            sh_in.join(sh_co, "shingle")
            .groupBy(id_col, _DID)
            .agg(F.count(F.lit(1)).alias("__inter"))
        )
        out = (
            pairs.join(inter, on=[id_col, _DID], how="left")
            .join(sz_in, id_col)
            .join(sz_co, _DID)
            .withColumn(
                "jaccard",
                F.round(
                    F.coalesce(F.col("__inter"), F.lit(0))
                    / (F.col("__sz_a") + F.col("__sz_b") - F.coalesce(F.col("__inter"), F.lit(0))),
                    6,
                ),
            )
            .filter(F.col("jaccard") >= threshold)
            .select(id_col, *self.keys, "jaccard")
        )
        return out.orderBy(id_col, *self.keys)

    # ---------------------------------------------------------- compact
    def compact(self) -> dict:
        """Fold the overlay into the base band table: one full band-
        table pass (every doc has a row in every band — there is no
        untouched partition to skip, unlike the ANN index's clusters)."""
        man = self._load_manifest()
        if man is None:
            raise FileNotFoundError(f"no built index under {self.path} — build() first")
        if not man.get("dirty_dir"):
            return {"mode": "noop", "index_version": man["index_version"]}
        folded = self.bands_current()
        nv = man["index_version"] + 1
        state_dir = f"state/v{nv:06d}"
        out = os.path.join(self.path, state_dir)
        shutil.rmtree(out, ignore_errors=True)
        (
            folded.repartition(F.col("band_idx"))
            .write.mode("overwrite")
            .partitionBy("band_idx")
            .parquet(out)
        )
        self._commit(dict(man, index_version=nv, state_dir=state_dir, dirty_dir=None))
        return {"mode": "compacted", "index_version": nv}
