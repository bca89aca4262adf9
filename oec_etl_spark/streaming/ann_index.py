"""CDC-maintained IVF ANN index: a vector index as a change-feed consumer.

``operators/similarity.ivf_index_build`` answers "index a static
corpus"; this module answers the production question that follows —
the corpus is the CDC table, rows keep arriving/changing/dying, and
rebuilding the index per merge is a full corpus pass you cannot afford
at 10^10 rows. ``IvfIndexView`` maintains the index exactly the way
the engine maintains everything else: as a versioned consumer of the
snapshot sink's change feed, with merge-on-read semantics of its own.

State layout (all under one view directory, atomic manifest swap):

- ``state/v{N}/`` — the base index: (keys, embedding, cos) parquet
  PARTITIONED BY ``centroid_id``, exactly the static-index layout, so
  a query scans only its probed partitions.
- ``dirty/v{N}/`` — the merge-on-read overlay: the net latest
  (keys, centroid_id, embedding, alive) for every key that changed
  since the base index was built. Folded, not appended: one row per
  dirty key, so it stays O(keys changed since last compaction).
- ``MANIFEST.json`` — base_version pin, centroids, dir pointers.

Cost shape at 10^10 rows:

- ``refresh()`` never touches the base index: it diffs the sink's
  CDF between the pinned and head versions (key-bucketed join of
  changed data only), embeds + assigns the changed rows with the same
  MAP-ONLY literal-centroid expression as the static build, and folds
  them into the overlay — O(changed keys).
- ``query()`` is exact at any moment: probed base partitions, minus a
  BROADCAST anti-join on the dirty keys (the overlay is small by
  construction), plus the alive overlay rows assigned to probed
  clusters. One pruned scan + one broadcast lookup.
- ``compact()`` folds the overlay into the base and rewrites ONLY the
  affected partitions (the dirty keys' old clusters — found via a
  column-pruned keys+centroid scan — plus their new clusters);
  untouched partition directories are hard-linked into the new state
  dir, not copied. Amortized, like the sink's minor compaction.

The reference has no vector surface at all (SURVEY §2.4); this is the
new-engine ANN path married to the CDC core. Embeddings are declared
as a SQL expression over the base row (``embed_expr``) — in production
an embedding column maintained upstream; in this container the
deterministic ``hash_embed_expr`` stands in (same honest-stub policy
as the multimodal codec, functions/multimodal.py).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oec_etl_spark.functions.vectors import cosine
from oec_etl_spark.operators.similarity import nearest_centroid_cols
from oec_etl_spark.schemas import KEY_COLUMNS
from oec_etl_spark.streaming.sink import ParquetSnapshotSink

CENT_ID = "centroid_id"
_ALIVE = "__alive"


def hash_embed_expr(col: str = "text", dim: int = 8) -> str:
    """Deterministic feature-hash embedding of a string column:
    ``dim`` components in [-0.5, 0.5), pure JVM expression (xxhash64
    per dimension), reproducible across runs and partitionings. The
    stand-in for a real upstream embedder — the Spark-side contract
    (array<double>, map-only, no Python) is what the index exercises."""
    return (
        f"transform(sequence(0, {dim - 1}), "
        f"i -> pmod(xxhash64({col}, i), 1000) / 1000.0 - 0.5)"
    )


class IndexSpecMismatch(ValueError):
    """On-disk index was created with different centroids/expr/keys."""


class IvfIndexView:
    """A persisted IVF index over a :class:`ParquetSnapshotSink` table,
    incrementally maintained off the table's change feed."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        centroids: list[tuple[int, list[float]]],
        embed_expr: str,
        keys: tuple[str, ...] = KEY_COLUMNS,
    ):
        self.spark = spark
        self.path = path
        self.centroids = [(int(i), [float(x) for x in v]) for i, v in centroids]
        self.embed_expr = embed_expr
        self.keys = tuple(keys)
        os.makedirs(path, exist_ok=True)

    # ------------------------------------------------------------ state
    def _manifest_path(self) -> str:
        return os.path.join(self.path, "MANIFEST.json")

    def _load_manifest(self) -> dict | None:
        p = self._manifest_path()
        if not os.path.exists(p):
            return None
        with open(p) as f:
            man = json.load(f)
        if (
            man["embed_expr"] != self.embed_expr
            or man["keys"] != list(self.keys)
            or man["centroids"] != [[i, v] for i, v in self.centroids]
        ):
            raise IndexSpecMismatch(
                f"index at {self.path} was created with a different "
                f"embed_expr/keys/centroid set than this handle declares"
            )
        return man

    def _commit(self, man: dict) -> dict:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, self._manifest_path())
        # one-predecessor retention, same policy as the mview state
        for root, live in (("state", man.get("state_dir")), ("dirty", man.get("dirty_dir"))):
            rdir = os.path.join(self.path, root)
            if not os.path.isdir(rdir):
                continue
            keep = {os.path.basename(d) for d in (live,) if d}
            vs = sorted(d for d in os.listdir(rdir) if d.startswith("v"))
            for d in vs[:-2]:  # keep live + one predecessor for in-flight readers
                if d not in keep:
                    shutil.rmtree(os.path.join(rdir, d))
        return man

    # ------------------------------------------------------- embedding
    def _embedded(self, base: DataFrame) -> DataFrame:
        """(keys, embedding, centroid_id, cos) for every base row —
        embed + assign as one map-only projection (centroids ride as
        literals at small k, as an Arrow-matmul UDF above LITERAL_K_MAX;
        either way no join, no shuffle)."""
        rows = [{"centroid_id": i, "centroid": v} for i, v in self.centroids]
        emb = base.select(*self.keys, F.expr(self.embed_expr).alias("embedding"))
        cid, cos = nearest_centroid_cols(rows, "embedding", "centroid_id", "centroid")
        return emb.select(*self.keys, "embedding", cid, cos)

    # ------------------------------------------------------------ build
    def build(self, sink: ParquetSnapshotSink) -> dict:
        """Full index build at the sink's head version: one corpus
        pass, written partitioned by centroid (one write task per
        cluster via the partition-aligned repartition — the sink's
        bucket-aligned-write trick)."""
        base_man = sink.load_manifest()
        if base_man is None:
            raise FileNotFoundError(f"no committed snapshot under {sink.root}")
        head = int(base_man["version"])
        state_dir = "state/v000001"
        out = os.path.join(self.path, state_dir)
        shutil.rmtree(out, ignore_errors=True)
        (
            self._embedded(sink.read_table(version=head))
            .repartition(F.col(CENT_ID))
            .write.mode("overwrite")
            .partitionBy(CENT_ID)
            .parquet(out)
        )
        man = self._commit({
            "index_version": 1,
            "base_version": head,
            "state_dir": state_dir,
            "dirty_dir": None,
            "embed_expr": self.embed_expr,
            "keys": list(self.keys),
            "centroids": [[i, v] for i, v in self.centroids],
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
        """Bring the overlay up to the sink's head. O(changed keys):
        the base index is not read, let alone rewritten."""
        man = self._load_manifest()
        if man is None:
            raise FileNotFoundError(f"no built index under {self.path} — build() first")
        head = int(sink.load_manifest()["version"])
        last = int(man["base_version"])
        if head == last:
            return {"mode": "noop", "base_from": last, "base_to": head,
                    "dirty_keys": self._dirty_count(man)}

        feed = sink.changelog(last, head)  # net one row per changed key
        ups = self._embedded(feed.filter(F.col("_change_type") != "delete")) \
            .withColumn(_ALIVE, F.lit(True))
        dels = feed.filter(F.col("_change_type") == "delete").select(
            *self.keys,
            F.lit(None).cast("array<double>").alias("embedding"),
            F.lit(-1).alias(CENT_ID),
            F.lit(0.0).alias("cos"),
            F.lit(False).alias(_ALIVE),
        )
        delta = ups.unionByName(dels)
        prev = self._read_dirty(man)
        if prev is not None:
            # fold: the newer net change supersedes the older one per key
            delta = prev.join(delta.select(*self.keys), on=list(self.keys), how="left_anti") \
                .unionByName(delta)
        dv = man["index_version"] + 1
        dirty_dir = f"dirty/v{dv:06d}"
        delta.repartition(1).write.mode("overwrite").parquet(os.path.join(self.path, dirty_dir))
        new_man = dict(man, index_version=dv, base_version=head, dirty_dir=dirty_dir)
        self._commit(new_man)
        return {"mode": "incremental", "base_from": last, "base_to": head,
                "dirty_keys": self._dirty_count(new_man)}

    def _dirty_count(self, man: dict) -> int:
        d = self._read_dirty(man)
        return 0 if d is None else d.count()

    # ------------------------------------------------------------ query
    def _probed(self, query_vec: list[float], nprobe: int) -> list[int]:
        """Centroid ranking is driver-side arithmetic — centroids are
        tiny by definition; ties break to the lowest id."""
        import math

        qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0
        scored = []
        for i, v in self.centroids:
            vn = math.sqrt(sum(x * x for x in v)) or 1.0
            scored.append((-sum(a * b for a, b in zip(query_vec, v)) / (qn * vn), i))
        return [i for _s, i in sorted(scored)[: max(1, nprobe)]]

    def query(self, query_vec: list[float], k: int = 10, nprobe: int = 2) -> DataFrame:
        """Exact-under-the-overlay top-k: identical results to a full
        rebuild at the current base version, without one. Output:
        (keys..., cos) desc."""
        man = self._load_manifest()
        if man is None:
            raise FileNotFoundError(f"no built index under {self.path} — build() first")
        probed = self._probed(query_vec, nprobe)
        base = self.spark.read.parquet(os.path.join(self.path, man["state_dir"]))
        cand = base.filter(F.col(CENT_ID).isin(probed))  # partition filter
        dirty = self._read_dirty(man)
        if dirty is not None:
            cand = cand.join(
                F.broadcast(dirty.select(*self.keys)), on=list(self.keys), how="left_anti"
            )
            overlay = dirty.filter(F.col(_ALIVE) & F.col(CENT_ID).isin(probed)) \
                .select(*cand.columns)
            cand = cand.unionByName(overlay)
        q = F.array(*[F.lit(float(x)) for x in query_vec])
        out = cand.select(
            *self.keys, F.round(cosine(F.col("embedding"), q), 6).alias("cos")
        )
        return out.orderBy(F.desc("cos"), *[F.asc(c) for c in self.keys]).limit(k)

    # ------------------------------------------------------------ stats
    def stats(self) -> dict:
        """Index health gauge — the recluster signal. The stored
        ``cos`` column IS each vector's similarity to its assigned
        centroid, so staleness is measurable without recomputing
        anything: as the corpus drifts away from the centroids the
        live mean cos falls, and as hot topics grow the cluster-size
        balance skews (both degrade nprobe recall). One column-pruned
        scan of (keys, centroid_id, cos) over base+overlay — the same
        amortized full-metadata pass compact() makes; run it on the
        compaction cadence, not per batch.

        Returns: n_vectors, n_dirty, mean_cos (live, 6dp),
        per-cluster sizes (min/max/mean) and the max/mean balance
        ratio, plus the pinned base_version/index_version."""
        man = self._load_manifest()
        if man is None:
            raise FileNotFoundError(f"no built index under {self.path} — build() first")
        base = self.spark.read.parquet(os.path.join(self.path, man["state_dir"])) \
            .select(*self.keys, CENT_ID, "cos")
        dirty = self._read_dirty(man)
        n_dirty = 0
        if dirty is not None:
            n_dirty = dirty.count()
            base = base.join(
                F.broadcast(dirty.select(*self.keys)), on=list(self.keys), how="left_anti"
            ).unionByName(
                dirty.filter(F.col(_ALIVE)).select(*self.keys, CENT_ID, "cos")
            )
        per = base.groupBy(CENT_ID).agg(
            F.count(F.lit(1)).alias("n"), F.sum("cos").alias("s")
        )
        rows = per.collect()
        n_total = sum(r["n"] for r in rows)
        sizes = [r["n"] for r in rows]
        mean_cos = (sum(r["s"] for r in rows) / n_total) if n_total else None
        mean_sz = (n_total / len(rows)) if rows else 0.0
        return {
            "index_version": man["index_version"],
            "base_version": man["base_version"],
            "n_vectors": n_total,
            "n_dirty": n_dirty,
            "n_clusters": len(rows),
            "mean_cos": round(mean_cos, 6) if mean_cos is not None else None,
            "cluster_min": min(sizes) if sizes else 0,
            "cluster_max": max(sizes) if sizes else 0,
            "balance_ratio": round(max(sizes) / mean_sz, 3) if rows and mean_sz else None,
        }

    # ---------------------------------------------------------- compact
    def compact(self) -> dict:
        """Fold the overlay into the base index. Only partitions that
        gain or lose rows are rewritten: the dirty keys' OLD clusters
        come from a column-pruned (keys + centroid_id) scan of the base
        — the one amortized full-metadata pass, the same trade the
        sink's minor compaction makes — and their NEW clusters from the
        overlay itself. Every untouched ``centroid_id=N`` directory is
        HARD-LINKED into the new state dir (no data movement)."""
        man = self._load_manifest()
        if man is None:
            raise FileNotFoundError(f"no built index under {self.path} — build() first")
        dirty = self._read_dirty(man)
        if dirty is None:
            return {"mode": "noop", "partitions_rewritten": 0, "index_version": man["index_version"]}
        old_root = os.path.join(self.path, man["state_dir"])
        base = self.spark.read.parquet(old_root)
        dkeys = dirty.select(*self.keys)
        old_cents = [
            r[0]
            for r in base.join(F.broadcast(dkeys), on=list(self.keys), how="left_semi")
            .select(CENT_ID).distinct().collect()
        ]
        new_cents = [
            r[0] for r in dirty.filter(F.col(_ALIVE)).select(CENT_ID).distinct().collect()
        ]
        affected = sorted(set(old_cents) | set(new_cents))

        nv = man["index_version"] + 1
        state_dir = f"state/v{nv:06d}"
        new_root = os.path.join(self.path, state_dir)
        shutil.rmtree(new_root, ignore_errors=True)
        if affected:
            rewritten = (
                base.filter(F.col(CENT_ID).isin(affected))
                .join(F.broadcast(dkeys), on=list(self.keys), how="left_anti")
                .unionByName(
                    dirty.filter(F.col(_ALIVE) & F.col(CENT_ID).isin(affected))
                    .select(*base.columns)
                )
            )
            (
                rewritten.repartition(F.col(CENT_ID))
                .write.mode("overwrite")
                .partitionBy(CENT_ID)
                .parquet(new_root)
            )
        else:  # pure-noop overlay (e.g. deletes of never-indexed keys)
            os.makedirs(new_root, exist_ok=True)
        # hard-link the untouched partitions across
        for d in os.listdir(old_root):
            if not d.startswith(f"{CENT_ID}="):
                continue
            cid = int(d.split("=", 1)[1])
            if cid in set(affected):
                continue
            src, dst = os.path.join(old_root, d), os.path.join(new_root, d)
            os.makedirs(dst, exist_ok=True)
            for fn in os.listdir(src):
                if fn.endswith(".parquet"):
                    os.link(os.path.join(src, fn), os.path.join(dst, fn))
        linked = sum(
            1 for d in os.listdir(old_root)
            if d.startswith(f"{CENT_ID}=") and int(d.split("=", 1)[1]) not in set(affected)
        )
        self._commit(dict(man, index_version=nv, state_dir=state_dir, dirty_dir=None))
        return {
            "mode": "compacted",
            "partitions_rewritten": len(affected),
            "partitions_linked": linked,
            "index_version": nv,
        }
