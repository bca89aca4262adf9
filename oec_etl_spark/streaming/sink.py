"""Upsert sinks: MERGE INTO semantics over a snapshot-versioned lake table.

Two implementations behind one interface (SURVEY.md §7.0/R1):

- ``ParquetSnapshotSink`` — hash-bucketed parquet files + atomic JSON
  manifest swap. Implements exactly the semantics of an Iceberg
  copy-on-write ``MERGE INTO target USING changes ON key WHEN MATCHED
  [AND op='D'] THEN DELETE/UPDATE WHEN NOT MATCHED THEN INSERT`` with
  LWW conflict resolution, plus snapshot isolation (readers only ever
  see a committed manifest), schema evolution, exactly-once batch
  guards and embedded lineage. This is the sink the tests and the
  bench run, because the sandbox has no Iceberg runtime jar.
- ``IcebergMergeSink`` — the identical flow expressed as Iceberg SQL,
  used when `iceberg-spark-runtime` is on the classpath.

Scale design notes (100 TB / 10^10 events):
- The target is laid out in ``n_buckets`` conv_id hash buckets (the
  parquet analog of Iceberg's ``bucket(N, conv_id)`` partition
  transform). A MERGE only reads and rewrites the buckets that the
  batch actually touches (partition pruning for upserts); at cluster
  scale n_buckets is sized so one bucket ≈ one task's worth of data.
- Two layouts behind one manifest: ``table_mode="cow"`` merges each
  batch against the touched buckets and rewrites them (read-optimal);
  ``table_mode="mor"`` appends each batch's winners as delta files —
  O(batch) per commit, never reading stored data — with the LWW merge
  deferred to read time and ``compact()`` (Iceberg's
  rewrite_data_files analog) folding deltas back into bases. The
  update-heavy micro-batch regime at 10^10 events runs mor + periodic
  compaction.
- The LWW reduce is an algebraic aggregate (map-side combine), so a
  duplicate-heavy change log shrinks *before* the shuffle.
- Exactly-once: Structured Streaming re-delivers a failed epoch to
  ``foreachBatch`` with the same batch_id; committed batch ids live in
  the manifest, so a replayed epoch is skipped. Additionally the merge
  itself is a semilattice (idempotent), so even a lost manifest guard
  degrades to effectively-once, never to corruption.
- Watermarks: per-bucket highest processed `seq` is recorded for
  lineage/monitoring and resume verification. It is deliberately NOT
  used as a drop-filter: delivery has bounded disorder, so an
  unapplied event can carry a lower seq than the bucket's max, and a
  strict `seq <= watermark` filter would lose it. Duplicate events are
  instead neutralized by the idempotent merge (and counted).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from oec_etl_spark.operators.bucketing import with_bucket
from oec_etl_spark.operators.lww import _RANK, lww_patch_combine, lww_reduce, lww_reduce_hash
from oec_etl_spark.schemas import (
    KEY_COLUMNS,
    ORDER_COLUMNS,
    META_BUCKET,
    META_DELETED,
    META_SEQ,
    storage_schema,
)
from oec_etl_spark.streaming.lineage import BatchLineage
from oec_etl_spark.streaming.reconcile import conform, evolve_schema, payload_schema

_ENVELOPE = ("seq", "op", "source_file", "offset")
_TIE = "__tie"
_FROM_BATCH = "__from_batch"
_UF = "__uf"  # xxhash64(source_file) — fixed-width row uniquifier
_UO = "__uo"  # delivery offset — fixed-width row uniquifier
FILESTATS = "_filestats.json"  # per-bucket-dir ts zone map sidecar
# Key bloom filters (opt-in, key_bloom_bits): number of hash probes per
# key. With m bits and n distinct keys per file the false-positive rate
# is ~(1 - e^(-k*n/m))^k; at the default k=4 sizing m ≈ 8–16 bits/key
# gives ~2–6% FPR — a wrong-way error only ever ADMITS a file.
KEY_BLOOM_K = 4


def _epoch_micros(ts) -> int:
    """Accept datetime (naive = UTC), ISO string, or epoch seconds."""
    import datetime as _dt

    if isinstance(ts, str):
        ts = _dt.datetime.fromisoformat(ts)
    if isinstance(ts, _dt.datetime):
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=_dt.timezone.utc)
        return int(ts.timestamp() * 1_000_000)
    return int(float(ts) * 1_000_000)


class ConcurrentCommitError(RuntimeError):
    """A second writer advanced the table between read and commit."""


class ParquetSnapshotSink:
    """Atomic snapshot-versioned parquet table with MERGE upsert."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_buckets: int = 16,
        hot_key_threshold: float | None = 0.05,
        hot_key_salt: int = 8,
        merge_strategy: str = "hash",
        table_mode: str = "cow",
        write_sorted: bool = False,
        branch: str | None = None,
        files_per_bucket: int = 1,
        profile: bool = False,
        key_bloom_bits: int | None = None,
    ):
        self.spark = spark
        self.root = root
        self.n_buckets = n_buckets
        self.hot_key_threshold = hot_key_threshold
        self.hot_key_salt = hot_key_salt
        self.merge_strategy = merge_strategy  # "hash" (slim-agg + winner join) | "sort" (max_by)
        self.table_mode = table_mode  # "cow" (rewrite touched buckets) | "mor" (append deltas, merge on read)
        # Write-audit-publish: a handle opened on a branch reads from and
        # commits to that branch's ref instead of CURRENT (main). Create
        # the branch first with create_branch(); publish with publish().
        self.branch = branch
        # Iceberg WRITE ORDERED BY analog: physically order each data
        # file by (conv_id, turn_idx). Costs a per-task sort of the
        # winners on every write; buys parquet RLE/dictionary
        # compression on conv_id and sequential turn reads. Off by
        # default — the logical "stable turn ordering" invariant is
        # enforced at read time either way.
        self.write_sorted = write_sorted
        # Sub-bucket write fan-out: with k > 1, a bucket's rows spread
        # over ~k shuffle tasks (and so ~k files) instead of exactly one.
        # At 10^10 rows a bucket's base is tens of GB — a single write
        # task (and a single compaction task) per bucket is the scale
        # ceiling this lifts. The salt is a SECOND independent hash of
        # conv_id (seeded xxhash64), never pmod(xxhash64(conv_id), k):
        # that one is constant within a bucket whenever k divides
        # n_buckets, which would silently disable the fan-out. A
        # conversation still lands wholly in one file (salt is per
        # conv_id), preserving write_sorted locality and point-read
        # behavior; readers are unaffected — they glob the bucket dir.
        self.files_per_bucket = max(1, int(files_per_bucket))
        # Opt-in per-batch data-quality profile: one EXTRA aggregate
        # pass over the batch payload per merge (job A is deliberately
        # payload-free, and an Observation can't sit on the batch — the
        # hash-path reduce consumes it twice). Off by default; the cost
        # is explicit and O(batch).
        self.profile = profile
        # Opt-in per-file key BLOOM FILTERS in the zone-map sidecar
        # (Parquet bloom_filter_enabled / Iceberg write.bloom-filter
        # analog, but readable without opening the file). Why min/max
        # key ranges aren't enough: conv_ids are hash-distributed, so
        # under sub-bucket fan-out every file's [key_min, key_max]
        # spans essentially the whole keyspace and range pruning goes
        # blind exactly where fan-out created the extra files — and MOR
        # delta files mix whatever conversations the batch touched. A
        # per-file bloom prunes by membership, not order. Cost: one
        # extra columnar scan of conv_id over each just-written version
        # dir (distributed, O(written rows), text bytes never read).
        # Reads fall back to not pruning when the bitmap is absent, so
        # the knob can be flipped on/off mid-table-life safely.
        self.key_bloom_bits = int(key_bloom_bits) if key_bloom_bits else None
        os.makedirs(os.path.join(root, "_manifests"), exist_ok=True)

    def _write_store(self, store: DataFrame, vdir: str, ts_split: int = 1) -> None:
        """Bucket-aligned write: repartition to the bucket layout first
        (otherwise every shuffle task opens a file in every touched
        bucket dir — N×buckets small files, measured anti-scaling),
        optionally fanned out to ~files_per_bucket tasks per bucket,
        optionally sorting each task's rows by key (write_sorted).

        ``ts_split > 1`` (compaction only) range-partitions each bucket
        on ``ts`` into ~ts_split files instead — Iceberg's secondary
        ``days(ts)`` partitioning analog: every output file owns a
        compact time slice, so the zone maps make a later `scan_since`
        prune WITHIN the compacted base, not just across deltas. It
        supersedes the conv-hash fan-out for that write (a file can't
        be both a time slice and a conversation shard)."""
        if ts_split > 1:
            out = store.repartitionByRange(
                self.n_buckets * ts_split, F.col(META_BUCKET), F.col("ts")
            )
        elif self.files_per_bucket > 1:
            salt = F.pmod(
                F.xxhash64(F.col("conv_id"), F.lit("subfile")),
                F.lit(self.files_per_bucket),
            )
            out = store.repartition(
                self.n_buckets * self.files_per_bucket, F.col(META_BUCKET), salt
            )
        else:
            out = store.repartition(self.n_buckets, F.col(META_BUCKET))
        if self.write_sorted:
            out = out.sortWithinPartitions(META_BUCKET, *KEY_COLUMNS)
        out.write.mode("overwrite").partitionBy(META_BUCKET).parquet(
            os.path.join(self.root, vdir)
        )
        self._record_file_stats(vdir)
        self._record_key_blooms(vdir)

    def _record_file_stats(self, vdir: str) -> None:
        """Zone map: per-file min/max of ``ts`` (epoch µs) AND of the
        ``conv_id`` key, harvested from the parquet footers just
        written — metadata-only, O(files) driver work, no Spark job
        (the Iceberg manifest column-stats analog). The sidecar lives
        INSIDE each bucket dir so it travels with clone's per-bucket
        copy and dies with expiry/vacuum; purge rewrites a bucket dir
        wholesale, which simply drops the sidecar there (readers fall
        back to not pruning — always sound).

        The key range powers point-lookup file skipping WITHIN a
        bucket: with sub-bucket write fan-out (files_per_bucket) a
        conversation lands wholly in one file per write, and with
        write_sorted the ranges are tight — either way a
        ``lookup(conv_id)`` drops every file whose [key_min, key_max]
        excludes the key. parquet-mr truncates long binary stats with
        directional rounding (min prefix-truncated down, max
        incremented), so the recorded range only ever widens — range
        checks stay conservative."""
        import pyarrow.parquet as pq

        base = os.path.join(self.root, vdir)
        if not os.path.isdir(base):
            return
        for entry in os.listdir(base):
            bdir = os.path.join(base, entry)
            if not (entry.startswith(f"{META_BUCKET}=") and os.path.isdir(bdir)):
                continue
            stats: dict[str, dict] = {}
            for fn in os.listdir(bdir):
                if not fn.endswith(".parquet"):
                    continue
                md = pq.ParquetFile(os.path.join(bdir, fn)).metadata
                sch = md.schema.to_arrow_schema()
                if "ts" not in sch.names:
                    continue
                ci = sch.get_field_index("ts")
                lo = hi = None
                nn: int | None = 0  # NULL ts rows (None = unknown → no claim)
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    if st is None or not st.has_min_max:
                        lo = hi = nn = None
                        break  # INT96/statless chunk: no claim for this file
                    mn = int(st.min.timestamp() * 1_000_000)
                    mx = int(st.max.timestamp() * 1_000_000)
                    lo = mn if lo is None else min(lo, mn)
                    hi = mx if hi is None else max(hi, mx)
                    if nn is not None:
                        nn = None if st.null_count is None else nn + int(st.null_count)
                klo = khi = None
                if "conv_id" in sch.names:
                    ki = sch.get_field_index("conv_id")
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(ki).statistics
                        if st is None or not st.has_min_max:
                            klo = khi = None
                            break
                        mn = st.min.decode() if isinstance(st.min, bytes) else str(st.min)
                        mx = st.max.decode() if isinstance(st.max, bytes) else str(st.max)
                        klo = mn if klo is None else min(klo, mn)
                        khi = mx if khi is None else max(khi, mx)
                stats[fn] = {"ts_min": lo, "ts_max": hi, "ts_nulls": nn,
                             "rows": md.num_rows, "key_min": klo, "key_max": khi}
            tmp = os.path.join(bdir, FILESTATS + ".tmp")
            with open(tmp, "w") as f:
                json.dump(stats, f)
            os.replace(tmp, os.path.join(bdir, FILESTATS))

    def _record_key_blooms(self, vdir: str) -> None:
        """Per-file conv_id bloom filters, merged into the zone-map
        sidecars that ``_record_file_stats`` just wrote. Distributed
        harvest: ONE Spark job scans only the conv_id column of the
        just-written files (dictionary-encoded, a tiny fraction of the
        bytes), computes each row's KEY_BLOOM_K probe positions
        JVM-side, and ships back O(files × distinct positions) ints —
        never rows — to the driver, which packs bitmaps. At cluster
        scale this is the same shape as Iceberg's write-time
        bloom-filter stats, amortized into the commit.

        Probe parity: position_i = pmod(xxhash64(conv_id, i), m). The
        lookup side computes the identical expression in the same JVM
        (batched into the job it already runs for the bucket id), so
        the two sides can never drift the way a Python reimplementation
        of xxhash64 could."""
        if not self.key_bloom_bits:
            return
        import base64

        m, k = self.key_bloom_bits, KEY_BLOOM_K
        base = os.path.join(self.root, vdir)
        if not os.path.isdir(base):
            return
        # An empty write (e.g. a MOR batch whose rows all fell under the
        # truncate/TTL horizon) leaves only _SUCCESS behind; reading it
        # raises UNABLE_TO_INFER_SCHEMA and — because the checkpoint
        # replays the batch — wedges the stream in a crash loop. No data
        # files → nothing to bloom.
        if not any(
            fn.endswith(".parquet")
            for _, _, fns in os.walk(base)
            for fn in fns
        ):
            return
        probes = F.array(*[
            F.pmod(F.xxhash64(F.col("conv_id"), F.lit(i)), F.lit(m)).cast("int")
            for i in range(k)
        ])
        rows = (
            self.spark.read.parquet(base)
            .select(F.input_file_name().alias("__f"), F.explode(probes).alias("__p"))
            .groupBy("__f")
            .agg(F.collect_set("__p").alias("__ps"))
            .collect()
        )
        by_dir: dict[str, dict[str, list[int]]] = {}
        for r in rows:
            path = r["__f"]
            if path.startswith("file:"):
                path = path[len("file:"):]
            d, fn = os.path.split(path)
            by_dir.setdefault(d, {})[fn] = r["__ps"]
        for d, files in by_dir.items():
            sp = os.path.join(d, FILESTATS)
            side: dict = {}
            if os.path.exists(sp):
                with open(sp) as f:
                    side = json.load(f)
            for fn, positions in files.items():
                bits = bytearray((m + 7) // 8)
                for p in positions:
                    bits[p >> 3] |= 1 << (p & 7)
                ent = side.setdefault(fn, {})
                ent["bloom"] = base64.b64encode(bytes(bits)).decode()
                ent["bloom_m"] = m
                ent["bloom_k"] = k
            tmp = sp + ".tmp"
            with open(tmp, "w") as f:
                json.dump(side, f)
            os.replace(tmp, sp)

    def _key_probe_hashes(self, conv_id: str) -> tuple[int, list[int]]:
        """(bucket id, KEY_BLOOM_K raw xxhash64 probe hashes) for a key,
        from ONE tiny JVM job — the same job lookup() already needs for
        the bucket id. Raw hashes (not positions) so the read side can
        re-mod against whatever ``bloom_m`` each sidecar entry recorded,
        staying correct across a key_bloom_bits re-configuration."""
        row = (
            self.spark.range(1)
            .select(
                F.pmod(F.xxhash64(F.lit(conv_id)), F.lit(self.n_buckets))
                .cast("int").alias("b"),
                *[
                    F.xxhash64(F.lit(conv_id), F.lit(i)).alias(f"h{i}")
                    for i in range(KEY_BLOOM_K)
                ],
            )
            .first()
        )
        return row["b"], [row[f"h{i}"] for i in range(KEY_BLOOM_K)]

    # ------------------------------------------------------------ state
    def _current_pointer(self) -> str:
        return os.path.join(self.root, "CURRENT")

    def _ref_path(self, name: str) -> str:
        return os.path.join(self.root, "_refs", f"{name}.json")

    def _read_ref(self, name: str) -> dict:
        path = self._ref_path(name)
        if not os.path.exists(path):
            raise FileNotFoundError(f"no branch {name!r} under {self.root}")
        with open(path) as f:
            return json.load(f)

    def load_manifest(self, version: int | None = None) -> dict | None:
        """Committed manifest of this handle's ref (CURRENT, or the
        branch the handle was opened on); pass ``version`` for time
        travel / reading another ref's head."""
        if version is None:
            if self.branch is not None:
                version = int(self._read_ref(self.branch)["version"])
            else:
                ptr = self._current_pointer()
                if not os.path.exists(ptr):
                    return None
                with open(ptr) as f:
                    version = json.load(f)["version"]
        path = os.path.join(self.root, "_manifests", f"manifest-{version:06d}.json")
        if not os.path.exists(path):
            raise FileNotFoundError(f"no snapshot version {version} under {self.root}")
        with open(path) as f:
            return json.load(f)

    def _precheck_version(self, v: int) -> None:
        """Guard shared by version-named data writes and commits:
        committing version ``v`` from this handle must still be
        possible. Data dirs are version-named (``data/v{v}``), so this
        MUST also run before ``_write_store`` — a raced writer has to
        fail before its overwrite clobbers files another ref's
        already-committed manifest references."""
        mpath = os.path.join(self.root, "_manifests", f"manifest-{v:06d}.json")
        if os.path.exists(mpath):
            raise ConcurrentCommitError(
                f"snapshot v{v} already exists — another writer (main or a "
                f"branch) claimed this version; re-read and re-merge"
            )
        ptr = self._ref_path(self.branch) if self.branch is not None else self._current_pointer()
        if os.path.exists(ptr):
            with open(ptr) as f:
                cur = json.load(f)["version"]
            if cur != v - 1:
                ref = self.branch or "CURRENT"
                raise ConcurrentCommitError(
                    f"stale commit: {ref} is v{cur}, this commit was derived "
                    f"from v{v - 1} — another writer advanced the table"
                )
        elif self.branch is not None:
            raise FileNotFoundError(
                f"no branch {self.branch!r} under {self.root} — create_branch() first"
            )

    def _commit(self, manifest: dict) -> None:
        """Write manifest file, then atomically swap this handle's ref
        pointer (CURRENT for main, the branch ref otherwise).

        Optimistic concurrency (Iceberg's commit model): the engine is
        single-writer per ref by design (one streaming query), but a
        second writer opened by mistake must fail loudly, not silently
        clobber the other's snapshot. A commit is valid only if (a) it
        advances its ref by exactly one from the manifest it was derived
        from, and (b) no other ref's writer already claimed the same
        manifest version — if either moved underneath us, raise; the
        caller re-reads and re-merges (the LWW merge is idempotent, so a
        retry is safe)."""
        v = manifest["version"]
        self._precheck_version(v)
        manifest["committed_at"] = time.time()  # drives AS OF <timestamp>
        mpath = os.path.join(self.root, "_manifests", f"manifest-{v:06d}.json")
        ptr = self._ref_path(self.branch) if self.branch is not None else self._current_pointer()
        with open(mpath, "w") as f:
            json.dump(manifest, f, default=str)
        tmp = ptr + ".tmp"
        if self.branch is not None:
            with open(ptr) as f:
                ref = json.load(f)
            ref["version"] = v
            with open(tmp, "w") as f:
                json.dump(ref, f)
        else:
            with open(tmp, "w") as f:
                json.dump({"version": v}, f)
        os.replace(tmp, ptr)  # POSIX-atomic

    def schema(self) -> T.StructType | None:
        man = self.load_manifest()
        return T.StructType.fromJson(man["schema"]) if man else None

    def _sync_layout(self, man: dict | None) -> None:
        """The COMMITTED manifest owns the bucket count. A sink handle
        constructed with a different ``n_buckets`` than the table was
        written with must not win: batch rows would hash to different
        buckets than the stored layout, the merge would read the wrong
        stored rows, and an update would survive next to the row it
        should have replaced. (Changing the layout is an explicit
        ``rebucket()``, never a constructor default.)"""
        if man and man.get("n_buckets"):
            self.n_buckets = int(man["n_buckets"])

    # ----------------------------------------------------- maintenance
    def files_df(self, version: int | None = None) -> DataFrame:
        """Iceberg ``table.files`` metadata-table analog: one row per
        live data file of a snapshot, assembled purely from the
        manifest + zone-map sidecars + a directory listing — no data
        or footer reads, O(files) driver work. What an operator (or a
        planner) asks before acting: which buckets are delta-heavy,
        which files lack stats/blooms, where the size skew is. At
        cluster scale this listing comes off the manifest store, not
        the data store, so it stays cheap at 10^10 rows."""
        man = self.load_manifest(version)
        if man is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        schema = T.StructType(
            [
                T.StructField("bucket", T.IntegerType()),
                T.StructField("kind", T.StringType()),
                T.StructField("file", T.StringType()),
                T.StructField("size_bytes", T.LongType()),
                T.StructField("rows", T.LongType()),
                T.StructField("ts_min_us", T.LongType()),
                T.StructField("ts_max_us", T.LongType()),
                T.StructField("key_min", T.StringType()),
                T.StructField("key_max", T.StringType()),
                T.StructField("has_bloom", T.BooleanType()),
            ]
        )
        out: list[tuple] = []

        def scan(d: str, bucket: int, kind: str) -> None:
            if not os.path.isdir(d):
                return
            side: dict = {}
            sp = os.path.join(d, FILESTATS)
            if os.path.exists(sp):
                with open(sp) as f:
                    side = json.load(f)
            for fn in sorted(os.listdir(d)):
                if not fn.endswith(".parquet"):
                    continue
                st = side.get(fn) or {}
                full = os.path.join(d, fn)
                out.append(
                    (
                        bucket,
                        kind,
                        os.path.relpath(full, self.root),
                        os.path.getsize(full),
                        st.get("rows"),
                        st.get("ts_min"),
                        st.get("ts_max"),
                        st.get("key_min"),
                        st.get("key_max"),
                        bool(st.get("bloom")),
                    )
                )

        for b, vdir in man.get("buckets", {}).items():
            scan(os.path.join(self.root, vdir, f"{META_BUCKET}={int(b)}"), int(b), "base")
        for b, ddirs in man.get("deltas", {}).items():
            for ddir in ddirs:
                scan(os.path.join(self.root, ddir, f"{META_BUCKET}={int(b)}"), int(b), "delta")
        return self.spark.createDataFrame(out, schema)

    def snapshots_df(self) -> DataFrame:
        """Iceberg ``table.snapshots`` metadata-table analog: one row
        per committed (non-expired) version, from the manifest chain
        alone."""
        schema = T.StructType(
            [
                T.StructField("version", T.IntegerType()),
                T.StructField("batch_id", T.LongType()),
                T.StructField("rows_applied", T.LongType()),
                T.StructField("committed_at", T.DoubleType()),
            ]
        )
        rows = [
            (
                int(h["version"]),
                h["batch_id"],
                h["rows_applied"],
                h["committed_at"],
            )
            for h in self.history()
        ]
        return self.spark.createDataFrame(rows, schema)

    def history(self) -> list[dict]:
        """All committed snapshot versions with their lineage summary —
        the analog of Iceberg's ``table.history()``/snapshots metadata."""
        out = []
        mdir = os.path.join(self.root, "_manifests")
        for name in sorted(os.listdir(mdir)):
            with open(os.path.join(mdir, name)) as f:
                man = json.load(f)
            last = man["lineage"][-1] if man.get("lineage") else {}
            out.append(
                {
                    "version": man["version"],
                    "batch_id": last.get("batch_id"),
                    "rows_applied": last.get("rows_applied"),
                    "committed_at": last.get("committed_at"),
                }
            )
        return out

    def expire_snapshots(
        self, keep_last: int = 1, older_than_ts: float | None = None
    ) -> list[str]:
        """Snapshot expiry (Iceberg ``expireSnapshots`` analog): drop
        manifests older than the newest ``keep_last`` and delete data
        version-dirs no kept manifest references. ``older_than_ts``
        (UNIX time) adds an age floor — Iceberg's ``olderThan``: a
        snapshot committed at or after it is kept even beyond
        keep_last, so "retain 7 days of history" composes with "always
        keep the newest N". Readers of kept snapshots are unaffected
        (their files are all retained). Returns the deleted paths."""
        import shutil

        mdir = os.path.join(self.root, "_manifests")
        names = sorted(os.listdir(mdir))
        if older_than_ts is not None:
            young = []
            for n in names:
                path = os.path.join(mdir, n)
                with open(path) as f:
                    man = json.load(f)
                at = man.get("committed_at") or os.path.getmtime(path)
                if float(at) >= older_than_ts:
                    young.append(n)
            # commits are linear, so the young set is a suffix of names:
            # widening keep_last to cover it keeps every young snapshot
            keep_last = max(keep_last, len(young))
        protected = {
            f"manifest-{v:06d}.json" for v in self.tags().values()
        }  # tagged snapshots are retention-protected
        # the ref heads are always protected: main's CURRENT (which may
        # be OLDER than the newest manifests while a branch is staging)
        # and every branch head (whose manifest pins the branch's data)
        ptr = self._current_pointer()
        if os.path.exists(ptr):
            with open(ptr) as f:
                protected.add(f"manifest-{json.load(f)['version']:06d}.json")
        for ref in self.branches().values():
            protected.add(f"manifest-{int(ref['version']):06d}.json")
        keep = sorted(set(names[-keep_last:]) | (protected & set(names)))
        drop = [n for n in names if n not in keep]
        referenced: set[str] = set()
        for name in keep:
            with open(os.path.join(mdir, name)) as f:
                kept = json.load(f)
            referenced.update(kept.get("buckets", {}).values())
            for ddirs in kept.get("deltas", {}).values():
                referenced.update(ddirs)
        deleted: list[str] = []
        data_root = os.path.join(self.root, "data")
        if os.path.isdir(data_root):
            for vdir in sorted(os.listdir(data_root)):
                if f"data/{vdir}" not in referenced:
                    shutil.rmtree(os.path.join(data_root, vdir))
                    deleted.append(f"data/{vdir}")
        for name in drop:
            os.remove(os.path.join(mdir, name))
            deleted.append(f"_manifests/{name}")
        return deleted

    def remove_orphans(self, older_than_s: float = 3600.0) -> list[str]:
        """Crash-orphan cleanup (Iceberg ``remove_orphan_files`` analog):
        delete data version-dirs that NO manifest references — the
        leftovers of a writer that died between ``_write_store`` and
        ``_commit`` (data dirs are version-named and written before the
        manifest, so a crash in that window strands a full copy of the
        touched buckets). Unlike ``expire_snapshots`` this keeps every
        snapshot; it only reclaims never-committed writes.

        ``older_than_s`` is the safety horizon: a dir younger than it is
        presumed to belong to an in-flight writer about to commit and is
        left alone (same contract as Iceberg's ``older_than``)."""
        import shutil

        mdir = os.path.join(self.root, "_manifests")
        referenced: set[str] = set()
        for name in os.listdir(mdir):
            with open(os.path.join(mdir, name)) as f:
                man = json.load(f)
            referenced.update(man.get("buckets", {}).values())
            for ddirs in man.get("deltas", {}).values():
                referenced.update(ddirs)
        deleted: list[str] = []
        data_root = os.path.join(self.root, "data")
        if not os.path.isdir(data_root):
            return deleted
        now = time.time()
        for vdir in sorted(os.listdir(data_root)):
            rel = f"data/{vdir}"
            full = os.path.join(data_root, vdir)
            if rel in referenced:
                continue
            if now - os.path.getmtime(full) < older_than_s:
                continue
            shutil.rmtree(full)
            deleted.append(rel)
        return deleted

    def fsck(self) -> dict:
        """Read-only table health check (CLI ``doctor``) — everything an
        operator wants to know before trusting or repairing a table,
        from metadata alone (no data reads, no mutations):

        - ref integrity: CURRENT / every branch ref / every tag points
          at an existing manifest;
        - storage integrity: every dir a retained manifest references
          exists and holds at least one data file;
        - orphans: data version-dirs no manifest references (crashed
          writers — ``vacuum`` candidates), counted not deleted;
        - stats coverage: zone-map / bloom sidecar coverage (pruning
          blind spots);
        - chain shape: retained version count, committed-batch count,
          truncate horizon.

        Returns {"ok": bool, "issues": [str...], ...summary}. A healthy
        table returns ok=True with an empty issue list; nothing here
        ever writes."""
        issues: list[str] = []
        mdir = os.path.join(self.root, "_manifests")
        names = sorted(os.listdir(mdir)) if os.path.isdir(mdir) else []
        manifests: dict[str, dict] = {}
        for n in names:
            try:
                with open(os.path.join(mdir, n)) as f:
                    manifests[n] = json.load(f)
            except (OSError, json.JSONDecodeError) as e:
                issues.append(f"unreadable manifest {n}: {e}")
        # ref integrity
        head = None
        ptr = self._current_pointer()
        if os.path.exists(ptr):
            # a corrupt CURRENT is exactly what the doctor exists to
            # diagnose — report it, don't crash on it
            try:
                with open(ptr) as f:
                    head = int(json.load(f)["version"])
            except (OSError, json.JSONDecodeError, KeyError, ValueError, TypeError) as e:
                issues.append(f"unreadable CURRENT pointer: {e}")
            if head is not None and f"manifest-{head:06d}.json" not in manifests:
                issues.append(f"CURRENT points at missing manifest v{head}")
        elif names:
            issues.append("manifests exist but CURRENT pointer is absent")
        # branch/tag checks must survive the very damage they look for
        # (tags live in the head manifest, which may itself be dangling)
        try:
            branches = self.branches()
        except (OSError, json.JSONDecodeError, FileNotFoundError):
            branches = {}
            issues.append("branch refs unreadable")
        for bname, ref in branches.items():
            if f"manifest-{int(ref['version']):06d}.json" not in manifests:
                issues.append(f"branch {bname!r} head v{ref['version']} manifest missing")
        try:
            tags = self.tags()
        except (FileNotFoundError, OSError, json.JSONDecodeError, KeyError, ValueError):
            tags = {}  # dangling/corrupt CURRENT already reported above
        for tname, v in tags.items():
            if f"manifest-{int(v):06d}.json" not in manifests:
                issues.append(f"tag {tname!r} manifest v{v} missing")
        # storage integrity + sidecar coverage over the head manifest
        referenced: set[str] = set()
        bucket_dirs: set[str] = set()  # per-bucket dirs, the real data units
        for man in manifests.values():
            for b, vdir in man.get("buckets", {}).items():
                referenced.add(vdir)
                bucket_dirs.add(os.path.join(vdir, f"{META_BUCKET}={int(b)}"))
            for b, ddirs in man.get("deltas", {}).items():
                referenced.update(ddirs)
                bucket_dirs.update(
                    os.path.join(d, f"{META_BUCKET}={int(b)}") for d in ddirs
                )
        for rel in sorted(bucket_dirs):
            full = os.path.join(self.root, rel)
            if not os.path.isdir(full):
                issues.append(f"referenced data dir missing: {rel}")
            elif not any(fn.endswith(".parquet") for fn in os.listdir(full)):
                issues.append(f"referenced data dir holds no data files: {rel}")
        files = with_stats = with_bloom = 0
        if head is not None and f"manifest-{head:06d}.json" in manifests:
            try:
                zs = self.zonemap_summary(head)
                files, with_stats, with_bloom = (
                    zs["files"], zs["with_stats"], zs["with_bloom"]
                )
                if files == 0 and manifests[f"manifest-{head:06d}.json"].get("buckets"):
                    issues.append("head manifest references buckets but no data files found")
            except FileNotFoundError as e:
                issues.append(str(e))
        # orphans (count only — vacuum deletes)
        data_root = os.path.join(self.root, "data")
        orphans = [
            f"data/{d}"
            for d in (sorted(os.listdir(data_root)) if os.path.isdir(data_root) else [])
            if f"data/{d}" not in referenced
        ]
        head_man = manifests.get(f"manifest-{head:06d}.json", {}) if head is not None else {}
        return {
            "ok": not issues,
            "issues": issues,
            "head_version": head,
            "retained_versions": len(manifests),
            "committed_batches": len(head_man.get("committed_batches", [])),
            "truncate_ts_us": head_man.get("truncate_ts_us"),
            "data_files": files,
            "files_with_stats": with_stats,
            "files_with_bloom": with_bloom,
            "orphan_dirs": len(orphans),
            "branches": sorted(branches),
            "tags": sorted(tags),
        }

    def compact(
        self, buckets: list[int] | None = None, tombstone_horizon: object = None,
        ts_split_files: int = 1,
    ) -> list[int]:
        """Merge-on-read compaction: rewrite each chosen bucket's base as
        the LWW merge of (base ∪ deltas) and clear its delta list —
        Iceberg's ``rewrite_data_files`` analog. Tombstones are RETAINED
        in the compacted base by default: a late out-of-order event must
        still lose to a newer delete, which it can only do if the
        tombstone's (ts, seq) survives.

        ``tombstone_horizon`` (a timestamp) drops tombstones with
        ``ts < horizon`` during the rewrite — set it to ``now - max
        event disorder`` (the same bound a dedup watermark uses): the
        stream contract says no event older than the horizon can still
        arrive, so those tombstones can never lose-protect anything
        again and deleted keys stop occupying space forever. Tombstones
        with NULL ts are kept (no ordering evidence to expire on).

        ``ts_split_files > 1`` writes each rewritten bucket as ~that
        many ts-range files (secondary time partitioning): combined
        with the write-time zone maps, a later ``scan_since`` horizon
        prunes the cold slices of a compacted base instead of reading
        all of it — the difference between O(table) and O(recent) for
        time-scoped reads at 10^10 rows. Returns the buckets compacted."""
        man = self.load_manifest()
        if man is None or not man.get("deltas"):
            return []
        self._sync_layout(man)
        dirty = sorted(int(b) for b, dd in man["deltas"].items() if dd)
        chosen = dirty if buckets is None else sorted(set(dirty) & set(buckets))
        if not chosen:
            return []
        schema = T.StructType.fromJson(man["schema"])
        merged = self._read_current(man, schema, chosen)
        if tombstone_horizon is not None:
            merged = merged.filter(
                ~(F.col(META_DELETED) & F.col("ts").isNotNull()
                  & (F.col("ts") < F.lit(tombstone_horizon)))
            )
        store = with_bucket(merged, self.n_buckets)
        new_version = man["version"] + 1
        self._precheck_version(new_version)  # before touching data/v{new_version}
        vdir = f"data/v{new_version:06d}"
        self._write_store(store, vdir, ts_split=max(1, int(ts_split_files)))
        man["version"] = new_version
        for b in chosen:
            # A bucket whose every row was reclaimed (truncate horizon /
            # tombstone expiry) writes no output dir; keep the previous
            # pointer — the read-path filters already hide those rows —
            # rather than pointing readers at a missing path.
            if os.path.isdir(os.path.join(self.root, vdir, f"{META_BUCKET}={b}")):
                man["buckets"][str(b)] = vdir
            man["deltas"][str(b)] = []
        self._commit(man)
        return chosen

    def alter_drop_column(self, name: str) -> int:
        """DROP COLUMN (Iceberg ``ALTER TABLE … DROP COLUMN`` analog):
        rewrite the CURRENT state without the column and commit the
        narrowed schema as a new snapshot. The rewrite is deliberate,
        not metadata-only: this store maps columns by NAME (no Iceberg
        field IDs), so a manifest-only drop would silently resurrect
        the old files' values the moment a later batch re-adds the
        same column name — physical removal is the only sound drop
        under name-based mapping, and it also erases the dropped
        values from the live table immediately. Cost: one bucket-
        parallel scan + write of the head state, same shape as a full
        ``compact()``. Old snapshots keep the column (their manifests
        and files are untouched); a later change batch carrying the
        name re-adds it via normal evolution with NULLs on old rows.
        Key and LWW-order columns cannot be dropped. Returns the new
        head version."""
        man = self.load_manifest()
        if man is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        self._sync_layout(man)
        schema = T.StructType.fromJson(man["schema"])
        if name not in [f.name for f in schema.fields]:
            raise KeyError(f"no column {name!r} in {self.root}")
        if name in KEY_COLUMNS or name in ORDER_COLUMNS:
            raise ValueError(f"column {name!r} is a key/order column — cannot drop")
        rows = self._read_current(man, schema).drop(name)  # tombstones kept
        store = with_bucket(rows, self.n_buckets)
        new_version = man["version"] + 1
        self._precheck_version(new_version)  # before touching data/v{new_version}
        vdir = f"data/v{new_version:06d}"
        self._write_store(store, vdir)
        written = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(os.path.join(self.root, vdir))
            if d.startswith(f"{META_BUCKET}=")
        )
        man["version"] = new_version
        man["schema"] = T.StructType(
            [f for f in schema.fields if f.name != name]
        ).jsonValue()
        man["buckets"] = {str(b): vdir for b in written}
        man["deltas"] = {}
        self._commit(man)
        return new_version

    def _dml_changes(self, predicate: str) -> tuple[DataFrame, "T.StructType"]:
        """Current LIVE rows matching ``predicate`` in change-row shape
        (payload + op/seq/source_file/offset), with ``seq`` bumped by 1
        at the row's own ``ts``: under the LWW order (ts, seq, …) the
        constructed event beats exactly the row it was derived from —
        and anything older — while any later real event still wins.
        That is the point-in-time semantics predicate DML needs: no
        timestamp forgery, no resurrection by late stragglers."""
        man = self.load_manifest()
        if man is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        self._sync_layout(man)
        schema = T.StructType.fromJson(man["schema"])
        cur = self._read_current(man, schema).filter(~F.col(META_DELETED))
        matched = cur.filter(F.expr(predicate))
        return matched, schema

    def _dml_batch_id(self) -> int:
        """Epoch id for an interactive DML commit. The streaming query
        owns the non-negative ids (its checkpoint replays them, and the
        epoch guard must keep recognizing them); DML descends through
        the negatives, next-free derived from the manifest — so a DML
        can never shadow a future streaming batch, and re-running the
        same DML statement gets a fresh epoch (it is not a redelivery)."""
        man = self.load_manifest() or {"committed_batches": []}
        return min([0, *man["committed_batches"]]) - 1

    def delete_where(self, predicate: str, batch_id: int | None = None) -> BatchLineage:
        """DELETE FROM table WHERE … (Iceberg/Delta predicate-delete
        analog), expressed THROUGH the merge: matched live rows become
        tombstone change events (NULL payload, op='D', same ts,
        seq+1), so every merge invariant — lineage, watermarks, epoch
        guard idempotence, bucket alignment, fan-out, mor deltas —
        applies unchanged. One table scan + one ordinary merge; a
        re-run matches nothing (the rows are gone) and commits an
        empty batch. GDPR-style *historical* erasure is purge_keys;
        this is current-state DML."""
        matched, schema = self._dml_changes(predicate)
        changes = matched.select(
            *KEY_COLUMNS,
            *[F.lit(None).cast(f.dataType).alias(f.name)
              for f in schema.fields if f.name not in (*KEY_COLUMNS, "ts")],
            F.col("ts"),
            F.lit("D").alias("op"),
            (F.col(META_SEQ) + 1).alias("seq"),
            F.lit("dml:delete_where").alias("source_file"),
            F.monotonically_increasing_id().alias("offset"),
        )
        return self.merge(changes, batch_id=self._dml_batch_id() if batch_id is None else batch_id)

    def truncate_before(self, ts, batch_id: int | None = None) -> BatchLineage:
        """TRUNCATE analog, O(1) metadata: every row (stored or yet to
        arrive) with ``ts <= horizon`` is dead as of this commit. No
        data file is touched — the read path filters and zone-map-prunes
        against the manifest horizon, late stragglers under it are
        dropped at merge time, and the next compaction physically
        reclaims the space. Expressed THROUGH the merge as a synthetic
        op='T' event, so the epoch guard, lineage and watermark
        invariants hold unchanged; rolling back to an earlier snapshot
        restores that snapshot's (smaller or absent) horizon. NULL-ts
        rows are retained — no ordering evidence, the same stance as
        tombstone expiry."""
        man = self.load_manifest()
        if man is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        schema = T.StructType.fromJson(man["schema"])
        # int ⇒ epoch MICROSECONDS, exact. The float-seconds path loses
        # sub-µs precision at current epoch magnitudes (double has 52
        # mantissa bits; 1.7e15 µs needs 51 — a round-trip through
        # seconds can shift the horizon ±1µs vs the integer-µs zone-map
        # arithmetic used everywhere else).
        ts_col = (
            F.timestamp_micros(F.lit(ts))
            if isinstance(ts, int) and not isinstance(ts, bool)
            else F.lit(ts).cast("timestamp")
        )
        changes = self.spark.range(1).select(
            *[F.lit(None).cast(f.dataType).alias(f.name)
              for f in schema.fields if f.name != "ts"],
            ts_col.alias("ts"),
            F.lit("T").alias("op"),
            F.lit(0).cast("long").alias("seq"),
            F.lit("dml:truncate").alias("source_file"),
            F.lit(0).cast("long").alias("offset"),
        )
        return self.merge(changes, batch_id=self._dml_batch_id() if batch_id is None else batch_id)

    def update_where(self, predicate: str, set_exprs: dict[str, str],
                     batch_id: int | None = None) -> BatchLineage:
        """UPDATE table SET col=expr, … WHERE … through the merge (see
        delete_where): matched live rows re-emitted as op='U' events
        carrying their current payload with ``set_exprs`` applied
        (exprs may reference any payload column), same ts, seq+1. Keys
        and ts cannot be SET — rekeying is a delete+insert and forging
        event time would corrupt the LWW order."""
        for name in set_exprs:
            if name in KEY_COLUMNS or name == "ts" or name.startswith("__"):
                raise ValueError(
                    f"cannot SET {name!r}: keys, ts and __* metadata are protected"
                )
        matched, schema = self._dml_changes(predicate)
        missing = [n for n in set_exprs if n not in {f.name for f in schema.fields}]
        if missing:
            raise KeyError(f"SET targets not in table schema: {missing}")
        payload = [
            F.expr(set_exprs[f.name]).cast(f.dataType).alias(f.name)
            if f.name in set_exprs else F.col(f.name)
            for f in schema.fields if f.name not in (*KEY_COLUMNS, "ts")
        ]
        changes = matched.select(
            *KEY_COLUMNS,
            *payload,
            F.col("ts"),
            F.lit("U").alias("op"),
            (F.col(META_SEQ) + 1).alias("seq"),
            F.lit("dml:update_where").alias("source_file"),
            F.monotonically_increasing_id().alias("offset"),
        )
        return self.merge(changes, batch_id=self._dml_batch_id() if batch_id is None else batch_id)

    def alter_rename_column(self, old: str, new: str) -> int:
        """RENAME COLUMN (Iceberg ``ALTER TABLE … RENAME COLUMN``
        analog). Like :meth:`alter_drop_column`, the rewrite is
        deliberate, not metadata-only: columns map by NAME here (no
        Iceberg field IDs), so a manifest-only rename would strand the
        head files' values under the old physical name — and the first
        change batch still carrying the old name would then resurrect
        it as a shadow column. One bucket-parallel scan + write of the
        head state (a ``compact()``-shaped job) keeps storage and
        schema in lock-step. Old snapshots keep the old name (their
        manifests and files are immutable — time travel shows history
        as it was). NOTE: the change stream's payload names do NOT
        follow the rename — a later batch carrying ``old`` re-adds it
        via normal evolution as a fresh column with NULLs on existing
        rows, exactly as any new column would; renaming is for
        DOWNSTREAM consumers, not for remapping the source. Key and
        LWW-order columns cannot be renamed (the merge's identity
        depends on them). Returns the new head version."""
        man = self.load_manifest()
        if man is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        self._sync_layout(man)
        schema = T.StructType.fromJson(man["schema"])
        names = [f.name for f in schema.fields]
        if old not in names:
            raise KeyError(f"no column {old!r} in {self.root}")
        if old in KEY_COLUMNS or old in ORDER_COLUMNS:
            raise ValueError(f"column {old!r} is a key/order column — cannot rename")
        if new in names:
            raise ValueError(f"column {new!r} already exists")
        if new.startswith("__"):
            raise ValueError(f"{new!r} collides with engine metadata namespace (__*)")
        rows = self._read_current(man, schema).withColumnRenamed(old, new)
        store = with_bucket(rows, self.n_buckets)
        new_version = man["version"] + 1
        self._precheck_version(new_version)  # before touching data/v{new_version}
        vdir = f"data/v{new_version:06d}"
        self._write_store(store, vdir)
        written = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(os.path.join(self.root, vdir))
            if d.startswith(f"{META_BUCKET}=")
        )
        man["version"] = new_version
        man["schema"] = T.StructType(
            [T.StructField(new, f.dataType, f.nullable) if f.name == old else f
             for f in schema.fields]
        ).jsonValue()
        man["buckets"] = {str(b): vdir for b in written}
        man["deltas"] = {}
        self._commit(man)
        return new_version

    def compact_minor(
        self, buckets: list[int] | None = None, min_deltas: int = 2
    ) -> list[int]:
        """Minor compaction (the Iceberg/HBase minor-vs-major
        distinction): fold each chosen bucket's DELTA files into one
        delta file without touching its base. Cost is O(sum of that
        bucket's deltas), never O(base) — the right tool for hot
        buckets whose base is large but whose deltas are many and
        small, i.e. the steady mor regime between major ``compact()``
        rewrites. The LWW reduce is associative (a semilattice), so
        reducing the deltas alone and merging with the base at read
        time equals reducing everything at once; tombstones are
        retained — a delta-level delete must still beat base rows and
        late events. Buckets with fewer than ``min_deltas`` delta
        files are skipped. Returns the buckets folded."""
        man = self.load_manifest()
        if man is None or not man.get("deltas"):
            return []
        self._sync_layout(man)
        chosen = sorted(
            int(b) for b, dd in man["deltas"].items()
            if len(dd) >= min_deltas and (buckets is None or int(b) in buckets)
        )
        if not chosen:
            return []
        schema = T.StructType.fromJson(man["schema"])
        store = storage_schema(schema)
        rows = (
            self.spark.read.schema(store)
            .parquet(*self._delta_paths(man, chosen))
            .withColumn("__file", F.xxhash64(F.input_file_name()))
        )
        folded = lww_reduce_hash(rows, order=("ts", META_SEQ, "__file")).drop("__file")
        out = with_bucket(folded, self.n_buckets)
        new_version = man["version"] + 1
        self._precheck_version(new_version)  # before touching data/d{new_version}
        vdir = f"data/d{new_version:06d}"
        self._write_store(out, vdir)
        written = {
            int(d.split("=", 1)[1])
            for d in os.listdir(os.path.join(self.root, vdir))
            if d.startswith(f"{META_BUCKET}=")
        }
        man["version"] = new_version
        for b in chosen:
            man["deltas"][str(b)] = [vdir] if b in written else []
        self._commit(man)
        return chosen

    # ------------------------------------------------- branches (WAP)
    # Write-audit-publish (Iceberg branch / WAP pattern): stage commits
    # on a named branch, audit the branch snapshot, then fast-forward
    # main to it — readers of main never see unaudited data. Version
    # numbers are globally linear, so while a branch holds unpublished
    # commits MAIN CANNOT ADVANCE (the _commit collision guard raises) —
    # strict WAP: pause ingest on main, stage + audit, then publish or
    # drop the branch to resume. That is the honest shape for a
    # single-writer CDC engine; truly concurrent refs are an Iceberg-
    # runtime feature (snapshot-id-based, not version-based).

    def create_branch(self, name: str, version: int | None = None) -> int:
        """Open a branch at ``version`` (default: current main head).
        Returns the base version. Write to it via a handle constructed
        with ``branch=name``."""
        man = self.load_manifest(version) if version is not None else (
            ParquetSnapshotSink(self.spark, self.root).load_manifest()
        )
        if man is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        path = self._ref_path(name)
        if os.path.exists(path):
            raise ValueError(f"branch {name!r} already exists under {self.root}")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        base = int(man["version"])
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": base, "base": base}, f)
        os.replace(tmp, path)
        return base

    def branches(self) -> dict[str, dict]:
        """name → {"version": head, "base": forked-from}."""
        rdir = os.path.join(self.root, "_refs")
        if not os.path.isdir(rdir):
            return {}
        out = {}
        for fn in sorted(os.listdir(rdir)):
            if fn.endswith(".json"):
                with open(os.path.join(rdir, fn)) as f:
                    out[fn[: -len(".json")]] = json.load(f)
        return out

    def drop_branch(self, name: str) -> list[str]:
        """Abandon a branch: delete its ref, its manifests past the base,
        and every data dir only those manifests reference — unblocking
        main's version sequence. Returns the deleted paths."""
        import shutil

        ref = self._read_ref(name)
        base, head = int(ref["base"]), int(ref["version"])
        os.remove(self._ref_path(name))
        deleted = [f"_refs/{name}.json"]
        mdir = os.path.join(self.root, "_manifests")
        drop_names = {f"manifest-{v:06d}.json" for v in range(base + 1, head + 1)}
        keep_referenced: set[str] = set()
        for fn in os.listdir(mdir):
            if fn in drop_names:
                continue
            with open(os.path.join(mdir, fn)) as f:
                kept = json.load(f)
            keep_referenced.update(kept.get("buckets", {}).values())
            for ddirs in kept.get("deltas", {}).values():
                keep_referenced.update(ddirs)
        branch_referenced: set[str] = set()
        for fn in sorted(drop_names):
            p = os.path.join(mdir, fn)
            if not os.path.exists(p):
                continue
            with open(p) as f:
                bman = json.load(f)
            branch_referenced.update(bman.get("buckets", {}).values())
            for ddirs in bman.get("deltas", {}).values():
                branch_referenced.update(ddirs)
            os.remove(p)
            deleted.append(f"_manifests/{fn}")
        for vdir in sorted(branch_referenced - keep_referenced):
            full = os.path.join(self.root, vdir)
            if os.path.isdir(full):
                shutil.rmtree(full)
                deleted.append(vdir)
        return deleted

    def publish(self, name: str) -> int:
        """Fast-forward main to the branch head (the P of WAP) and
        retire the branch ref. Refuses if main moved past the branch
        base (cannot happen under the strict lock, but a deleted-and-
        recreated table or a manual CURRENT edit must not be clobbered).
        Returns the published version."""
        ref = self._read_ref(name)
        base, head = int(ref["base"]), int(ref["version"])
        self.load_manifest(head)  # head manifest must exist
        ptr = self._current_pointer()
        with open(ptr) as f:
            cur = int(json.load(f)["version"])
        if cur != base:
            raise ConcurrentCommitError(
                f"cannot publish branch {name!r}: main is at v{cur}, branch "
                f"was forked at v{base}"
            )
        tmp = ptr + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": head}, f)
        os.replace(tmp, ptr)  # POSIX-atomic: main readers flip to the branch head
        os.remove(self._ref_path(name))
        return head

    def tag(self, name: str, version: int | None = None) -> int:
        """Name a snapshot (Iceberg tag analog): a durable alias for a
        version, usable in ``read_table(version=sink.tags()[name])``.
        Tagged versions are protected from ``expire_snapshots``."""
        man = self.load_manifest()
        if man is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        v = man["version"] if version is None else int(version)
        # verify the target manifest exists (raises otherwise)
        self.load_manifest(v)
        man["version"] += 1  # a tag is itself a (metadata-only) commit
        man.setdefault("tags", {})[name] = v
        self._commit(man)
        return v

    def tags(self) -> dict[str, int]:
        man = self.load_manifest()
        return {k: int(v) for k, v in (man or {}).get("tags", {}).items()}

    def rollback(self, version: int) -> int:
        """Roll this ref back to an earlier snapshot (Iceberg
        ``rollback_to_snapshot`` analog). Version numbers are linear and
        later manifests already claim them, so the ref pointer cannot
        move backwards; instead the rollback IS a new (metadata-only)
        commit whose table state — data file references, schema,
        watermarks, epoch guard — is the target snapshot's. Readers flip
        to the old files atomically; the bad snapshots stay in history
        for forensics until ``expire_snapshots``.

        The epoch guard (``committed_batches``) resets to the target's,
        so re-running the ingest with a FRESH checkpoint re-applies
        everything after the rollback point (the undo-and-replay
        workflow); resuming the ORIGINAL checkpoint replays nothing (its
        offsets are past the bad batches) and leaves the table rolled
        back. Tag names are carried forward, never lost. Returns the new
        head version."""
        head = self.load_manifest()
        if head is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        target = self.load_manifest(version)  # raises if unknown
        man = dict(target)
        man["version"] = head["version"] + 1
        man["tags"] = {**target.get("tags", {}), **head.get("tags", {})}
        man["lineage"] = list(target.get("lineage", [])) + [
            {"rolled_back_from": head["version"], "rolled_back_to": int(version)}
        ]
        self._commit(man)
        return man["version"]

    def clone(self, dest_root: str, version: int | None = None) -> int:
        """Fork the table (Delta ``DEEP CLONE`` analog): copy the chosen
        snapshot's referenced data files + manifest into ``dest_root``
        as an independent table at the same version. Pure metadata +
        file copy — no Spark job, no shuffle, no rewrite (at cluster
        scale this is a distributed file copy); tombstones and MOR
        delta files are preserved byte-for-byte, so the clone merges
        and compacts exactly like the source. The epoch guard
        (``committed_batches``) travels with the manifest, so resuming
        the source stream against the clone with a COPY of the
        checkpoint continues exactly-once — a pipeline fork for
        dev/test, migration, or blue/green cutover. Branch refs, tags,
        and older history do NOT travel (they pin snapshots the clone
        doesn't carry). Returns the cloned version."""
        import shutil

        man = self.load_manifest(version)
        if man is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        if os.path.exists(os.path.join(dest_root, "CURRENT")):
            raise ValueError(f"{dest_root} already holds a table — refusing to overwrite")
        pairs: set[tuple[str, int]] = set()
        for b, vdir in man.get("buckets", {}).items():
            pairs.add((vdir, int(b)))
        for b, ddirs in man.get("deltas", {}).items():
            pairs.update((d, int(b)) for d in ddirs)
        for vdir, b in sorted(pairs):
            rel = os.path.join(vdir, f"{META_BUCKET}={b}")
            shutil.copytree(os.path.join(self.root, rel), os.path.join(dest_root, rel))
        v = int(man["version"])
        os.makedirs(os.path.join(dest_root, "_manifests"), exist_ok=True)
        with open(os.path.join(dest_root, "_manifests", f"manifest-{v:06d}.json"), "w") as f:
            json.dump(man, f, default=str)
        tmp = os.path.join(dest_root, "CURRENT.tmp")
        with open(tmp, "w") as f:
            json.dump({"version": v}, f)
        os.replace(tmp, os.path.join(dest_root, "CURRENT"))
        return v

    def purge_keys(self, conv_ids: list[str]) -> dict:
        """Right-to-be-forgotten hard delete: physically remove every
        row of the given conversations from EVERY retained snapshot —
        current, historical, branch-pinned, MOR deltas, and tombstones
        (whose key column is itself the identifier) — plus the hot-key
        ids recorded in manifest/JSONL lineage. A tombstone-producing
        ``merge`` only hides a key going forward; time travel and the
        change feed still serve the old rows, which GDPR/CCPA erasure
        does not allow.

        Scale shape: the rewrite is pruned by the bucket hash to ONE
        bucket directory per purged key per data version and per
        layout (``rebucket`` history is honored), i.e. O(versions)
        map-only rewrites of 1/n_buckets of the data each — never a
        full-table pass. The membership test uses a literal IN for the
        CLI-sized key lists this serves; purging millions of keys at
        once would swap it for a broadcast anti-join.

        Out of scope (caller-owned inputs, not table state): the
        source change-log segments and any quarantine directory.
        A LATER change event for a purged key recreates it — run the
        purge after the stream can no longer carry that key.

        Operational notes: (a) purge rewrites files IN PLACE without a
        new snapshot version (erasure must reach history, so a new
        version can't express it) — quiesce ingest and readers while
        it runs, like any maintenance that breaks file immutability;
        (b) already-delivered change-feed pulls and materialized-view
        aggregates built before the purge may still embody the purged
        rows' contributions — re-pull / rebuild those downstream
        artifacts if erasure must propagate. Returns
        ``{keys, dirs_rewritten, rows_purged, lineage_scrubbed}``."""
        import shutil

        mdir = os.path.join(self.root, "_manifests")
        names = sorted(os.listdir(mdir))
        mans = []
        for n in names:
            with open(os.path.join(mdir, n)) as f:
                mans.append(json.load(f))
        ids_df = self.spark.createDataFrame([(c,) for c in conv_ids], "conv_id string")
        bucket_of: dict[int, set[int]] = {}
        for nb in {int(m.get("n_buckets") or self.n_buckets) for m in mans}:
            bucket_of[nb] = {r[META_BUCKET] for r in with_bucket(ids_df, nb).collect()}
        targets: set[str] = set()
        for m in mans:
            wanted = bucket_of[int(m.get("n_buckets") or self.n_buckets)]
            for b, vdir in m.get("buckets", {}).items():
                if int(b) in wanted:
                    targets.add(os.path.join(vdir, f"{META_BUCKET}={int(b)}"))
            for b, ddirs in m.get("deltas", {}).items():
                if int(b) in wanted:
                    targets.update(
                        os.path.join(d, f"{META_BUCKET}={int(b)}") for d in ddirs
                    )
        rewritten: list[str] = []
        purged = 0
        for rel in sorted(targets):
            full = os.path.join(self.root, rel)
            tmp, old = full + ".__purge_tmp", full + ".__purge_old"
            # crash recovery, in swap order: a complete tmp whose dir
            # vanished mid-swap is the new truth; anything else is stale
            if not os.path.isdir(full) and os.path.isdir(tmp):
                os.rename(tmp, full)
            for leftover in (old, tmp):
                if os.path.exists(leftover):
                    shutil.rmtree(leftover)
            if not os.path.isdir(full):
                continue  # already expired/vacuumed
            df = self.spark.read.parquet(full)
            hit = df.filter(F.col("conv_id").isin(conv_ids)).count()
            if not hit:
                continue
            df.filter(~F.col("conv_id").isin(conv_ids)).write.parquet(tmp)
            os.rename(full, old)
            os.rename(tmp, full)
            shutil.rmtree(old)
            purged += hit
            rewritten.append(rel)
        # lineage scrub: hot-key records carry conv_id in manifests and
        # in the _lineage JSONL feed
        scrubbed = 0
        gone = set(conv_ids)
        for name, m in zip(names, mans):
            dirty = False
            for rec in m.get("lineage", []):
                hot = rec.get("hot_keys")
                if hot and any(h.get("conv_id") in gone for h in hot):
                    rec["hot_keys"] = [h for h in hot if h.get("conv_id") not in gone]
                    dirty = True
                    scrubbed += 1
            if dirty:
                path = os.path.join(mdir, name)
                with open(path + ".tmp", "w") as f:
                    json.dump(m, f, default=str)
                os.replace(path + ".tmp", path)
        jpath = os.path.join(self.root, "_lineage", "lineage.jsonl")
        if os.path.exists(jpath):
            out_lines = []
            for line in open(jpath):
                rec = json.loads(line)
                hot = rec.get("hot_keys")
                if hot and any(h.get("conv_id") in gone for h in hot):
                    rec["hot_keys"] = [h for h in hot if h.get("conv_id") not in gone]
                    scrubbed += 1
                out_lines.append(json.dumps(rec))
            with open(jpath + ".tmp", "w") as f:
                f.write("\n".join(out_lines) + ("\n" if out_lines else ""))
            os.replace(jpath + ".tmp", jpath)
        return {
            "keys": list(conv_ids),
            "dirs_rewritten": rewritten,
            "rows_purged": purged,
            "lineage_scrubbed": scrubbed,
        }

    def version_as_of(self, ts: float) -> int:
        """Newest snapshot committed at or before UNIX time ``ts``
        (TIMESTAMP AS OF analog): ``read_table(version_as_of(ts))``.
        Falls back to manifest file mtime for pre-stamp manifests.

        The comparison carries 1 µs of slack: ``committed_at`` is a raw
        ``time.time()`` float with sub-µs digits, while callers usually
        arrive through a datetime/ISO roundtrip that truncates to whole
        µs — without the slack, asking for "as of exactly commit N's
        timestamp" can land 0.1 µs before commit N and miss it."""
        mdir = os.path.join(self.root, "_manifests")
        best: int | None = None
        for name in sorted(os.listdir(mdir)):
            path = os.path.join(mdir, name)
            with open(path) as f:
                man = json.load(f)
            at = man.get("committed_at") or os.path.getmtime(path)
            if float(at) <= ts + 1e-6 and (best is None or man["version"] > best):
                best = int(man["version"])
        if best is None:
            raise LookupError(f"no snapshot under {self.root} committed at or before {ts}")
        return best

    def rebucket(self, new_n_buckets: int) -> int:
        """Bucket-layout evolution (Iceberg partition-spec evolution
        analog): rewrite the whole table into ``new_n_buckets`` conv_id
        hash buckets in one atomic snapshot. The operational reason: a
        table sized for N tasks eventually outgrows its buckets — one
        bucket stops fitting one executor's share — and the fix must be
        a single explicit rewrite, not a config drift. Readers of older
        snapshots are unaffected (their manifests keep the old layout);
        the next merge picks up the new count from the manifest."""
        man = self.load_manifest()
        if man is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        self._sync_layout(man)
        schema = T.StructType.fromJson(man["schema"])
        rows = self._read_current(man, schema)  # tombstones kept
        self.n_buckets = int(new_n_buckets)
        store = with_bucket(rows, self.n_buckets)  # storage rows carry no bucket col
        new_version = man["version"] + 1
        self._precheck_version(new_version)  # before touching data/v{new_version}
        vdir = f"data/v{new_version:06d}"
        self._write_store(store, vdir)
        written = [
            int(d.split("=", 1)[1])
            for d in os.listdir(os.path.join(self.root, vdir))
            if d.startswith(f"{META_BUCKET}=")
        ]
        man["version"] = new_version
        man["n_buckets"] = self.n_buckets
        man["buckets"] = {str(b): vdir for b in sorted(written)}
        man["deltas"] = {}
        # watermarks are per-bucket; the old keys are meaningless under
        # the new hashing — fold them into one table-level floor
        wm = max((int(v) for v in man.get("watermarks", {}).values()), default=0)
        man["watermarks"] = {str(b): wm for b in sorted(written)}
        self._commit(man)
        return len(written)

    # ------------------------------------------------------------- read
    def _bucket_paths(self, man: dict, buckets: list[int] | None = None) -> list[str]:
        out = []
        for b, vdir in man.get("buckets", {}).items():
            if buckets is None or int(b) in buckets:
                out.append(os.path.join(self.root, vdir, f"{META_BUCKET}={int(b)}"))
        return out

    def _delta_paths(self, man: dict, buckets: list[int] | None = None) -> list[str]:
        out = []
        for b, ddirs in man.get("deltas", {}).items():
            if buckets is None or int(b) in buckets:
                out.extend(os.path.join(self.root, d, f"{META_BUCKET}={int(b)}") for d in ddirs)
        return out

    def _read_current(
        self, man: dict, schema: T.StructType, buckets: list[int] | None = None
    ) -> DataFrame:
        """Current storage-shape rows (tombstones KEPT) for the chosen
        buckets: base files, plus — in merge-on-read layouts — the LWW
        merge of base ∪ delta files at read time. Row-unique tiebreak
        for the hash-path reduce comes free from ``input_file_name``
        (any key appears at most once per file).

        Read-path pruning: only DIRTY buckets (those with delta files)
        pay the merge shuffle; clean buckets' base files are read
        straight through and unioned in. In the steady state —
        compaction keeps most buckets clean — a read shuffles only the
        recently-touched slice of the table instead of all of it.

        A committed truncate horizon (op 'T' / ``truncate_before``) is
        enforced here for every consumer: rows with ``ts <= horizon``
        are filtered out (NULL ts kept — no ordering evidence), and
        files whose zone map proves every row is at/under the horizon
        are dropped from the listing (sound pre-merge for the same
        lower-bound reason as ``scan_since``). Until a compaction
        physically reclaims the space, a truncated table reads as empty
        at the cost of a metadata commit — never an O(table) rewrite."""
        store = storage_schema(schema)
        trunc_us = int(man.get("truncate_ts_us") or 0)
        dirty = {int(b) for b, dd in man.get("deltas", {}).items() if dd}
        if buckets is not None:
            dirty &= set(buckets)
        clean_buckets = (
            [b for b in (buckets if buckets is not None else
                         [int(x) for x in man.get("buckets", {})]) if b not in dirty]
        )
        base_clean = self._bucket_paths(man, clean_buckets)
        if trunc_us:
            base_clean, _ = self._pruned_files(base_clean, trunc_us + 1, keep_null_ts=True)
        parts: list[DataFrame] = []
        if base_clean:
            parts.append(self.spark.read.schema(store).parquet(*base_clean))
        if dirty:
            dl = sorted(dirty)
            dirty_src = self._bucket_paths(man, dl) + self._delta_paths(man, dl)
            if trunc_us:
                dirty_src, _ = self._pruned_files(dirty_src, trunc_us + 1, keep_null_ts=True)
            if dirty_src:
                allrows = (
                    self.spark.read.schema(store)
                    .parquet(*dirty_src)
                    .withColumn("__file", F.xxhash64(F.input_file_name()))
                )
                parts.append(lww_reduce_hash(allrows, order=("ts", META_SEQ, "__file")).drop("__file"))
        if not parts:
            return self.spark.createDataFrame([], store)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        if trunc_us:
            out = out.filter(
                F.col("ts").isNull() | (F.col("ts") > F.timestamp_micros(F.lit(trunc_us)))
            )
        return out

    def read_table(
        self, version: int | None = None, columns: list[str] | None = None
    ) -> DataFrame:
        """Committed snapshot: live rows, payload columns only.
        ``version`` reads an older snapshot (time travel) — readers are
        isolated because data files are immutable and manifests are
        only ever added.

        ``columns`` pushes COLUMN PROJECTION through the merge-on-read
        path: the parquet scans read only keys + LWW-order columns +
        the requested payload (explicit pruned schema — `ReadSchema`
        in the plan, not a post-merge select). On a transcript table
        the `text` column IS most of the bytes, so a
        `read_table(columns=["conv_id", "role"])` over dirty MOR
        buckets skips the dominant IO *and* shrinks the reduce's
        winner-join payload — the same reason the merge itself
        aggregates a slim projection. Order of the returned columns
        follows the request."""
        man = self.load_manifest(version)
        if man is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        if version is None:  # time-travel reads must not adopt an old layout
            self._sync_layout(man)
        schema = T.StructType.fromJson(man["schema"])
        if columns is None:
            df = self._read_current(man, schema)
            return df.filter(~F.col(META_DELETED)).select(*[f.name for f in schema.fields])
        have = {f.name for f in schema.fields}
        unknown = [c for c in columns if c not in have]
        if unknown:
            raise ValueError(f"unknown columns {unknown}; table has {sorted(have)}")
        # the reduce still needs keys + order columns even if unrequested
        keep = set(columns) | set(KEY_COLUMNS) | {"ts"}
        pruned = T.StructType([f for f in schema.fields if f.name in keep])
        df = self._read_current(man, pruned)
        return df.filter(~F.col(META_DELETED)).select(*columns)

    def _pruned_files(
        self, dirs: list[str], since_us: int, keep_null_ts: bool = False
    ) -> tuple[list[str], int]:
        """(kept file paths, total files): drop files whose zone map
        proves every row is older than the horizon. Missing sidecar or
        statless file → kept (conservative fallback, never wrong).
        ``keep_null_ts`` also keeps a too-old file unless its stats
        prove it holds zero NULL-ts rows — required by consumers that
        retain NULL-ts rows (the truncate filter); a ``ts >= since``
        scan discards them anyway and can prune harder."""
        kept, total = [], 0
        for d in dirs:
            if not os.path.isdir(d):
                continue
            side: dict = {}
            sp = os.path.join(d, FILESTATS)
            if os.path.exists(sp):
                with open(sp) as f:
                    side = json.load(f)
            for fn in sorted(os.listdir(d)):
                if not fn.endswith(".parquet"):
                    continue
                total += 1
                st = side.get(fn)
                if (
                    st
                    and st.get("ts_max") is not None
                    and st["ts_max"] < since_us
                    and not (keep_null_ts and st.get("ts_nulls") != 0)
                ):
                    continue
                kept.append(os.path.join(d, fn))
        return kept, total

    def _key_pruned_files(
        self, dirs: list[str], key: str, probe_hashes: list[int] | None = None
    ) -> tuple[list[str], int]:
        """(kept file paths, total files): drop files whose key zone
        map proves ``conv_id = key`` cannot occur in them. Pre-merge
        key pruning is exact — a key's LWW winner can only come from a
        file that contains the key, so files that provably lack it
        contribute nothing to that key's reduce. Missing sidecar or
        statless file → kept (conservative fallback, never wrong).

        Two independent prunes, each sufficient to drop a file:
        - [key_min, key_max] range check — tight for sorted writes,
          blind for hash-fanned-out files (every sub-file spans the
          keyspace);
        - bloom membership (``probe_hashes``, raw xxhash64 values
          re-modded per-file against the recorded ``bloom_m``) — order-
          free, so it prunes exactly the fan-out/delta files the range
          check can't. A zero bit is a proof of absence; a set bit only
          admits the file (possibly falsely, at the sized FPR)."""
        import base64

        kept, total = [], 0
        for d in dirs:
            if not os.path.isdir(d):
                continue
            side: dict = {}
            sp = os.path.join(d, FILESTATS)
            if os.path.exists(sp):
                with open(sp) as f:
                    side = json.load(f)
            for fn in sorted(os.listdir(d)):
                if not fn.endswith(".parquet"):
                    continue
                total += 1
                st = side.get(fn)
                if (
                    st
                    and st.get("key_min") is not None
                    and st.get("key_max") is not None
                    and not (st["key_min"] <= key <= st["key_max"])
                ):
                    continue
                if probe_hashes and st and st.get("bloom") and st.get("bloom_m"):
                    bits = base64.b64decode(st["bloom"])
                    mm = int(st["bloom_m"])
                    k = min(int(st.get("bloom_k", KEY_BLOOM_K)), len(probe_hashes))
                    if any(
                        not (bits[(h % mm) >> 3] >> ((h % mm) & 7)) & 1
                        for h in probe_hashes[:k]
                    ):
                        continue
                kept.append(os.path.join(d, fn))
        return kept, total

    def zonemap_summary(self, version: int | None = None) -> dict:
        """Zone-map coverage of a snapshot, metadata-only (listing +
        sidecars, no data/footer reads): total data files, how many
        carry ts stats (the prunable fraction a `scan_since` can act
        on), and the table's overall ts span in epoch µs."""
        man = self.load_manifest(version)
        if man is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        files = with_stats = with_bloom = 0
        lo: int | None = None
        hi: int | None = None
        for d in self._bucket_paths(man) + self._delta_paths(man):
            if not os.path.isdir(d):
                continue
            side: dict = {}
            sp = os.path.join(d, FILESTATS)
            if os.path.exists(sp):
                with open(sp) as f:
                    side = json.load(f)
            for fn in os.listdir(d):
                if not fn.endswith(".parquet"):
                    continue
                files += 1
                st = side.get(fn)
                if st and st.get("ts_max") is not None:
                    with_stats += 1
                    lo = st["ts_min"] if lo is None else min(lo, st["ts_min"])
                    hi = st["ts_max"] if hi is None else max(hi, st["ts_max"])
                if st and st.get("bloom"):
                    with_bloom += 1
        return {"files": files, "with_stats": with_stats, "with_bloom": with_bloom,
                "ts_min_us": lo, "ts_max_us": hi}

    def scan_since(
        self, since, version: int | None = None, columns: list[str] | None = None
    ) -> DataFrame:
        """Time-horizon scan: live rows with ``ts >= since``, reading
        only files whose zone map says they CAN hold such rows (the
        "recent slice" read every incremental analytics / freshness job
        issues). ``columns`` prunes the scan's ReadSchema the same way
        ``read_table(columns=...)`` does — zone maps drop whole files,
        the projection drops the text bytes of the files that remain.

        Soundness — why PRE-merge file pruning is legal here, and only
        for a lower ts bound: winners are chosen by the LWW order
        (ts, seq, file), so everything a winner shadows is no newer
        than it. Dropping a file with max(ts) < since removes only
        (a) losers, which never affect output, or (b) winners older
        than the horizon, whose keys are correctly absent anyway — and
        any replacement winner the drop surfaces is older still, so the
        residual row filter removes it. The mirror-image upper-bound
        prune (min(ts) > hi) is NOT sound — dropping a too-new winner
        would resurrect an older in-range row — so an upper bound must
        stay a post-merge ``.filter(...)`` on the returned frame.

        Why it pays at 100 TB: CDC arrivals are roughly time-ordered,
        so merge-on-read delta files are tight time slices and a
        compacted (or cow-carried-forward) base's max(ts) freezes at
        its write — a "since yesterday" scan drops cold buckets' bases
        and all old deltas from the LISTING alone. Stats were harvested
        once at write time from the parquet footers; query time touches
        no data file that the horizon excludes."""
        man = self.load_manifest(version)
        if man is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        if version is None:
            self._sync_layout(man)
        since_us = _epoch_micros(since)
        # a committed truncate horizon only tightens the scan: ts > tr
        # ⟺ ts >= tr+1µs (µs-precision storage), and this scan's
        # ts >= since filter discards NULL-ts rows regardless
        since_us = max(since_us, int(man.get("truncate_ts_us") or 0) + 1)
        schema = T.StructType.fromJson(man["schema"])
        out_cols = [f.name for f in schema.fields]
        if columns is not None:
            unknown = [c for c in columns if c not in set(out_cols)]
            if unknown:
                raise ValueError(f"unknown columns {unknown}; table has {sorted(out_cols)}")
            keep = set(columns) | set(KEY_COLUMNS) | {"ts"}
            schema = T.StructType([f for f in schema.fields if f.name in keep])
            out_cols = list(columns)
        store = storage_schema(schema)
        dirty = sorted(int(b) for b, dd in man.get("deltas", {}).items() if dd)
        clean = [int(b) for b in man.get("buckets", {}) if int(b) not in set(dirty)]
        parts: list[DataFrame] = []
        base_clean, _ = self._pruned_files(self._bucket_paths(man, clean), since_us)
        if base_clean:
            parts.append(self.spark.read.schema(store).parquet(*base_clean))
        if dirty:
            files, _ = self._pruned_files(
                self._bucket_paths(man, dirty) + self._delta_paths(man, dirty), since_us
            )
            if files:
                allrows = (
                    self.spark.read.schema(store).parquet(*files)
                    .withColumn("__file", F.xxhash64(F.input_file_name()))
                )
                parts.append(
                    lww_reduce_hash(allrows, order=("ts", META_SEQ, "__file")).drop("__file")
                )
        if not parts:
            return self.spark.createDataFrame([], schema).select(*out_cols)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return (
            out.filter(~F.col(META_DELETED))
            .filter(F.col("ts") >= F.timestamp_micros(F.lit(since_us)))
            .select(*out_cols)
        )

    def changelog(
        self, from_version: int, to_version: int | None = None, pre_post: bool = False
    ) -> DataFrame:
        """Change-data-feed between two committed snapshots (Iceberg's
        incremental changelog scan / Delta CDF analog): one net row per
        inserted/deleted/updated key with ``_change_type``, computed as
        a key-bucketed full-outer diff of the two states. Both sides
        come off the same hash-bucket layout, so at cluster scale the
        diff join shuffles co-located data only. ``pre_post=True`` emits
        updates twice (update_preimage + update_postimage, Delta CDF
        shape) — what additive downstream consumers (incremental view
        maintenance) need to retract the old contribution."""
        from oec_etl_spark.operators.cdf import table_diff, table_diff_pre_post

        old = self.read_table(from_version)
        new = self.read_table(to_version)
        diff = table_diff_pre_post if pre_post else table_diff
        return diff(old, new, keys=KEY_COLUMNS)

    def lookup(self, conv_id: str, turn_idx: int | None = None) -> DataFrame:
        """Point query: live rows of ONE conversation, reading only its
        hash bucket — O(table/n_buckets) scan instead of O(table) — and,
        within that bucket, only the files whose key zone map admits the
        key. With sub-bucket fan-out or sorted writes that is typically
        ONE base file (plus any recent deltas), i.e. O(table /
        (n_buckets × files_per_bucket)). At cluster scale this is
        Iceberg bucket-transform partition pruning plus manifest
        column-stats file skipping. The operational "fetch this
        transcript" path."""
        man = self.load_manifest()
        if man is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        self._sync_layout(man)
        # same hash the writer used (operators/bucketing.with_bucket),
        # plus the bloom probe hashes — one job covers both
        b, probes = self._key_probe_hashes(conv_id)
        schema = T.StructType.fromJson(man["schema"])
        store = storage_schema(schema)
        dirty = b in {int(x) for x, dd in man.get("deltas", {}).items() if dd}
        dirs = self._bucket_paths(man, [b])
        if dirty:
            dirs += self._delta_paths(man, [b])
        files, _total = self._key_pruned_files(dirs, conv_id, probes)
        self.last_lookup_files = (len(files), _total)  # observability + tests
        if not files:
            df = self.spark.createDataFrame([], store)
        elif dirty:
            allrows = (
                self.spark.read.schema(store).parquet(*files)
                .withColumn("__file", F.xxhash64(F.input_file_name()))
            )
            df = lww_reduce_hash(allrows, order=("ts", META_SEQ, "__file")).drop("__file")
        else:
            df = self.spark.read.schema(store).parquet(*files)
        df = df.filter(F.col("conv_id") == conv_id)
        if turn_idx is not None:
            df = df.filter(F.col("turn_idx") == turn_idx)
        tr = int(man.get("truncate_ts_us") or 0)
        if tr:
            df = df.filter(
                F.col("ts").isNull() | (F.col("ts") > F.timestamp_micros(F.lit(tr)))
            )
        return df.filter(~F.col(META_DELETED)).select(*[f.name for f in schema.fields])

    def lookup_many(self, conv_ids: list[str]) -> DataFrame:
        """Batched point query — "fetch THESE conversations" (serving a
        training batch by id, a support tool loading a case's threads).
        Same pruning as ``lookup`` but amortized: ONE tiny JVM job
        computes every key's bucket id + bloom probe hashes, files are
        admitted per key and unioned per bucket (sound: each key's
        containing files are all admitted, extra rows die in the isin
        filter BEFORE the reduce), and each touched bucket is read
        once. Degrades gracefully: a key list spanning every bucket
        approaches a filtered full-table read — at that point use
        ``read_table().join(keys)`` instead, and the docstring is the
        API contract saying so."""
        if not conv_ids:
            man = self.load_manifest()
            if man is None:
                raise FileNotFoundError(f"no committed snapshot under {self.root}")
            return self.spark.createDataFrame(
                [], T.StructType.fromJson(man["schema"])
            )
        man = self.load_manifest()
        if man is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        self._sync_layout(man)
        probe_rows = (
            self.spark.createDataFrame([(k,) for k in conv_ids], "conv_id string")
            .select(
                "conv_id",
                F.pmod(F.xxhash64(F.col("conv_id")), F.lit(self.n_buckets))
                .cast("int").alias("__b"),
                *[
                    F.xxhash64(F.col("conv_id"), F.lit(i)).alias(f"h{i}")
                    for i in range(KEY_BLOOM_K)
                ],
            )
            .collect()
        )
        by_bucket: dict[int, list] = {}
        for r in probe_rows:
            by_bucket.setdefault(r["__b"], []).append(r)
        schema = T.StructType.fromJson(man["schema"])
        store = storage_schema(schema)
        dirty_set = {int(x) for x, dd in man.get("deltas", {}).items() if dd}
        kept_total = files_total = 0
        parts: list[DataFrame] = []
        for b, entries in sorted(by_bucket.items()):
            dirty = b in dirty_set
            dirs = self._bucket_paths(man, [b])
            if dirty:
                dirs += self._delta_paths(man, [b])
            files: set[str] = set()
            for r in entries:
                f, tot = self._key_pruned_files(
                    dirs, r["conv_id"], [r[f"h{i}"] for i in range(KEY_BLOOM_K)]
                )
                files.update(f)
            kept_total += len(files)
            files_total += tot  # same denominator for every key in the bucket
            if not files:
                continue
            keys_here = [r["conv_id"] for r in entries]
            df = (
                self.spark.read.schema(store).parquet(*sorted(files))
                .filter(F.col("conv_id").isin(keys_here))
            )
            if dirty:
                df = df.withColumn("__file", F.xxhash64(F.input_file_name()))
                df = lww_reduce_hash(df, order=("ts", META_SEQ, "__file")).drop("__file")
            parts.append(df)
        self.last_lookup_files = (kept_total, files_total)
        if not parts:
            return self.spark.createDataFrame([], schema)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        tr = int(man.get("truncate_ts_us") or 0)
        if tr:
            out = out.filter(
                F.col("ts").isNull() | (F.col("ts") > F.timestamp_micros(F.lit(tr)))
            )
        return out.filter(~F.col(META_DELETED)).select(*[f.name for f in schema.fields])

    def _read_stored_as_changes(self, man: dict, schema: T.StructType, buckets: list[int]) -> DataFrame:
        """Affected buckets' current rows, lifted back into change shape
        so the merge is one LWW reduce over (old ∪ new)."""
        df = self._read_current(man, schema, buckets)
        return (
            with_bucket(df, self.n_buckets)
            .withColumn("seq", F.col(META_SEQ))
            .withColumn("op", F.when(F.col(META_DELETED), F.lit("D")).otherwise(F.lit("U")))
            .withColumn(_FROM_BATCH, F.lit(False))
            .withColumn(_TIE, F.lit(1))  # on full (ts,seq) tie the stored row wins → dup not re-applied
            .drop(META_SEQ, META_DELETED)
        )

    # ------------------------------------------------------------ merge
    def merge(self, changes: DataFrame, batch_id: int, quarantined: int = 0) -> BatchLineage:
        """Apply one micro-batch of CDC events. Single writer assumed
        (one streaming query), as with any streaming sink."""
        t0 = time.time()
        man = self.load_manifest() or {
            "version": 0,
            "schema": None,
            "n_buckets": self.n_buckets,
            "committed_batches": [],
            "buckets": {},
            "watermarks": {},
            "lineage": [],
        }
        self._sync_layout(man)
        rec = BatchLineage(batch_id=batch_id, rows_quarantined=quarantined, table_mode=self.table_mode)
        if batch_id in man["committed_batches"]:
            rec.skipped_as_committed = True
            return rec

        # -- schema reconciliation (target-side evolution) --------------
        inc = payload_schema(changes, exclude=_ENVELOPE)
        target = T.StructType.fromJson(man["schema"]) if man["schema"] else inc
        evolved = evolve_schema(target, inc)
        payload_cols = [f.name for f in evolved.fields]
        c = conform(changes, evolved, keep=("seq", "op", "source_file", "offset"))
        has_rowid_cols = "source_file" in c.columns and "offset" in c.columns
        if "source_file" not in c.columns:  # optional lineage columns
            c = c.withColumn("source_file", F.lit(None).cast("string"))
        if "offset" not in c.columns:
            c = c.withColumn("offset", F.lit(None).cast("long"))

        cb = with_bucket(c, self.n_buckets)

        # -- job A: payload-free batch statistics -------------------------
        # One key-level partial aggregate (no text column → tiny) yields
        # per-bucket row/key counts + seq range (the affected-bucket set
        # and watermarks) AND the hot-key frequency sketch (north rule:
        # explicit salting for hot conversations) — replacing what used
        # to be three separate full-payload passes over the batch.
        bc = cb.groupBy(META_BUCKET, *KEY_COLUMNS).agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("seq").alias("lo"),
            F.max("seq").alias("hi"),
            # rows whose lineage columns can't serve as a row-unique
            # tiebreak (see strategy fallback below)
            F.max((F.col("source_file").isNull() | F.col("offset").isNull()).cast("int")).alias("norid"),
            F.sum((F.col("op") == "P").cast("long")).alias("np"),
            F.sum((F.col("op") == "R").cast("long")).alias("nr"),
            F.sum((F.col("op") == "T").cast("long")).alias("nt"),
            F.max(F.when(F.col("op") == "T", F.col("ts"))).alias("thi"),
        ).cache()
        per_bucket = bc.groupBy(META_BUCKET).agg(
            F.sum("cnt").alias("rows"),
            F.count(F.lit(1)).alias("keys"),
            F.min("lo").alias("lo"),
            F.max("hi").alias("wm"),
            F.max("norid").alias("norid"),
            F.sum("np").alias("np"),
            F.sum("nr").alias("nr"),
            F.sum("nt").alias("nt"),
            F.max("thi").alias("thi"),
        ).collect()
        rec.rows_in_batch = int(sum(r["rows"] for r in per_bucket))
        rec.distinct_keys = int(sum(r["keys"] for r in per_bucket))
        rec.seq_min = int(min(r["lo"] for r in per_bucket)) if per_bucket else None
        rec.seq_max = int(max(r["wm"] for r in per_bucket)) if per_bucket else None
        affected = sorted(int(r[META_BUCKET]) for r in per_bucket)
        rec.affected_buckets = affected

        # -- table truncate horizon (op 'T', O(1) metadata) --------------
        # The horizon is the max over this batch's truncate events and
        # whatever the manifest already holds; rows (batch OR stored)
        # with ts <= horizon are dead. Stored data is never rewritten
        # here — the read path filters (and zone-map-prunes) against the
        # manifest value, and the next compaction reclaims the space.
        # Setting it on `man` NOW means every stored read below is
        # already horizon-filtered. Late arrivals predating the horizon
        # are dropped at the batch filter, however late they come.
        rec.rows_truncate_events = int(sum(r["nt"] for r in per_bucket))
        rec.rows_snapshot = int(sum(r["nr"] for r in per_bucket))
        batch_thi = [r["thi"] for r in per_bucket if r["thi"] is not None]
        trunc_us = int(man.get("truncate_ts_us") or 0)
        if batch_thi:
            trunc_us = max(trunc_us, _epoch_micros(max(batch_thi)))
        if trunc_us:
            man["truncate_ts_us"] = trunc_us
            rec.truncate_ts_us = trunc_us

        if self.profile and affected:
            prof_cols = [c_ for c_ in payload_cols if c_ not in KEY_COLUMNS]
            prof = (
                cb.filter(~F.col("op").isin("D", "T"))  # tombstone/truncate payload is NULL by design
                .agg(*[F.sum(F.col(c_).isNull().cast("long")).alias(c_) for c_ in prof_cols])
                .first()
            )
            rec.column_nulls = {k: int(v or 0) for k, v in prof.asDict().items()}

        salt, hot_ids = None, None
        if self.hot_key_threshold is not None and rec.rows_in_batch:
            thr = self.hot_key_threshold * rec.rows_in_batch
            hot = (
                # NULL conv_id (op='T' truncate rows) must never reach
                # hot_ids: a NULL inside isin() makes BOTH branches of
                # the skew split evaluate NULL and silently drop rows
                bc.filter(F.col("conv_id").isNotNull())
                .groupBy("conv_id").agg(F.sum("cnt").alias("cnt"))
                .filter(F.col("cnt") > thr)
                .select("conv_id", "cnt", F.round(F.col("cnt") / F.lit(rec.rows_in_batch), 6).alias("frac"))
                .collect()
            )
            if hot:
                salt, hot_ids = self.hot_key_salt, [r["conv_id"] for r in hot]
                rec.salted = True
                rec.hot_keys = [r.asDict() for r in hot]
        bc.unpersist()

        if not affected:  # empty batch: still commit the epoch guard
            man["version"] += 1
            man["committed_batches"].append(batch_id)
            if man["schema"] is None:
                man["schema"] = evolved.jsonValue()
            rec.wall_sec = time.time() - t0
            man["lineage"].append(rec.to_dict())
            self._commit(man)
            return rec

        # -- job B: single-pass merge (batch ∪ stored) → LWW → write -----
        # The LWW reduce is associative, so reducing the raw batch
        # together with the stored rows in ONE aggregate is equivalent
        # to batch-winners-then-merge — and saves a full payload shuffle
        # plus a multi-GB .cache() of the winners.
        # source-file lineage: a single dictionary-encoded column scan
        # (an Observation can't sit here — the hash-path reduce consumes
        # the batch twice, and Spark forbids re-executing observe nodes)
        rec.source_files = sorted(
            r[0] for r in cb.select("source_file").distinct().collect() if r[0] is not None
        )
        batch_side = (
            cb.withColumn(_FROM_BATCH, F.lit(True))
            .withColumn(_TIE, F.lit(0))
            # Row-unique fixed-width tiebreaks: redeliveries of the same
            # event differ in (segment file, offset), so the hash-path
            # reduce's winner join matches exactly one physical row.
            .withColumn(_UF, F.xxhash64(F.coalesce(F.col("source_file"), F.lit(""))))
            .withColumn(_UO, F.coalesce(F.col("offset"), F.lit(0)))
        )
        cols = [*KEY_COLUMNS, *[c_ for c_ in payload_cols if c_ not in KEY_COLUMNS], "op", "seq", _FROM_BATCH, _TIE, _UF, _UO, META_BUCKET]
        # Rows dead under the truncate horizon never enter the merge —
        # that kills the batch's own pre-horizon rows AND any straggler
        # arriving after the truncate committed. NULL-ts rows are kept
        # (no ordering evidence — same stance as tombstone expiry).
        if trunc_us:
            batch_side = batch_side.filter(
                F.col("ts").isNull()
                | (F.col("ts") > F.timestamp_micros(F.lit(trunc_us)))
            )
        # Partial updates (op 'P') are resolved in a SEPARATE per-column
        # combine over the patched keys only (below); the main full-row
        # reduce must never see them — a patch is not a full image.
        # Snapshot reads (op 'R') likewise get their own rank-aware
        # combine (a snapshot read must never outrank streamed data),
        # and truncate events (op 'T') are pure metadata.
        has_patches = any(r["np"] for r in per_bucket)
        rec.rows_patch = int(sum(r["np"] for r in per_bucket))
        has_snapshot = any(r["nr"] for r in per_bucket)
        special = [op_ for op_, f_ in (("P", has_patches), ("R", has_snapshot),
                                       ("T", rec.rows_truncate_events)) if f_]
        batch_full = batch_side.filter(~F.col("op").isin(special)) if special else batch_side
        specials_only = (
            rec.rows_patch + rec.rows_snapshot + rec.rows_truncate_events
        ) == rec.rows_in_batch
        if self.table_mode == "mor":
            # Merge-on-read: reduce the batch alone and append its
            # winners as a DELTA — never reads or rewrites stored data,
            # so per-batch cost is O(batch) instead of O(touched
            # buckets). Conflict resolution is deferred to read time /
            # compaction (_read_current). The update-heavy micro-batch
            # regime at 10^10 events runs this mode + periodic compact().
            union = batch_full.select(*cols)
        else:
            old = (
                self._read_stored_as_changes(man, evolved, affected)
                .withColumn(_UF, F.lit(0).cast("long"))
                .withColumn(_UO, F.lit(0).cast("long"))
            )
            union = batch_full.select(*cols).unionByName(old.select(*cols))
        # The hash strategy's winner semi-join needs a row-unique order
        # tuple: redeliveries of one event must differ in (source_file,
        # offset), else BOTH physical copies match the winner and the
        # snapshot gets duplicate key rows. When the batch lacks those
        # lineage columns (or any row has them null), fall back to the
        # sort strategy — max_by collapses identical copies to one row
        # regardless.
        strategy = self.merge_strategy
        if strategy == "hash" and (not has_rowid_cols or any(r["norid"] for r in per_bucket)):
            strategy = "sort"
        rec.merge_strategy = strategy
        if strategy == "hash":
            merged = lww_reduce_hash(
                union, order=("ts", "seq", _TIE, _UF, _UO), salt=salt, hot_ids=hot_ids
            )
        else:
            merged = lww_reduce(union, order=("ts", "seq", _TIE), salt=salt, hot_ids=hot_ids)
        out_cols = [*KEY_COLUMNS, *[c_ for c_ in payload_cols if c_ not in KEY_COLUMNS],
                    "op", "seq", _FROM_BATCH, META_BUCKET]
        merged = merged.select(*out_cols)

        r_live = None
        if has_snapshot:
            # -- snapshot-read bootstrap (op 'R') ------------------------
            # Debezium initial/incremental-snapshot rule: a read fills a
            # gap, it never races streamed data. Implemented as an LWW
            # reduce whose order LEADS with a rank bit (stream/stored=1,
            # snapshot=0) over (R rows ∪ the R keys' batch full rows ∪
            # the R keys' stored rows): an R key survives only when
            # nothing else defines it, however its ts compares. The
            # stored fetch is O(R-keyed buckets) semi-joined to the R
            # keys — the one read a bootstrap pays in mor mode; on the
            # canonical empty-table initial load it reads nothing.
            rrows = batch_side.filter(F.col("op") == "R")
            rkeys = rrows.select(*KEY_COLUMNS).distinct()
            r_buckets = sorted(int(r[META_BUCKET]) for r in per_bucket if r["nr"])
            stored_r = (
                self._read_stored_as_changes(man, evolved, r_buckets)
                .withColumn(_UF, F.lit(0).cast("long"))
                .withColumn(_UO, F.lit(0).cast("long"))
                .select(*cols)
                .join(rkeys, on=list(KEY_COLUMNS), how="left_semi")
            )
            runion = (
                rrows.select(*cols).withColumn(_RANK, F.lit(0))
                .unionByName(
                    batch_full.select(*cols)
                    .join(rkeys, on=list(KEY_COLUMNS), how="left_semi")
                    .withColumn(_RANK, F.lit(1))
                )
                .unionByName(stored_r.withColumn(_RANK, F.lit(1)))
            )
            rwin = lww_reduce(runion, order=(_RANK, "ts", "seq", _TIE, _UF, _UO))
            r_live = rwin.filter(F.col("op") == "R").select(*out_cols)
            if has_patches or specials_only:
                # consumed more than once below (merged union + patch
                # combine and/or the metadata-only emptiness probe): pin
                # the result so the stored read and rank reduce run once
                r_live = r_live.localCheckpoint()
            merged = merged.unionByName(r_live)

        if has_patches:
            # -- column-level partial updates (op 'P') -------------------
            # Per-column LWW over (patches ∪ the patched keys' full rows):
            # a patch sets only its non-null columns; full rows define
            # everything; existence comes from full rows only. The combine
            # is O(patched keys): stored rows are fetched for the PATCHED
            # buckets only and semi-joined down to the patched keys — in
            # mor mode this is the one read patches pay, since an
            # unresolved patch must never be appended as if it were a
            # full delta image. localCheckpoint materializes the (small)
            # result once so the stats pass and the write don't recompute.
            patches = batch_side.filter(F.col("op") == "P").select(*cols)
            pkeys = patches.select(*KEY_COLUMNS).distinct()
            patched_buckets = sorted(int(r[META_BUCKET]) for r in per_bucket if r["np"])
            stored_p = (
                self._read_stored_as_changes(man, evolved, patched_buckets)
                .withColumn(_UF, F.lit(0).cast("long"))
                .withColumn(_UO, F.lit(0).cast("long"))
                .select(*cols)
                .join(pkeys, on=list(KEY_COLUMNS), how="left_semi")
            )
            cin = patches.unionByName(
                batch_full.select(*cols).join(pkeys, on=list(KEY_COLUMNS), how="left_semi")
            ).unionByName(stored_p).withColumn(_RANK, F.lit(1))
            if r_live is not None:
                # R-bootstrapped keys ARE defined rows for their patches
                # (rank 0: any streamed patch beats the snapshot image,
                # however its ts compares)
                cin = cin.unionByName(
                    r_live.join(pkeys, on=list(KEY_COLUMNS), how="left_semi")
                    .withColumn(_TIE, F.lit(0))
                    .withColumn(_UF, F.lit(0).cast("long"))
                    .withColumn(_UO, F.lit(0).cast("long"))
                    .select(*cols)
                    .withColumn(_RANK, F.lit(0))
                )
            combined = lww_patch_combine(
                cin,
                payload_cols=payload_cols,
                order=(_RANK, "ts", "seq", _TIE, _UF, _UO),
                max_cols=(_FROM_BATCH, META_BUCKET),
            ).localCheckpoint()
            pstat = combined.agg(
                F.sum(
                    F.when(F.col("op").isNull() | (F.col("op") == "D"), F.col("__n_patch"))
                ).alias("dropped")
            ).first()
            rec.rows_patch_dropped = int(pstat["dropped"] or 0)
            live = combined.filter(F.col("op").isNotNull()).select(*out_cols)

        if specials_only and (not has_patches or live.isEmpty()) and (
            r_live is None or r_live.isEmpty()
        ):
            # Nothing in this batch can change stored data — it was all
            # orphan/dead patches, snapshot reads of already-present
            # keys, and/or truncate events (pure metadata). Commit
            # metadata only (epoch guard + watermarks + truncate
            # horizon) — no write. Also sidesteps writing an empty
            # plan, whose observe node the optimizer prunes.
            man["version"] += 1
            man["committed_batches"].append(batch_id)
            if man["schema"] is None:
                man["schema"] = evolved.jsonValue()
            for r in per_bucket:
                b = str(int(r[META_BUCKET]))
                man["watermarks"][b] = max(int(man["watermarks"].get(b, 0)), int(r["wm"]))
            rec.watermarks = {str(int(r[META_BUCKET])): int(man["watermarks"][str(int(r[META_BUCKET]))]) for r in per_bucket}
            rec.wall_sec = time.time() - t0
            man["lineage"].append(rec.to_dict())
            self._commit(man)
            return rec
        if has_patches:
            merged = merged.join(pkeys, on=list(KEY_COLUMNS), how="left_anti").unionByName(live)

        obs2 = Observation()
        merged = merged.observe(
            obs2,
            F.count(F.lit(1)).alias("rows_current"),
            F.sum(F.col(_FROM_BATCH).cast("long")).alias("applied"),
            F.sum((F.col("op") == "D").cast("long")).alias("tombstones"),
            F.sum((F.col("op") == "R").cast("long")).alias("snap_applied"),
        )
        store = merged.select(
            *payload_cols,
            F.col("seq").alias(META_SEQ),
            (F.col("op") == "D").alias(META_DELETED),
            F.col(META_BUCKET),
        )
        new_version = man["version"] + 1
        self._precheck_version(new_version)  # before touching data/{v,d}{new_version}
        vdir = f"data/{'d' if self.table_mode == 'mor' else 'v'}{new_version:06d}"
        # Align the write shuffle with the bucket layout: without this,
        # every one of the N shuffle-partition tasks opens a file in
        # every touched bucket dir (N × buckets small files — measured
        # anti-scaling at local[32]); with it, each task writes exactly
        # its own bucket's file(s). This is what Iceberg's
        # write.distribution-mode=hash does for MERGE.
        self._write_store(store, vdir)

        mstats = obs2.get
        rec.rows_applied = int(mstats["applied"] or 0)
        rec.rows_stale = rec.distinct_keys - rec.rows_applied
        rec.rows_deleted = int(mstats["tombstones"] or 0)
        rec.rows_snapshot_applied = int(mstats["snap_applied"] or 0)

        # -- commit: manifest version bump + atomic pointer swap ---------
        man["version"] = new_version
        man["schema"] = evolved.jsonValue()
        man["committed_batches"].append(batch_id)
        man.setdefault("deltas", {})
        for b in affected:
            # A bucket every one of whose batch rows was dropped (orphan
            # patches on a bucket with nothing stored) produces NO output
            # dir — pointing the manifest at it would break readers, so
            # keep the previous pointer (or none) in that case.
            if not os.path.isdir(os.path.join(self.root, vdir, f"{META_BUCKET}={b}")):
                continue
            if self.table_mode == "mor":
                man["deltas"].setdefault(str(b), []).append(vdir)
            else:
                man["buckets"][str(b)] = vdir
        for r in per_bucket:
            b = str(int(r[META_BUCKET]))
            man["watermarks"][b] = max(int(man["watermarks"].get(b, 0)), int(r["wm"]))
        rec.watermarks = {str(b): int(man["watermarks"][str(b)]) for b in affected}
        rec.wall_sec = time.time() - t0
        man["lineage"].append(rec.to_dict())
        self._commit(man)
        return rec


def iceberg_create_table_sql(
    table: str,
    schema: T.StructType,
    n_buckets: int = 16,
    keys: tuple[str, ...] = KEY_COLUMNS,
) -> str:
    """CREATE TABLE statement for the Iceberg target: payload columns +
    the sink's meta columns, bucketed on the leading key (the Iceberg
    form of the snapshot sink's hash-bucket layout) with hash write
    distribution so a MERGE's write shuffle aligns with the buckets."""
    cols = ",\n      ".join(f"{f.name} {f.dataType.simpleString().upper()}" for f in schema.fields)
    return (
        f"CREATE TABLE IF NOT EXISTS {table} (\n"
        f"      {cols},\n"
        f"      {META_SEQ} BIGINT,\n"
        f"      {META_DELETED} BOOLEAN)\n"
        f"    USING iceberg\n"
        f"    PARTITIONED BY (bucket({n_buckets}, {keys[0]}))\n"
        f"    TBLPROPERTIES ('write.distribution-mode'='hash',\n"
        f"                   'format-version'='2')"
    )


def iceberg_evolve_sql(
    table: str,
    current: T.StructType,
    evolved: T.StructType,
) -> list[str]:
    """DDL bringing an Iceberg target from ``current`` to ``evolved``
    (the output of ``reconcile.evolve_schema``): one ``ADD COLUMNS``
    for appended fields + one ``ALTER COLUMN .. TYPE`` per widened
    field. Iceberg resolves columns by field-id, so both operations are
    metadata-only — no data rewrite at any scale."""
    cur = {f.name: f.dataType for f in current.fields}
    stmts: list[str] = []
    added = [f for f in evolved.fields if f.name not in cur]
    if added:
        cols = ", ".join(f"{f.name} {f.dataType.simpleString().upper()}" for f in added)
        stmts.append(f"ALTER TABLE {table} ADD COLUMNS ({cols})")
    for f in evolved.fields:
        if f.name in cur and cur[f.name] != f.dataType:
            stmts.append(
                f"ALTER TABLE {table} ALTER COLUMN {f.name} TYPE {f.dataType.simpleString().upper()}"
            )
    return stmts


def iceberg_merge_sql(
    table: str,
    source_view: str = "_cdc_winners",
    keys: tuple[str, ...] = KEY_COLUMNS,
) -> str:
    """MERGE INTO statement applying LWW batch winners: a matched row is
    touched only when the source wins the (ts, seq) order (stored row
    wins ties → idempotent re-delivery), a winning delete removes the
    row, and unmatched non-deletes insert."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    guard = f"struct(s.ts, s.seq) >= struct(t.ts, t.{META_SEQ})"
    return (
        f"MERGE INTO {table} t USING {source_view} s\n"
        f"    ON {on}\n"
        f"    WHEN MATCHED AND s.op = 'D' AND {guard} THEN DELETE\n"
        f"    WHEN MATCHED AND {guard} THEN UPDATE SET *\n"
        f"    WHEN NOT MATCHED AND s.op != 'D' THEN INSERT *"
    )


def iceberg_patch_merge_sql(
    table: str,
    source_view: str = "_cdc_patches",
    keys: tuple[str, ...] = KEY_COLUMNS,
    payload: tuple[str, ...] = ("role", "text", "tool"),
) -> str:
    """Second-pass MERGE applying column-level partial updates (op 'P')
    after the full-row MERGE of the same batch.

    The source view carries ONE pre-combined patch image per key (the
    Spark-side ``lww_patch_combine`` over the batch's patches alone):
    for every payload column ``c`` both the value ``c`` and its
    defining order ``c_ord: struct<ts, seq>`` (NULL when no patch in
    the batch set ``c``), plus row-level ``ts``/``seq`` = the newest
    patch. Each column updates only when ITS definer beats the stored
    row's (ts, __seq) — per-column LWW, so a column whose patch is
    older than the row keeps the stored value even when another column
    of the same key patches successfully. No NOT MATCHED clause:
    orphan patches never insert, and a patch racing a same-batch
    delete finds no row (pass one already removed it) — exactly the
    snapshot sink's drop semantics."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    row_guard = f"struct(s.ts, s.seq) >= struct(t.ts, t.{META_SEQ})"
    sets = [
        f"t.{c} = CASE WHEN s.{c}_ord IS NOT NULL AND "
        f"s.{c}_ord >= struct(t.ts, t.{META_SEQ}) THEN s.{c} ELSE t.{c} END"
        for c in payload
    ]
    sets.append(f"t.ts = CASE WHEN {row_guard} THEN s.ts ELSE t.ts END")
    sets.append(f"t.{META_SEQ} = CASE WHEN {row_guard} THEN s.seq ELSE t.{META_SEQ} END")
    set_sql = ",\n        ".join(sets)
    return (
        f"MERGE INTO {table} t USING {source_view} s\n"
        f"    ON {on}\n"
        f"    WHEN MATCHED THEN UPDATE SET\n"
        f"        {set_sql}"
    )


def iceberg_snapshot_merge_sql(
    table: str,
    source_view: str = "_cdc_snapshot",
    keys: tuple[str, ...] = KEY_COLUMNS,
    payload: tuple[str, ...] = ("role", "text", "tool"),
) -> str:
    """MERGE applying op='R' snapshot-read bootstrap rows (Debezium
    initial/incremental snapshot): insert-if-absent ONLY. There is
    deliberately no WHEN MATCHED clause — a snapshot read fills gaps
    and never overwrites streamed or previously-snapshotted data,
    whatever its ts says — the SQL twin of the snapshot sink's rank-0
    LWW position for R rows."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    cols = [*keys, *payload, "ts", META_SEQ]
    vals = [*(f"s.{k}" for k in keys), *(f"s.{c}" for c in payload), "s.ts", "s.seq"]
    return (
        f"MERGE INTO {table} t USING {source_view} s\n"
        f"    ON {on}\n"
        f"    WHEN NOT MATCHED THEN INSERT ({', '.join(cols)})\n"
        f"    VALUES ({', '.join(vals)})"
    )


def iceberg_truncate_sql(table: str, horizon_us: int) -> str:
    """The op='T' table truncate as Iceberg SQL: a predicate DELETE on
    the event-time horizon (Iceberg turns it into metadata deletes for
    files wholly under the horizon — the same zone-map reasoning the
    snapshot sink applies). NULL-ts rows are retained, matching the
    engine (no ordering evidence to truncate on)."""
    import datetime as _dt

    iso = (
        _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
        + _dt.timedelta(microseconds=int(horizon_us))
    ).strftime("%Y-%m-%d %H:%M:%S.%f")
    return (
        f"DELETE FROM {table}\n"
        f"    WHERE ts IS NOT NULL AND ts <= TIMESTAMP '{iso}+00:00'"
    )


class IcebergMergeSink:
    """The same merge expressed as Iceberg SQL (requires
    `org.apache.iceberg:iceberg-spark-runtime` + SQL extensions on the
    session — not available in this sandbox, so this class is a thin,
    honest wrapper that raises clearly when the catalog is absent; the
    statements themselves come from the pure builders above, which ARE
    unit-tested without a runtime).

    Flow per batch: stage LWW batch-winners as a temp view, then run
    ``iceberg_merge_sql`` against a table created by
    ``iceberg_create_table_sql``; batch-id guards are kept in the
    table's snapshot summary.
    """

    def __init__(self, spark: SparkSession, table: str, n_buckets: int = 16):
        self.spark, self.table, self.n_buckets = spark, table, n_buckets
        try:
            spark.sql("SELECT 1").collect()
            has_ext = "IcebergSparkSessionExtensions" in spark.conf.get("spark.sql.extensions", "")
        except Exception:  # pragma: no cover
            has_ext = False
        if not has_ext:
            raise RuntimeError(
                "Iceberg runtime not on the classpath; use ParquetSnapshotSink "
                "(identical MERGE semantics) or submit with --packages "
                "org.apache.iceberg:iceberg-spark-runtime-4.1_2.13"
            )

    def merge(self, changes: DataFrame, batch_id: int, quarantined: int = 0) -> BatchLineage:
        # schema evolution first (metadata-only DDL), from the same
        # widening lattice the snapshot sink uses; the table itself is
        # created on first contact (CREATE IF NOT EXISTS is idempotent)
        inc = payload_schema(changes, exclude=_ENVELOPE)
        try:
            current = self.spark.table(self.table).schema
        except Exception:
            current = None
        if current is None:
            self.spark.sql(iceberg_create_table_sql(self.table, inc, self.n_buckets))
        else:
            cur_payload = T.StructType(
                [f for f in current.fields if f.name not in (META_SEQ, META_DELETED)]
            )
            evolved = evolve_schema(cur_payload, inc)
            for stmt in iceberg_evolve_sql(self.table, cur_payload, evolved):
                self.spark.sql(stmt)
        kw = lww_reduce(changes)
        # Stage the winners with the TARGET's meta columns materialized:
        # `UPDATE SET *` / `INSERT *` expand over target columns and
        # look each up in the source by name, so the view must carry
        # __seq/__deleted (extra source-only columns like op/seq that
        # the guards reference are fine — star expansion ignores them).
        # Columns the batch doesn't carry (pre-evolution segments) stage
        # as typed NULLs; casts also lift narrower batch types onto the
        # widened target column.
        cols = []
        for f in self.spark.table(self.table).schema.fields:
            if f.name in (META_SEQ, META_DELETED):
                continue
            src = F.col(f.name) if f.name in kw.columns else F.lit(None)
            cols.append(src.cast(f.dataType).alias(f.name))
        staged = kw.select(
            *cols,
            F.col("seq").alias(META_SEQ),
            (F.col("op") == F.lit("D")).alias(META_DELETED),
            "op", "seq",
        )
        staged.createOrReplaceTempView("_cdc_winners")
        self.spark.sql(iceberg_merge_sql(self.table))
        return BatchLineage(batch_id=batch_id, rows_quarantined=quarantined)
