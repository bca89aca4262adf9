"""Right-to-be-forgotten hard delete (`purge_keys`).

A tombstone merge only hides a key going forward — time travel and the
change feed still serve the old rows. GDPR/CCPA erasure requires the
rows to be physically gone from every retained snapshot, including MOR
delta files, tombstones (whose key column is the identifier), and the
hot-key ids captured in lineage. The rewrite is bucket-pruned: only
the purged keys' hash bucket of each data version is touched.
"""

from __future__ import annotations

import glob
import json
import os

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.generate import GeneratorConfig, generate_changelog
from oec_etl_spark.operators.lww import materialize
from oec_etl_spark.schemas import CHANGE_SCHEMA, META_DELETED
from oec_etl_spark.streaming.engine import quarantine_split, run_replay
from oec_etl_spark.streaming.sink import ParquetSnapshotSink

from pyspark.sql import functions as F, types as T


def _gen(tmp, **kw):
    return generate_changelog(GeneratorConfig(out_dir=str(tmp / "changes"), **kw))


def _oracle(spark, changes_dir):
    df = spark.read.schema(CHANGE_SCHEMA).parquet(f"{changes_dir}/*.parquet")
    valid, _ = quarantine_split(df)
    return materialize(valid)


def _rows(df):
    return sorted(map(tuple, df.select(*sorted(df.columns)).collect()))


def _cfg(tmp, **kw):
    return EngineConfig(
        changes_dir=str(tmp / "changes"),
        target_dir=str(tmp / "target"),
        checkpoint_dir=str(tmp / "ckpt"),
        n_buckets=8,
        **kw,
    )


def _physical_hits(spark, root: str, conv_id: str) -> int:
    """Rows for conv_id in ANY parquet file under the table root —
    the ground truth an auditor would check."""
    total = 0
    for d in sorted(glob.glob(os.path.join(root, "data", "*"))):  # v* bases AND d* deltas
        df = spark.read.parquet(d)
        total += df.filter(F.col("conv_id") == conv_id).count()
    return total


def test_purge_erases_key_from_every_version(spark, tmp_path):
    _gen(tmp_path, seed=70, n_conversations=40, n_segments=5, update_ratio=1.0)
    cfg = _cfg(tmp_path, max_files_per_trigger=1)
    run_replay(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    versions = [h["version"] for h in sink.history()]
    assert len(versions) >= 3
    victim = sink.read_table(version=versions[0]).select("conv_id").first()["conv_id"]
    want = {
        v: _rows(sink.read_table(version=v).filter(F.col("conv_id") != victim))
        for v in versions
    }
    out = sink.purge_keys([victim])
    assert out["rows_purged"] > 0 and out["dirs_rewritten"]
    assert _physical_hits(spark, cfg.target_dir, victim) == 0
    for v in versions:  # every snapshot: victim gone, everything else intact
        got = _rows(sink.read_table(version=v))
        assert got == want[v]
    # purge is idempotent
    again = sink.purge_keys([victim])
    assert again["rows_purged"] == 0 and not again["dirs_rewritten"]


def test_purge_covers_mor_deltas_and_tombstones(spark, tmp_path):
    """In a merge-on-read table the key lives in base files, delta
    files, AND tombstone rows — all must go; live data is untouched."""
    _gen(tmp_path, seed=71, n_conversations=40, n_segments=5, delete_ratio=0.3)
    cfg = _cfg(tmp_path, max_files_per_trigger=1, table_mode="mor")
    run_replay(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets, table_mode="mor")
    man = sink.load_manifest()
    assert any(dd for dd in man["deltas"].values())
    schema = T.StructType.fromJson(man["schema"])
    dead = sink._read_current(man, schema).filter(F.col(META_DELETED)) \
        .select("conv_id").first()["conv_id"]  # a tombstoned conversation
    live = sink.read_table().select("conv_id").first()["conv_id"]
    sink.purge_keys([dead, live])
    for cid in (dead, live):
        assert _physical_hits(spark, cfg.target_dir, cid) == 0
    want = _oracle(spark, cfg.changes_dir).filter(~F.col("conv_id").isin([dead, live]))
    assert _rows(sink.read_table()) == _rows(want)
    # the table keeps operating: compaction after an in-place purge
    assert sink.compact()
    assert _rows(sink.read_table()) == _rows(want)


def test_purge_honors_rebucket_layout_history(spark, tmp_path):
    """Old versions written under 8 buckets and new ones under 16 hash
    the same key to different bucket dirs — both layouts are purged."""
    _gen(tmp_path, seed=72, n_conversations=30, n_segments=3)
    cfg = _cfg(tmp_path, max_files_per_trigger=1)
    run_replay(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)
    victim = sink.read_table().select("conv_id").first()["conv_id"]
    sink.rebucket(16)
    extra = spark.createDataFrame(
        [(10 ** 6, "U", victim, 0, "user", "post-rebucket", None, None, "s", 0)],
        CHANGE_SCHEMA,
    )
    sink.merge(extra, batch_id=9999)
    assert _physical_hits(spark, cfg.target_dir, victim) > 0
    sink.purge_keys([victim])
    assert _physical_hits(spark, cfg.target_dir, victim) == 0
    for h in sink.history():  # every version still readable, victim-free
        df = sink.read_table(version=h["version"])
        assert df.filter(F.col("conv_id") == victim).count() == 0


def test_purge_scrubs_hot_key_lineage(spark, tmp_path):
    """Hot-key detection records conv_ids in manifest lineage and the
    JSONL feed; erasure must reach those too."""
    _gen(tmp_path, seed=73, n_conversations=20, n_segments=3,
         update_ratio=4.0, hot_frac=0.95, n_hot=1)
    cfg = _cfg(tmp_path, max_files_per_trigger=1)
    run_replay(spark, cfg)
    jpath = os.path.join(cfg.target_dir, "_lineage", "lineage.jsonl")
    hot_ids = {
        h["conv_id"]
        for line in open(jpath)
        for h in json.loads(line).get("hot_keys", [])
    }
    assert hot_ids  # the skewed generator tripped detection
    victim = sorted(hot_ids)[0]
    out = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets).purge_keys([victim])
    assert out["lineage_scrubbed"] > 0
    blob = open(jpath).read()
    for name in os.listdir(os.path.join(cfg.target_dir, "_manifests")):
        blob += open(os.path.join(cfg.target_dir, "_manifests", name)).read()
    assert victim not in blob


def test_purge_cli_and_ingest_continues(spark, tmp_path, monkeypatch, capsys):
    _gen(tmp_path, seed=74, n_conversations=20, n_segments=2)
    cfg = _cfg(tmp_path, max_files_per_trigger=1)
    run_replay(spark, cfg)
    from oec_etl_spark import cli, session

    monkeypatch.setattr(session, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, 8)
    victim = sink.read_table().select("conv_id").first()["conv_id"]
    assert cli.main(["purge", "--target", cfg.target_dir, "--buckets", "8",
                     "--key", victim]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["keys"] == [victim] and out["rows_purged"] > 0
    assert _physical_hits(spark, cfg.target_dir, victim) == 0
    # merges stack on the purged table; a NEW event may recreate the key
    extra = spark.createDataFrame(
        [(10 ** 6, "I", victim, 0, "user", "fresh start", None, None, "s", 0)],
        CHANGE_SCHEMA,
    )
    sink.merge(extra, batch_id=12345)
    assert sink.read_table().filter(F.col("conv_id") == victim).count() == 1
