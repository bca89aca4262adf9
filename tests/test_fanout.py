"""Sub-bucket write fan-out (files_per_bucket): the Iceberg
target-file-size analog that lifts the one-write-task-per-bucket
ceiling. At 10^10 rows a bucket's base is tens of GB; a single task
cannot sort/write it (nor can compaction rewrite it) — with
files_per_bucket=k each bucket's rows spread over ~k tasks and files
via a second, independent conv_id hash, while readers (which glob the
bucket dir) see no difference.

Key subtlety under test: the salt must NOT be pmod(xxhash64(conv_id),
k) — that expression is constant within a bucket whenever k divides
n_buckets (the bucket id is pmod(xxhash64(conv_id), n_buckets)), which
would silently disable the fan-out.
"""

from __future__ import annotations

import glob
import os

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.generate import GeneratorConfig, generate_changelog
from oec_etl_spark.operators.lww import materialize
from oec_etl_spark.schemas import CHANGE_SCHEMA
from oec_etl_spark.streaming.engine import quarantine_split, replay_batch
from oec_etl_spark.streaming.sink import ParquetSnapshotSink


def _gen(tmp, **kw):
    return generate_changelog(GeneratorConfig(out_dir=str(tmp / "changes"), **kw))


def _oracle(spark, changes_dir):
    valid, _ = quarantine_split(
        spark.read.schema(CHANGE_SCHEMA).parquet(f"{changes_dir}/*.parquet")
    )
    return materialize(valid)


def _assert_table_equal(a, b):
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a, b = a.select(*cols), b.select(*cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def _cfg(tmp, **kw):
    return EngineConfig(
        changes_dir=str(tmp / "changes"),
        target_dir=str(tmp / "target"),
        checkpoint_dir=str(tmp / "ckpt"),
        **kw,
    )


def _files_per_bucket_dir(target_dir: str) -> dict[str, int]:
    """{bucket dir: parquet file count} for the CURRENT version's data."""
    import json

    with open(os.path.join(target_dir, "CURRENT")) as f:
        v = json.load(f)["version"]
    with open(os.path.join(target_dir, "_manifests", f"manifest-{v:06d}.json")) as f:
        man = json.load(f)
    out = {}
    for vdir in sorted(set(man["buckets"].values())):
        for bdir in glob.glob(os.path.join(target_dir, vdir, "__bucket=*")):
            out[bdir] = len(glob.glob(os.path.join(bdir, "*.parquet")))
    return out


def test_fanout_spreads_buckets_over_files_and_matches_oracle(spark, tmp_path):
    """k=4, n_buckets=4 (k divides n_buckets — the trap case): buckets
    must still fan out, and the table must byte-match the oracle."""
    _gen(tmp_path, seed=71, n_conversations=400, n_segments=4, update_ratio=0.8)
    cfg = _cfg(tmp_path, n_buckets=4, files_per_bucket=4)
    replay_batch(spark, cfg)
    counts = _files_per_bucket_dir(cfg.target_dir)
    assert counts, "no bucket dirs written"
    # 400 conversations over 4 buckets x 4 salts: every bucket should
    # fan out; require at least >1 file for most and >=2 overall spread
    assert sum(1 for n in counts.values() if n > 1) >= 3, counts
    assert max(counts.values()) <= 4
    sink = ParquetSnapshotSink(spark, cfg.target_dir, 4)
    _assert_table_equal(sink.read_table(), _oracle(spark, cfg.changes_dir))


def test_fanout_default_is_one_file_per_bucket(spark, tmp_path):
    _gen(tmp_path, seed=72, n_conversations=120, n_segments=2)
    cfg = _cfg(tmp_path, n_buckets=4)  # files_per_bucket defaults to 1
    replay_batch(spark, cfg)
    counts = _files_per_bucket_dir(cfg.target_dir)
    assert counts and all(n == 1 for n in counts.values()), counts


def test_fanout_keeps_each_conversation_in_one_file(spark, tmp_path):
    """The salt is per conv_id, so a conversation's turns never split
    across files — point reads touch one file, write_sorted locality
    holds."""
    import pyspark.sql.functions as F

    _gen(tmp_path, seed=73, n_conversations=300, n_segments=3, max_turns=10)
    cfg = _cfg(tmp_path, n_buckets=2, files_per_bucket=8, write_sorted=True)
    replay_batch(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, 2)
    man = sink.load_manifest()
    vdir = next(iter(set(man["buckets"].values())))
    rows = (
        spark.read.parquet(os.path.join(cfg.target_dir, vdir))
        .select("conv_id", F.input_file_name().alias("f"))
        .groupBy("conv_id")
        .agg(F.countDistinct("f").alias("nf"))
        .filter(F.col("nf") > 1)
        .count()
    )
    assert rows == 0


def test_fanout_survives_mor_deltas_and_compaction(spark, tmp_path):
    """MOR deltas and the compacted base both fan out; the table stays
    equal to the batch oracle through compact()."""
    _gen(tmp_path, seed=74, n_conversations=300, n_segments=4, update_ratio=1.2)
    cfg = _cfg(tmp_path, n_buckets=4, files_per_bucket=4, table_mode="mor",
               max_files_per_trigger=1)
    from oec_etl_spark.streaming.engine import run_replay

    run_replay(spark, cfg)
    sink = ParquetSnapshotSink(spark, cfg.target_dir, 4, table_mode="mor",
                               files_per_bucket=4)
    sink.compact()
    counts = _files_per_bucket_dir(cfg.target_dir)
    assert counts and any(n > 1 for n in counts.values()), counts
    _assert_table_equal(sink.read_table(), _oracle(spark, cfg.changes_dir))
