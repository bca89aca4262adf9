"""Event-time TTL retention (EngineConfig.ttl_seconds).

The in-loop policy advances the table's truncate horizon to
(max event ts seen) - ttl after each commit. Pinned here:

- the final table equals the batch oracle filtered at the final
  horizon (mid-replay drops of late under-horizon events can never
  change the outcome: the horizon only grows, and a dropped event can
  never beat a surviving one under LWW);
- the horizon is event-time anchored → replaying the same log yields
  the same horizon (deterministic, no wall clock anywhere);
- ttl_advance_s throttles truncate-version churn.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.generate import GeneratorConfig, generate_changelog
from oec_etl_spark.operators.lww import materialize
from oec_etl_spark.schemas import CHANGE_SCHEMA
from oec_etl_spark.streaming.engine import quarantine_split, run_replay
from oec_etl_spark.streaming.sink import ParquetSnapshotSink

TTL = 3600.0  # the generator spreads ts over ~2h → roughly half dies


def _cfg(tmp, **kw):
    return EngineConfig(
        changes_dir=str(tmp / "changes"),
        target_dir=str(tmp / "target"),
        checkpoint_dir=str(tmp / "ckpt"),
        n_buckets=4,
        max_files_per_trigger=2,
        **kw,
    )


def _gen(tmp, seed=41):
    generate_changelog(
        GeneratorConfig(out_dir=str(tmp / "changes"), seed=seed,
                        n_conversations=60, n_segments=6)
    )


def _table_equal(a, b):
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a, b = a.select(*cols), b.select(*cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_ttl_table_equals_horizon_filtered_oracle(spark, tmp_path):
    _gen(tmp_path)
    run_replay(spark, _cfg(tmp_path, ttl_seconds=TTL))
    sink = ParquetSnapshotSink(spark, str(tmp_path / "target"), 4)
    man = sink.load_manifest()
    hz = int(man["truncate_ts_us"] or 0)
    assert hz > 0, "TTL never advanced the horizon"
    valid, _ = quarantine_split(
        spark.read.schema(CHANGE_SCHEMA).parquet(str(tmp_path / "changes") + "/*.parquet")
    )
    max_us = valid.agg(
        F.max(F.unix_micros(F.col("ts")))
    ).first()[0]
    assert hz == max_us - int(TTL * 1_000_000)
    oracle = materialize(valid).filter(
        F.col("ts") > F.timestamp_micros(F.lit(hz))
    )
    got = sink.read_table()
    assert got.count() > 0  # TTL kept the fresh tail
    _table_equal(got, oracle)


def test_ttl_horizon_is_replay_deterministic(spark, tmp_path):
    _gen(tmp_path, seed=43)
    run_replay(spark, _cfg(tmp_path, ttl_seconds=TTL))
    hz1 = ParquetSnapshotSink(spark, str(tmp_path / "target"), 4).load_manifest()[
        "truncate_ts_us"
    ]
    # same log, fresh table/checkpoint → identical horizon
    cfg2 = EngineConfig(
        changes_dir=str(tmp_path / "changes"),
        target_dir=str(tmp_path / "target2"),
        checkpoint_dir=str(tmp_path / "ckpt2"),
        n_buckets=4,
        max_files_per_trigger=3,  # different batching, same event times
        ttl_seconds=TTL,
    )
    run_replay(spark, cfg2)
    hz2 = ParquetSnapshotSink(spark, str(tmp_path / "target2"), 4).load_manifest()[
        "truncate_ts_us"
    ]
    assert hz1 == hz2


def test_ttl_advance_throttle_cuts_fewer_versions(spark, tmp_path):
    _gen(tmp_path, seed=47)
    run_replay(spark, _cfg(tmp_path, ttl_seconds=TTL))
    eager = len(ParquetSnapshotSink(spark, str(tmp_path / "target"), 4).history())
    cfg2 = EngineConfig(
        changes_dir=str(tmp_path / "changes"),
        target_dir=str(tmp_path / "t2"),
        checkpoint_dir=str(tmp_path / "c2"),
        n_buckets=4,
        max_files_per_trigger=2,
        ttl_seconds=TTL,
        ttl_advance_s=24 * 3600.0,  # horizon can never move this much
    )
    run_replay(spark, cfg2)
    sink2 = ParquetSnapshotSink(spark, str(tmp_path / "t2"), 4)
    throttled = len(sink2.history())
    assert throttled < eager
    # the first advance (from "no horizon") always fires; the throttle
    # suppresses every later one, so exactly ONE truncate commit exists
    dml = [b for b in sink2.load_manifest()["committed_batches"] if b < 0]
    assert len(dml) == 1
    assert sink2.load_manifest().get("truncate_ts_us")
