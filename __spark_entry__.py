"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship: replay a deterministic synthetic CDC
  change log through the streaming engine and return the materialized
  transcript table (the engine's whole point in one call).
- ``queries()`` — one entry per implemented operator (SURVEY.md §2 +
  training-data ops), from oec_etl_spark.plans.queries.REGISTRY.
- ``oracle_sql()`` — the DuckDB-equivalent SQL for every
  SQL-expressible query (same registry).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: generate a small seeded change log, replay it through
    the CDC engine (quarantine → LWW merge → snapshot sink), return the
    final transcript table."""
    from oec_etl_spark.config import EngineConfig
    from oec_etl_spark.generate import GeneratorConfig, generate_changelog
    from oec_etl_spark.streaming.engine import replay_batch
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    work = os.path.join(
        tempfile.gettempdir(),
        "oec_etl_spark_entry_" + hashlib.md5(b"entry-v1").hexdigest()[:8],
    )
    shutil.rmtree(work, ignore_errors=True)
    gen = GeneratorConfig(out_dir=f"{work}/changes", seed=42, n_conversations=80, n_segments=4)
    generate_changelog(gen)
    cfg = EngineConfig(
        changes_dir=f"{work}/changes",
        target_dir=f"{work}/target",
        checkpoint_dir=f"{work}/ckpt",
        n_buckets=8,
    )
    replay_batch(spark, cfg)
    return ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets).read_table()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from oec_etl_spark.plans.queries import REGISTRY

    return {name: spec.build for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from oec_etl_spark.plans.queries import REGISTRY

    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
