"""read_table(columns=...) — column projection pushed THROUGH the
merge-on-read path. On a transcript table `text` is most of the bytes;
a projected read must (a) return exactly the full read's values for
those columns, (b) prune the parquet ReadSchema itself (not select
after the merge), including inside dirty MOR buckets.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.generate import GeneratorConfig, generate_changelog
from oec_etl_spark.streaming.engine import replay_batch
from oec_etl_spark.streaming.sink import ParquetSnapshotSink


def _setup(spark, tmp_path, **kw):
    generate_changelog(
        GeneratorConfig(out_dir=str(tmp_path / "changes"), seed=53,
                        n_conversations=50, max_turns=5, n_segments=2)
    )
    cfg = EngineConfig(
        changes_dir=str(tmp_path / "changes"),
        target_dir=str(tmp_path / "target"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_buckets=4,
        **kw,
    )
    replay_batch(spark, cfg)
    return ParquetSnapshotSink(
        spark, cfg.target_dir, 4, table_mode=kw.get("table_mode", "cow")
    )


def _plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_projected_read_matches_full_read(spark, tmp_path, mode):
    sink = _setup(spark, tmp_path, table_mode=mode)
    full = sink.read_table().select("conv_id", "turn_idx", "role")
    proj = sink.read_table(columns=["conv_id", "turn_idx", "role"])
    assert proj.columns == ["conv_id", "turn_idx", "role"]
    assert proj.exceptAll(full).count() == 0 and full.exceptAll(proj).count() == 0


def test_projection_reaches_the_scan(spark, tmp_path):
    sink = _setup(spark, tmp_path, table_mode="mor")  # dirty buckets: merge path
    plan = _plan(sink.read_table(columns=["conv_id", "role"]))
    # the scan schema itself must omit text/tool — not a post-merge select
    assert "text" not in plan, plan
    assert "tool" not in plan, plan


def test_projection_without_keys_or_ts_still_reduces_correctly(spark, tmp_path):
    """Requesting only a non-key column: keys/ts are read internally
    for the LWW reduce but not returned."""
    sink = _setup(spark, tmp_path, table_mode="mor")
    got = sink.read_table(columns=["role"])
    assert got.columns == ["role"]
    want = sink.read_table().select("role")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_unknown_column_is_refused(spark, tmp_path):
    sink = _setup(spark, tmp_path)
    with pytest.raises(ValueError, match="unknown columns"):
        sink.read_table(columns=["conv_id", "nope"])


def test_scan_since_projection(spark, tmp_path):
    sink = _setup(spark, tmp_path, table_mode="mor")
    full = sink.read_table()
    # pick a horizon that keeps roughly the newer half
    mid = full.selectExpr("percentile(unix_micros(ts), 0.5)").first()[0]
    since = float(mid) / 1_000_000
    want = sink.scan_since(since).select("conv_id", "role")
    got = sink.scan_since(since, columns=["conv_id", "role"])
    assert got.columns == ["conv_id", "role"]
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    plan = _plan(got)
    assert "text" not in plan and "tool" not in plan
    # future horizon: empty frame, projected schema
    empty = sink.scan_since(4102444800.0, columns=["role"])
    assert empty.columns == ["role"] and empty.count() == 0
