"""Metadata-only DROP COLUMN: the reverse arrow of schema evolution
(merge-side evolution adds/widens; this removes). Data files stay
immutable — readers stop projecting the column because every read
applies the manifest schema — and the next rewrite physically stops
carrying it."""

from __future__ import annotations

import glob
import json

import pyarrow.parquet as pq
import pytest

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.generate import GeneratorConfig, generate_changelog
from oec_etl_spark.schemas import CHANGE_SCHEMA
from oec_etl_spark.streaming.engine import run_replay
from oec_etl_spark.streaming.sink import ParquetSnapshotSink


def _seed(spark, tmp_path, **kw):
    generate_changelog(GeneratorConfig(out_dir=str(tmp_path / "changes"),
                                       seed=95, n_conversations=30, n_segments=3,
                                       epoch1_fraction=0.0))
    cfg = EngineConfig(changes_dir=str(tmp_path / "changes"),
                       target_dir=str(tmp_path / "target"),
                       checkpoint_dir=str(tmp_path / "ckpt"),
                       n_buckets=8, max_files_per_trigger=1, **kw)
    run_replay(spark, cfg)
    return cfg, ParquetSnapshotSink(spark, cfg.target_dir, 8, table_mode=kw.get("table_mode", "cow"))


def test_drop_column_rewrites_head_keeps_history(spark, tmp_path):
    cfg, sink = _seed(spark, tmp_path, table_mode="mor")
    pre = sink.load_manifest()["version"]
    assert "tool" in sink.read_table().columns
    want = sorted(map(tuple, sink.read_table().drop("tool").collect()))
    v = sink.alter_drop_column("tool")
    assert v == pre + 1
    out = sink.read_table()
    assert "tool" not in out.columns
    assert sorted(map(tuple, out.collect())) == want  # other values untouched
    # the head's data files physically lack the column (name-based
    # mapping: a re-added column must never resurrect old values)
    head_man = sink.load_manifest()
    assert not head_man["deltas"]  # rewrite folded the mor deltas too
    files = []
    for vdir in set(head_man["buckets"].values()):
        files += glob.glob(f"{sink.root}/{vdir}/__bucket=*/*.parquet")
    assert files
    for f in files:
        assert "tool" not in pq.read_schema(f).names
    # time travel to a pre-drop snapshot still sees the column
    assert "tool" in sink.read_table(version=pre).columns
    assert sink.read_table(version=pre).count() == len(want)


def test_dropped_column_can_return_via_evolution(spark, tmp_path):
    cfg, sink = _seed(spark, tmp_path)
    sink.alter_drop_column("tool")
    extra = spark.createDataFrame(
        [(10 ** 6, "I", "c_back", 0, "assistant", "hi", "grep",
          None, "s", 0)],
        CHANGE_SCHEMA,
    )
    sink.merge(extra, batch_id=4242)
    out = sink.read_table()
    assert "tool" in out.columns  # evolution re-added it
    rows = {r["conv_id"]: r["tool"] for r in out.collect()}
    assert rows["c_back"] == "grep"
    assert all(v is None for k, v in rows.items() if k != "c_back")  # old rows NULL


def test_drop_column_guards_and_cli(spark, tmp_path, monkeypatch, capsys):
    cfg, sink = _seed(spark, tmp_path)
    with pytest.raises(KeyError, match="no column"):
        sink.alter_drop_column("nope")
    for protected in ("conv_id", "turn_idx", "ts"):
        with pytest.raises(ValueError, match="key/order"):
            sink.alter_drop_column(protected)
    from oec_etl_spark import cli, session

    monkeypatch.setattr(session, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    assert cli.main(["drop-column", "--target", cfg.target_dir, "--buckets", "8",
                     "--column", "tool"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["dropped"] == "tool"
    assert "tool" not in sink.read_table().columns


def test_rename_column_rewrites_head_keeps_history(spark, tmp_path):
    cfg, sink = _seed(spark, tmp_path, table_mode="mor")
    pre = sink.load_manifest()["version"]
    want = sorted(map(tuple, sink.read_table().collect()))
    v = sink.alter_rename_column("tool", "tool_name")
    assert v == pre + 1
    out = sink.read_table()
    assert "tool" not in out.columns and "tool_name" in out.columns
    # values identical, just relabeled (read_table projects manifest
    # schema order, which the rename preserves in place)
    assert sorted(map(tuple, out.collect())) == want
    # head data files physically carry the new name only
    head_man = sink.load_manifest()
    assert not head_man["deltas"]  # rewrite folded the mor deltas too
    for vdir in set(head_man["buckets"].values()):
        for f in glob.glob(f"{sink.root}/{vdir}/__bucket=*/*.parquet"):
            names = pq.ParquetFile(f).schema_arrow.names
            assert "tool_name" in names and "tool" not in names
    # time travel: the pre-rename snapshot still shows the old name
    assert "tool" in sink.read_table(version=pre).columns


def test_renamed_old_name_returns_via_evolution(spark, tmp_path):
    """The change stream's payload names do not follow a rename: a
    later batch carrying the OLD name re-adds it as a fresh column
    (NULL on existing rows) while the renamed column keeps history."""
    cfg, sink = _seed(spark, tmp_path)
    sink.alter_rename_column("tool", "tool_name")
    extra = spark.createDataFrame(
        [(10 ** 6, "I", "c_back", 0, "assistant", "hi", "grep",
          None, "s", 0)],
        CHANGE_SCHEMA,
    )
    sink.merge(extra, batch_id=4242)
    out = sink.read_table()
    assert {"tool", "tool_name"} <= set(out.columns)
    rows = {r["conv_id"]: (r["tool"], r["tool_name"]) for r in out.collect()}
    assert rows["c_back"] == ("grep", None)
    assert all(t is None for k, (t, _) in rows.items() if k != "c_back")


def test_rename_column_guards_and_cli(spark, tmp_path, monkeypatch, capsys):
    cfg, sink = _seed(spark, tmp_path)
    with pytest.raises(KeyError, match="no column"):
        sink.alter_rename_column("nope", "x")
    for protected in ("conv_id", "turn_idx", "ts"):
        with pytest.raises(ValueError, match="key/order"):
            sink.alter_rename_column(protected, "x")
    with pytest.raises(ValueError, match="already exists"):
        sink.alter_rename_column("tool", "text")
    with pytest.raises(ValueError, match="metadata namespace"):
        sink.alter_rename_column("tool", "__tool")
    from oec_etl_spark import cli, session

    monkeypatch.setattr(session, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    assert cli.main(["rename-column", "--target", cfg.target_dir, "--buckets", "8",
                     "--from", "tool", "--to", "tool_name"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out == {"renamed": "tool", "to": "tool_name",
                   "new_version": sink.load_manifest()["version"]}
    assert "tool_name" in sink.read_table().columns
