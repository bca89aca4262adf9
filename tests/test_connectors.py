"""Connector registry (conns.yaml analog) — SURVEY.md §2.1 S1.

Mirrors the reference's declarative endpoint binding
(/root/reference/etl/conns.yaml:5-47): named sources with <param>
placeholders and $ENV refs, resolved from run params, consumed by the
engine via EngineConfig.connectors_path.
"""

from __future__ import annotations

import io
import os

import pytest

from oec_etl_spark.connectors import Connector, fetch, load_connectors

CONNS_YAML = """
comtrade-monthly:
  driver: csv
  uri: {root}/raw/ALL-<year>-<month>-M-HS.csv
  options: {{header: "true", sep: ";"}}
changelog:
  driver: parquet
  uri: $OEC_TEST_DATA_ROOT/changes
"""


def test_connector_template_binding(tmp_path):
    conns = load_connectors(io.StringIO(CONNS_YAML.format(root=tmp_path)))
    c = conns["comtrade-monthly"]
    assert c.driver == "csv" and c.options == {"header": "true", "sep": ";"}
    path = c.resolve({"year": 2019, "month": "01"})
    assert path == f"{tmp_path}/raw/ALL-2019-01-M-HS.csv"
    with pytest.raises(KeyError, match="unbound connector param <month>"):
        c.resolve({"year": 2019})  # missing param fails loudly, no empty glob


def test_env_expansion_and_fetch(tmp_path, monkeypatch):
    monkeypatch.setenv("OEC_TEST_DATA_ROOT", str(tmp_path))
    c = fetch("changelog", io.StringIO(CONNS_YAML.format(root=tmp_path)))
    assert c.resolve() == f"{tmp_path}/changes"
    with pytest.raises(KeyError, match="no connector"):
        fetch("nope", io.StringIO(CONNS_YAML.format(root=tmp_path)))


def test_connector_read_csv(spark, tmp_path):
    raw = tmp_path / "raw"
    os.makedirs(raw)
    (raw / "ALL-2019-01-M-HS.csv").write_text("a;b\n1;x\n2;y\n")
    c = Connector("m", "csv", f"{tmp_path}/raw/ALL-<year>-<month>-M-HS.csv",
                  {"header": "true", "sep": ";"})
    rows = c.read(spark, {"year": 2019, "month": "01"}, schema="a int, b string").collect()
    assert sorted((r["a"], r["b"]) for r in rows) == [(1, "x"), (2, "y")]


def test_engine_replays_via_connector_name(spark, tmp_path):
    """EngineConfig.changes_dir as a connector name: the replay resolves
    the path + format through the registry and matches the oracle."""
    from oec_etl_spark.config import EngineConfig
    from oec_etl_spark.generate import GeneratorConfig, generate_changelog
    from oec_etl_spark.operators.lww import materialize
    from oec_etl_spark.schemas import CHANGE_SCHEMA
    from oec_etl_spark.streaming.engine import quarantine_split, run_replay
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    generate_changelog(GeneratorConfig(out_dir=str(tmp_path / "log-42"), seed=42, n_conversations=40))
    conns = tmp_path / "conns.yaml"
    conns.write_text(
        f"transcript-changelog:\n  driver: parquet\n  uri: {tmp_path}/log-<run_id>\n"
    )
    cfg = EngineConfig(
        changes_dir="transcript-changelog",  # a NAME, not a path
        target_dir=str(tmp_path / "target"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_buckets=4,
        connectors_path=str(conns),
        source_params={"run_id": "42"},
    )
    recs = run_replay(spark, cfg)
    assert sum(r.rows_applied for r in recs) > 0
    table = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets).read_table()
    raw = spark.read.schema(CHANGE_SCHEMA).parquet(str(tmp_path / "log-42"))
    oracle = materialize(quarantine_split(raw)[0])
    assert table.exceptAll(oracle).count() == 0 and oracle.exceptAll(table).count() == 0


# ------------------------------------------------------------- http driver
import contextlib
import threading
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer


@contextlib.contextmanager
def _serve(root):
    """Local http.server over ``root`` with a GET counter — the offline
    stand-in for the reference's remote endpoints (no external network
    in tests, ever)."""
    hits = []

    class Handler(SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(root), **kw)

        def do_GET(self):
            hits.append(self.path)
            super().do_GET()

        def log_message(self, *a):  # keep pytest output clean
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}", hits
    finally:
        srv.shutdown()
        t.join()


def test_connector_http_staging(spark, tmp_path):
    """http driver: param-bound URL is downloaded once into the stage
    dir and read with the declared format; a second read serves from
    the cache (zero new GETs) even if the origin changed."""
    src = tmp_path / "www"
    os.makedirs(src)
    (src / "ALL-2019-01.csv").write_text("a;b\n1;x\n2;y\n")
    stage = tmp_path / "stage"
    with _serve(src) as (base, hits):
        c = Connector("remote", "http", f"{base}/ALL-<year>-<month>.csv",
                      {"format": "csv", "header": "true", "sep": ";",
                       "stage_dir": str(stage)})
        rows = c.read(spark, {"year": 2019, "month": "01"}, schema="a int, b string").collect()
        assert sorted((r["a"], r["b"]) for r in rows) == [(1, "x"), (2, "y")]
        assert len(hits) == 1
        staged = c.stage({"year": 2019, "month": "01"})
        # per-URL subdir under the declared stage_dir
        assert os.path.dirname(os.path.dirname(staged)) == str(stage)
        assert os.path.basename(staged) == "ALL-2019-01.csv"
        # origin mutates; the cache must win (resumable-backfill semantics)
        (src / "ALL-2019-01.csv").write_text("a;b\n9;z\n")
        rows2 = c.read(spark, {"year": 2019, "month": "01"}, schema="a int, b string").collect()
        assert sorted((r["a"], r["b"]) for r in rows2) == [(1, "x"), (2, "y")]
        assert len(hits) == 1  # no second download
        # different params → different URL → separate cache entry
        (src / "ALL-2019-02.csv").write_text("a;b\n3;q\n")
        rows3 = c.read(spark, {"year": 2019, "month": "02"}, schema="a int, b string").collect()
        assert [(r["a"], r["b"]) for r in rows3] == [(3, "q")]
        assert len(hits) == 2


def test_http_stage_failure_leaves_no_artifacts(tmp_path):
    """A 404 raises and leaves neither the dest file nor a .part temp —
    a later retry starts clean instead of trusting a half download."""
    import urllib.error

    stage = tmp_path / "stage"
    with _serve(tmp_path / "empty-www") as (base, _):
        c = Connector("remote", "http", f"{base}/missing.csv",
                      {"format": "csv", "stage_dir": str(stage)})
        with pytest.raises(urllib.error.HTTPError):
            c.stage()
    assert not os.path.exists(stage) or os.listdir(stage) == []


def test_stage_on_non_http_connector_raises():
    with pytest.raises(ValueError, match="http driver"):
        Connector("local", "parquet", "/tmp/x").stage()


def test_engine_replays_via_http_connector(spark, tmp_path):
    """EngineConfig.changes_dir naming an http connector: the engine
    stages the remote change segment and replays it — the full
    download → CDC-apply path of the reference's pipelines, offline."""
    from oec_etl_spark.config import EngineConfig
    from oec_etl_spark.generate import GeneratorConfig, generate_changelog
    from oec_etl_spark.operators.lww import materialize
    from oec_etl_spark.schemas import CHANGE_SCHEMA
    from oec_etl_spark.streaming.engine import quarantine_split, run_replay
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    generate_changelog(GeneratorConfig(out_dir=str(tmp_path / "www"), seed=7,
                                       n_conversations=20, n_segments=1))
    seg = [f for f in os.listdir(tmp_path / "www") if f.endswith(".parquet")][0]
    with _serve(tmp_path / "www") as (base, hits):
        conns = tmp_path / "conns.yaml"
        conns.write_text(
            "remote-changelog:\n  driver: http\n"
            f"  uri: {base}/<segment>\n"
            f"  options: {{format: parquet, stage_dir: {tmp_path}/stage}}\n"
        )
        cfg = EngineConfig(
            changes_dir="remote-changelog",
            target_dir=str(tmp_path / "target"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            n_buckets=4,
            connectors_path=str(conns),
            source_params={"segment": seg},
        )
        recs = run_replay(spark, cfg)
        assert sum(r.rows_applied for r in recs) > 0
        assert len(hits) == 1
    table = ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets).read_table()
    raw = spark.read.schema(CHANGE_SCHEMA).parquet(str(tmp_path / "www" / seg))
    oracle = materialize(quarantine_split(raw)[0])
    assert table.exceptAll(oracle).count() == 0 and oracle.exceptAll(table).count() == 0
