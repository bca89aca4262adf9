"""Change-feed consumer cursors: named downstream subscriptions with
atomic acks — at-least-once delivery of the net key-level diff, which
is idempotent to re-apply. The subscriber half of the CDF."""

from __future__ import annotations

import json

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.generate import GeneratorConfig, generate_changelog
from oec_etl_spark.streaming.engine import run_replay
from oec_etl_spark.streaming.feed import ChangeFeedCursor, cursors
from oec_etl_spark.streaming.sink import ParquetSnapshotSink

from pyspark.sql import functions as F


def _gen(tmp, out="changes", **kw):
    return generate_changelog(GeneratorConfig(out_dir=str(tmp / out), **kw))


def _cfg(tmp, **kw):
    return EngineConfig(
        changes_dir=str(tmp / "changes"),
        target_dir=str(tmp / "target"),
        checkpoint_dir=str(tmp / "ckpt"),
        n_buckets=8,
        **kw,
    )


def _rows(df):
    return sorted(map(tuple, df.select(*sorted(df.columns)).collect()))


def _seed(spark, tmp_path, **gen_kw):
    _gen(tmp_path, seed=90, n_conversations=40, n_segments=4,
         update_ratio=1.0, delete_ratio=0.1, **gen_kw)
    cfg = _cfg(tmp_path, max_files_per_trigger=1)
    run_replay(spark, cfg)
    return cfg, ParquetSnapshotSink(spark, cfg.target_dir, cfg.n_buckets)


def test_bootstrap_then_incremental_then_empty(spark, tmp_path):
    cfg, sink = _seed(spark, tmp_path)
    cur = ChangeFeedCursor(sink, "downstream")
    # bootstrap: full state as inserts
    changes, head = cur.read()
    assert head == sink.load_manifest()["version"]
    assert {r["_change_type"] for r in changes.select("_change_type").distinct().collect()} == {"insert"}
    assert changes.count() == sink.read_table().count()
    cur.ack(head)
    # at head: empty, same shape
    changes2, head2 = cur.read()
    assert head2 == head and changes2.count() == 0
    assert sorted(changes2.columns) == sorted(changes.columns)
    # more merges land → the pull equals the table's own changelog
    _gen(tmp_path, out="changes2", seed=91, n_conversations=40, n_segments=2,
         update_ratio=1.0, delete_ratio=0.2)
    import glob

    from oec_etl_spark.schemas import CHANGE_SCHEMA
    for i, seg in enumerate(sorted(glob.glob(str(tmp_path / "changes2" / "*.parquet")))):
        sink.merge(spark.read.schema(CHANGE_SCHEMA).parquet(seg), batch_id=1000 + i)
    changes3, head3 = cur.read()
    assert head3 > head
    assert _rows(changes3) == _rows(sink.changelog(head, head3))
    assert changes3.count() > 0
    cur.ack(head3)
    assert cur.position() == head3


def test_unacked_pull_is_redelivered(spark, tmp_path):
    """Crash between read and ack: the next read returns the identical
    frame (at-least-once)."""
    cfg, sink = _seed(spark, tmp_path)
    cur = ChangeFeedCursor(sink, "crashy")
    first, head = cur.read()
    want = _rows(first)  # consumer "crashes" here — no ack
    again, head2 = cur.read()
    assert head2 == head and _rows(again) == want
    # stale ack never moves the cursor backwards
    cur.ack(head)
    cur.ack(head - 1)
    assert cur.position() == head


def test_independent_cursors(spark, tmp_path):
    cfg, sink = _seed(spark, tmp_path)
    a, b = ChangeFeedCursor(sink, "a"), ChangeFeedCursor(sink, "b")
    _, head = a.read()
    a.ack(head)
    assert cursors(sink) == {"a": head}
    assert b.position() is None
    full, _ = b.read()  # b still bootstraps from scratch
    assert full.count() == sink.read_table().count()


def test_describe_identity_card(spark, tmp_path, monkeypatch, capsys):
    """`describe` reads metadata only: head version, schema, delta
    pressure, refs, and cursor positions — no Spark job."""
    cfg, sink = _seed(spark, tmp_path)
    sink.tag("audited", version=1)
    cur = ChangeFeedCursor(sink, "readers")
    _, head = cur.read()
    cur.ack(head)
    from oec_etl_spark import cli, session

    monkeypatch.setattr(session, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    assert cli.main(["describe", "--target", cfg.target_dir, "--buckets", "8"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["version"] == head and out["n_buckets"] == 8
    assert "conv_id:string" in out["schema"] and "ts:timestamp" in out["schema"]
    assert out["snapshots"] >= 3 and out["committed_batches"] >= 3
    assert out["cursors"] == {"readers": head}
    assert out["tags"] == {"audited": 1}
    assert out["max_deltas_per_bucket"] == 0  # cow table has no deltas


def test_deliver_to_directory_sink_and_cli(spark, tmp_path, monkeypatch, capsys):
    cfg, sink = _seed(spark, tmp_path)
    out = str(tmp_path / "out")
    cur = ChangeFeedCursor(sink, "dirsink")
    rep = cur.deliver_to(out)
    head = sink.load_manifest()["version"]
    assert rep == {"cursor": "dirsink", "from": None, "to": head,
                   "rows": sink.read_table().count()}
    delivered = spark.read.parquet(f"{out}/v{head:06d}")
    assert delivered.count() == rep["rows"]
    # nothing new → no write, no ack movement
    assert cur.deliver_to(out)["rows"] == 0
    # CLI: peek (no ack), then a new merge + CLI delivery
    from oec_etl_spark import cli, session

    monkeypatch.setattr(session, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    from oec_etl_spark.schemas import CHANGE_SCHEMA
    import datetime

    extra = spark.createDataFrame(
        [(10 ** 6, "U", "conv-00000001", 0, "user", "cursor test", None,
          datetime.datetime(2100, 1, 1), "s", 0)],  # ts wins LWW for sure
        CHANGE_SCHEMA,
    )
    sink.merge(extra, batch_id=7777)
    assert cli.main(["consume", "--target", cfg.target_dir, "--buckets", "8",
                     "--cursor", "dirsink"]) == 0
    peek = json.loads(capsys.readouterr().out.strip())
    assert peek["acked"] is False and peek["rows"] >= 1
    assert cur.position() == head  # peek moved nothing
    assert cli.main(["consume", "--target", cfg.target_dir, "--buckets", "8",
                     "--cursor", "dirsink", "--out", out]) == 0
    rep2 = json.loads(capsys.readouterr().out.strip())
    assert rep2["rows"] >= 1 and rep2["to"] == head + 1
    got = spark.read.parquet(f"{out}/v{head + 1:06d}")
    assert got.filter((F.col("conv_id") == "conv-00000001")
                      & (F.col("_change_type") != "delete")).count() >= 1
