"""Kafka wire-format source: parse/lineage plumbing (no broker needed).

``parse_change_events`` is the stage a real Kafka tail would feed into
the engine; these tests run it on batch DataFrames shaped exactly like
Spark's kafka source output (key, value, topic, partition, offset,
timestamp) and prove: envelope parse, malformed→quarantine routing,
(topic/partition, offset) → row-unique lineage, and an end-to-end merge
whose table matches the oracle. The connector itself is absent in this
sandbox; ``kafka_stream`` must say so clearly.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

import pytest

from oec_etl_spark.operators.lww import materialize
from oec_etl_spark.streaming.engine import quarantine_split
from oec_etl_spark.streaming.sink import ParquetSnapshotSink
from oec_etl_spark.streaming.source import kafka_stream, parse_change_events

WIRE = "key binary, value string, topic string, partition int, offset long, timestamp timestamp"


def _rec(seq, op, conv, turn, text, offset, partition=0, ts="2024-01-01T00:00:00"):
    v = json.dumps({"seq": seq, "op": op, "conv_id": conv, "turn_idx": turn,
                    "role": "user", "text": text, "tool": None, "ts": ts})
    return (None, v, "transcripts.changes", partition, offset, datetime(2024, 1, 1, tzinfo=timezone.utc))


def test_parse_wire_records(spark):
    wire = spark.createDataFrame(
        [
            _rec(1, "I", "c1", 0, "hello", offset=100, partition=3),
            (None, "{ not json", "transcripts.changes", 0, 101, datetime(2024, 1, 1, tzinfo=timezone.utc)),
        ],
        WIRE,
    )
    rows = {r["offset"]: r for r in parse_change_events(wire).collect()}
    good = rows[100]
    assert (good["seq"], good["op"], good["conv_id"], good["turn_idx"], good["text"]) == (1, "I", "c1", 0, "hello")
    assert good["source_file"] == "transcripts.changes/3"  # topic/partition lineage
    bad = rows[101]
    assert bad["conv_id"] is None  # malformed value → null keys...
    valid, quarantined = quarantine_split(parse_change_events(wire))
    assert valid.count() == 1 and quarantined.count() == 1  # ...caught by the DLQ split


def test_kafka_redelivery_dedups_through_merge(spark, tmp_path):
    """Same event delivered twice at different offsets (at-least-once):
    the offsets give the hash-path merge its row-unique tiebreak and the
    table holds one row per key, matching the batch oracle."""
    wire = spark.createDataFrame(
        [
            _rec(1, "I", "c1", 0, "v1", offset=5),
            _rec(1, "I", "c1", 0, "v1", offset=6),  # redelivery
            _rec(2, "U", "c1", 0, "v2", offset=7, ts="2024-01-01T01:00:00"),
            _rec(3, "I", "c2", 1, "w", offset=8, partition=1),
        ],
        WIRE,
    )
    events = parse_change_events(wire)
    valid, _ = quarantine_split(events)
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=4, merge_strategy="hash")
    rec = sink.merge(valid, batch_id=0)
    assert rec.merge_strategy == "hash"  # wire coords ARE row-unique
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in sink.read_table().collect()}
    want = {(r["conv_id"], r["turn_idx"]): r["text"] for r in materialize(valid).collect()}
    assert got == want == {("c1", 0): "v2", ("c2", 1): "w"}


def test_kafka_stream_raises_clearly_without_connector(spark):
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        kafka_stream(spark, "localhost:9092", "transcripts.changes")
