"""Unicode robustness: multilingual / emoji / RTL / quote-laden text
must survive the full pipeline byte-identically — parquet AND ndjson
change logs, the LWW merge, point lookup, and export. The north rule's
per-turn TEXT EQUALITY invariant is only meaningful if no layer (JSON
escaping, parquet stats truncation, bloom harvest, regex derives)
mangles non-ASCII payloads.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.streaming.engine import replay_batch
from oec_etl_spark.streaming.sink import ParquetSnapshotSink

TEXTS = [
    "中文文本，带标点。还有换行前的内容",
    "emoji soup 🙂🚀🧪 and modifiers 👍🏽",
    "עברית מימין לשמאל ثم العربية أيضاً",
    'quotes "double" \'single\' and backslash \\ and tab\there',
    "combining: é (é) vs precomposed é; zero-width​join",
    "ctrl-adjacent: bell done",
]


def _rows():
    n = len(TEXTS)
    return {
        "conv_id": pa.array([f"u{i}" for i in range(n)], pa.string()),
        "turn_idx": pa.array([0] * n, pa.int32()),
        "role": pa.array(["user"] * n, pa.string()),
        "text": pa.array(TEXTS, pa.string()),
        "tool": pa.array([None] * n, pa.string()),
        "ts": pa.array([1_000_000 * (i + 1) for i in range(n)], pa.timestamp("us")),
        "op": pa.array(["I"] * n, pa.string()),
        "seq": pa.array(list(range(1, n + 1)), pa.int64()),
    }


def _replay(spark, tmp_path, fmt: str):
    ch = tmp_path / f"changes_{fmt}"
    ch.mkdir()
    if fmt == "parquet":
        pq.write_table(pa.table(_rows()), str(ch / "seg-00000.parquet"))
        pattern = str(ch) + "/*.parquet"
    else:
        cols = _rows()
        n = len(TEXTS)
        with open(ch / "seg-00000.json", "w", encoding="utf-8") as f:
            for i in range(n):
                rec = {
                    "conv_id": cols["conv_id"][i].as_py(),
                    "turn_idx": cols["turn_idx"][i].as_py(),
                    "role": "user",
                    "text": TEXTS[i],
                    "tool": None,
                    "ts": "1970-01-01T00:00:0%d.000000Z" % (i + 1),
                    "op": "I",
                    "seq": i + 1,
                }
                # both escaping styles occur in the wild — alternate them
                f.write(json.dumps(rec, ensure_ascii=bool(i % 2)) + "\n")
        pattern = str(ch)
    cfg = EngineConfig(
        changes_dir=pattern,
        target_dir=str(tmp_path / f"target_{fmt}"),
        checkpoint_dir=str(tmp_path / f"ckpt_{fmt}"),
        n_buckets=2,
        key_bloom_bits=1024,
        format=fmt,
    )
    replay_batch(spark, cfg)
    return ParquetSnapshotSink(
        spark, cfg.target_dir, 2, key_bloom_bits=1024
    )


def test_unicode_text_roundtrips_parquet_and_json(spark, tmp_path):
    for fmt in ("parquet", "json"):
        sink = _replay(spark, tmp_path, fmt)
        got = {r["conv_id"]: r["text"] for r in sink.read_table().collect()}
        want = {f"u{i}": t for i, t in enumerate(TEXTS)}
        assert got == want, f"{fmt}: stored text diverged"
        # point lookup (bloom probes hash the raw unicode key bytes)
        for cid, t in want.items():
            rows = sink.lookup(cid).collect()
            assert len(rows) == 1 and rows[0]["text"] == t, f"{fmt}: lookup({cid})"


def test_unicode_keys_bucket_and_prune_correctly(spark, tmp_path):
    """Non-ASCII conv_ids: bucketing, zone-map harvest (parquet binary
    stats), and bloom probes all agree between write and lookup."""
    keys = ["对话-один", "משיחה☕", "ключ-🙂", "plain"]
    n = len(keys)
    rows = dict(_rows())
    rows["conv_id"] = pa.array(keys, pa.string())
    rows["text"] = pa.array([f"payload {k}" for k in keys], pa.string())
    rows["turn_idx"] = pa.array([0] * n, pa.int32())
    rows["role"] = pa.array(["user"] * n, pa.string())
    rows["tool"] = pa.array([None] * n, pa.string())
    rows["ts"] = pa.array([1_000_000] * n, pa.timestamp("us"))
    rows["op"] = pa.array(["I"] * n, pa.string())
    rows["seq"] = pa.array(list(range(1, n + 1)), pa.int64())
    ch = tmp_path / "changes"
    ch.mkdir()
    pq.write_table(pa.table(rows), str(ch / "seg-00000.parquet"))
    cfg = EngineConfig(
        changes_dir=str(ch) + "/*.parquet",
        target_dir=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "c"),
        n_buckets=4,
        files_per_bucket=2,
        key_bloom_bits=1024,
    )
    replay_batch(spark, cfg)
    sink = ParquetSnapshotSink(
        spark, cfg.target_dir, 4, files_per_bucket=2, key_bloom_bits=1024
    )
    for k in keys:
        rs = sink.lookup(k).collect()
        assert len(rs) == 1 and rs[0]["text"] == f"payload {k}"
