"""Multimodal plumbing tests: the binary round-trip facts the SQL
oracle can't express (byte-level checksums of frame slices / thumbs)
are verified here against a pure-Python recompute of the deterministic
fake codec."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from oec_etl_spark.functions import multimodal as mm

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _expected_media(rows):
    out = {}
    for doc_id, text in rows:
        kind = ("image", "audio", "video")[doc_id % 3]
        out[doc_id] = (kind, mm.MEDIA_HEADER[kind] + text.encode("utf-8"))
    return out


def test_attach_media_binary_roundtrip(spark):
    docs = spark.read.parquet(DOCS)
    got = {r["doc_id"]: r for r in mm.attach_media(docs).collect()}
    src = _expected_media(docs.select("doc_id", "text").collect())
    assert set(got) == set(src)
    for doc_id, (kind, payload) in src.items():
        assert bytes(got[doc_id]["media"]) == payload
        assert got[doc_id]["media_meta"]["kind"] == kind


def test_frame_checksums_match_python_recompute(spark):
    docs = spark.read.parquet(DOCS).filter(F.col("doc_id") < 30)
    media = mm.attach_media(docs)
    got = {
        (r["doc_id"], r["frame_idx"]): r["frame_checksum"]
        for r in mm.sample_frames(media, every=4).collect()
    }
    expected = {}
    for doc_id, (kind, data) in _expected_media(docs.select("doc_id", "text").collect()).items():
        if kind != "video":
            continue
        n = mm.fake_decode_bytes(data)["n_frames"]
        step = max(1, len(data) // n)
        for i in range(0, n, 4):
            expected[(doc_id, i)] = hashlib.md5(data[i * step : (i + 1) * step]).hexdigest()
    assert got == expected


def test_resize_preserves_prefix_and_caps(spark):
    docs = spark.read.parquet(DOCS).filter(F.col("doc_id") < 30)
    media = mm.attach_media(docs).cache()
    full = {r["doc_id"]: bytes(r["media"]) for r in media.collect()}
    for r in mm.resize_media(media, max_bytes=64).collect():
        thumb = bytes(r["thumb"])
        assert len(thumb) == min(64, len(full[r["doc_id"]]))
        assert full[r["doc_id"]].startswith(thumb)
    media.unpersist()


def test_features_fixed_width_and_deterministic(spark):
    docs = spark.read.parquet(DOCS).filter(F.col("doc_id") < 30)
    media = mm.attach_media(docs)
    a = {r["doc_id"]: r["features"] for r in mm.extract_features(media, dim=8).collect()}
    b = {r["doc_id"]: r["features"] for r in mm.extract_features(media, dim=8).collect()}
    assert a == b
    assert all(len(v) == 8 and all(0.0 <= x < 1.0 for x in v) for v in a.values())
