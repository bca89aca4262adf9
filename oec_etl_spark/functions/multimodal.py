"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

The reference has no media handling at all (its payloads are CSV trade
rows, /root/reference/etl/trade_comtrade_monthly_pipeline.py:18-58);
this module supplies the multimodal surface a 100 TB training-data
pipeline needs, Spark-first:

- media lives in an opaque ``binary`` column next to a **typed metadata
  struct** (kind/codec/declared dims) — the lakehouse-standard layout
  (one row per asset, bytes inline for small assets, a URI column for
  large ones);
- decode / feature-extract / resize / frame-sample run as **Arrow-batched
  ``mapInPandas``** transforms: bytes cross the JVM↔Python boundary once
  per batch as Arrow buffers, never per row;
- the *codec* step itself (PIL/libav) is NOT installed in this container,
  so decoding is a clearly-marked **deterministic fake**
  (``fake_decode_bytes``): real pipelines swap one function; everything
  Spark-side — schema, batch shape, partitioning, UDF signatures,
  output contracts — is real and oracle-tested (the DuckDB oracle
  recomputes the same deterministic facts straight from the source
  text, proving the binary round-trip is lossless).

Scale notes: decode is embarrassingly parallel (no shuffle); partition
count is inherited from the scan, and ``spark.sql.files.maxPartitionBytes``
bounds bytes per task. Output columns are pruned before decode via an
explicit select so only the binary column crosses into Arrow.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_HEADER = {"image": b"IMG0", "audio": b"AUD0", "video": b"VID0"}

MEDIA_META_T = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("codec", T.StringType(), False),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("checksum", T.StringType(), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_checksum", T.StringType(), False),
    ]
)


def media_kind(doc_id: Column) -> Column:
    """Deterministic kind assignment used by the synthetic attach step."""
    return (
        F.when(doc_id % 3 == 0, F.lit("image"))
        .when(doc_id % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )


def media_kind_sql(expr: str) -> str:
    return (
        f"CASE WHEN {expr} % 3 = 0 THEN 'image' "
        f"WHEN {expr} % 3 = 1 THEN 'audio' ELSE 'video' END"
    )


def attach_media(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, media: binary, media_meta: struct).

    Synthesizes an opaque binary asset per document: a 4-byte magic
    header + the utf-8 payload. In production this column comes from
    ``spark.read.format("binaryFile")`` or an upstream extractor; the
    layout (binary + typed metadata struct) is identical.
    """
    kind = media_kind(F.col("doc_id"))
    header = (
        F.when(kind == "image", F.lit(MEDIA_HEADER["image"]))
        .when(kind == "audio", F.lit(MEDIA_HEADER["audio"]))
        .otherwise(F.lit(MEDIA_HEADER["video"]))
    )
    return docs.select(
        "doc_id",
        F.concat(header, F.encode("text", "utf-8")).alias("media"),
        F.struct(kind.alias("kind"), F.lit("fake/v0").alias("codec")).alias("media_meta"),
    )


# --------------------------------------------------------------------- decode
def fake_decode_bytes(data: bytes) -> dict:
    """DETERMINISTIC FAKE decoder (this container has no PIL/libav).

    A real deployment replaces this one function with
    ``PIL.Image.open(io.BytesIO(data))`` / ``av.open`` — the Spark
    plumbing around it is unchanged. The fake derives plausible typed
    facts purely from the bytes so tests and the DuckDB oracle can
    verify the whole binary round-trip end to end.
    """
    n = len(data)
    return {
        "byte_len": n,
        "width": 64 + (n % 640),
        "height": 64 + ((n * 7) % 480),
        "n_frames": 1 + (n % 24),
        "checksum": hashlib.md5(data).hexdigest(),
    }


def decode_media(media_df: DataFrame) -> DataFrame:
    """(doc_id, media, media_meta) → typed per-asset metadata.

    Arrow-batched ``mapInPandas``: one Python invocation per Arrow
    batch; pandas vectorized ops inside (the only per-element work is
    the decoder call itself, which is the codec boundary by nature).
    """
    pruned = media_df.select("doc_id", F.col("media_meta.kind").alias("kind"), "media")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            facts = pd.DataFrame.from_records([fake_decode_bytes(b) for b in pdf["media"]])
            out = pd.concat([pdf[["doc_id", "kind"]].reset_index(drop=True), facts], axis=1)
            out["width"] = out["width"].astype("int32")
            out["height"] = out["height"].astype("int32")
            out["n_frames"] = out["n_frames"].astype("int32")
            yield out

    return pruned.mapInPandas(decode, schema=DECODED_SCHEMA)


# --------------------------------------------------------------------- resize
def resize_media(media_df: DataFrame, max_bytes: int = 256) -> DataFrame:
    """Bandwidth-bounding 'resize': emits a thumbnail binary capped at
    ``max_bytes`` (header preserved). With a real codec this is
    decode→scale→re-encode; the contract (binary in, smaller binary +
    dims out) and the Arrow batch path are identical.
    """
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("thumb", T.BinaryType(), False),
            T.StructField("thumb_len", T.IntegerType(), False),
        ]
    )

    def shrink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = pdf["media"].map(lambda b: bytes(b)[:max_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumb": thumbs,
                    "thumb_len": thumbs.map(len).astype("int32"),
                }
            )

    return media_df.select("doc_id", "media").mapInPandas(shrink, schema=schema)


# --------------------------------------------------------------- frame sample
def sample_frames(media_df: DataFrame, every: int = 4) -> DataFrame:
    """Video frame sampling: one output row per kept frame.

    The fake treats the payload as ``n_frames`` equal byte slices and
    keeps every ``every``-th; a real decoder yields keyframes from the
    container. Row-expansion happens inside the Arrow batch (no
    explode shuffle; output partitioning inherits the scan).
    """
    pruned = media_df.filter(F.col("media_meta.kind") == "video").select("doc_id", "media")

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for doc_id, raw in zip(pdf["doc_id"], pdf["media"]):
                data = bytes(raw)
                n = fake_decode_bytes(data)["n_frames"]
                step = max(1, len(data) // n)
                for i in range(0, n, every):
                    ids.append(doc_id)
                    idxs.append(i)
                    sums.append(hashlib.md5(data[i * step : (i + 1) * step]).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_checksum": pd.Series(sums, dtype="object"),
                }
            )

    return pruned.mapInPandas(frames, schema=FRAME_SCHEMA)


# ------------------------------------------------------------ feature extract
def extract_features(media_df: DataFrame, dim: int = 8) -> DataFrame:
    """Embedding stub: binary → array<float> feature vector.

    DETERMINISTIC FAKE for the model forward pass (no torch in this
    container): ``dim`` md5-derived floats in [0, 1). The contract —
    binary column in, fixed-width float vector out, Arrow-batched — is
    exactly what a GPU-backed extractor plugs into.
    """
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("features", T.ArrayType(T.FloatType(), False), False),
        ]
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for raw in pdf["media"]:
                h = hashlib.md5(bytes(raw)).digest()
                vecs.append([h[i % 16] / 256.0 for i in range(dim)])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": vecs})

    return media_df.select("doc_id", "media").mapInPandas(feats, schema=schema)
