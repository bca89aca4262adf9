"""Vector math over array<float> embedding columns.

Pure higher-order built-ins (`zip_with`, `aggregate`, `transform`) —
these execute inside the JVM on the array values, no Python transfer.
A Pandas-UDF variant only makes sense when numpy BLAS beats codegen on
very wide vectors; for 64-1024 dims the built-ins win by avoiding the
Arrow hop entirely.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_sql(a: str, b: str) -> str:
    """DuckDB oracle equivalent (list_cosine_similarity computes the
    same double-precision sequential reduction)."""
    return f"list_cosine_similarity({a}, {b})"


def quantize_scale(a: Column) -> Column:
    """Per-vector int8 scalar-quantization scale: max(|x|)/127, the
    symmetric-range scheme embedding stores use (4 bytes/dim → 1).
    Map-only built-ins; no shuffle, no Python."""
    return F.array_max(F.transform(a, lambda x: F.abs(x.cast("double")))) / F.lit(127.0)


def quantize_int8(a: Column, scale: Column) -> Column:
    """Quantized codes round(x/scale) as array<int>. Rounding is
    floor(x/scale + 0.5) — half-up toward +inf — because Spark round()
    and DuckDB round() disagree on negative halves; floor() is
    unambiguous in both engines, which keeps the oracle exact."""
    return F.transform(a, lambda x: F.floor(x.cast("double") / scale + F.lit(0.5)).cast("int"))


def dequantize_max_err(a: Column, scale: Column) -> Column:
    """Largest per-dimension reconstruction error |x - q*scale| of the
    int8 roundtrip — the quality gauge for quantized ANN. Elementwise
    on (x, scale) only, so it fuses into the same map stage."""
    return F.array_max(
        F.transform(
            a,
            lambda x: F.abs(
                x.cast("double") - F.floor(x.cast("double") / scale + F.lit(0.5)) * scale
            ),
        )
    )
