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
