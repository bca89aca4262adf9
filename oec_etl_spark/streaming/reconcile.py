"""Arrow/StructType-based schema reconciliation (zero per-row Python).

The reference's only schema-evolution event is an ad-hoc dtype-dict
mutation before load (/root/reference/etl/countries/russia/trade_monthly_pipeline.py:61-62).
Here evolution is a first-class, safe operation:

- ``evolve_schema(target, incoming)`` — merge field sets; on a type
  conflict apply the lossless widening lattice (int→long, float→double,
  date→timestamp); anything else is an error (quarantine-worthy).
- ``conform(df, schema, keep)`` — project/cast a DataFrame to exactly
  `schema`'s columns (missing → typed NULL), preserving any extra
  `keep` columns (CDC envelope). All casts are Catalyst expressions —
  they run vectorized in the JVM; Spark StructTypes map 1:1 onto Arrow
  schemas so the same diff drives Arrow-batch readers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from oec_etl_spark.schemas import WIDENING


class SchemaConflict(ValueError):
    """Incompatible (non-widenable) type change in the change stream."""


def _widen(a: T.DataType, b: T.DataType) -> T.DataType:
    if a == b:
        return a
    key = (a.simpleString(), b.simpleString())
    if key in WIDENING:
        return b if WIDENING[key] == b.simpleString() else a
    rkey = (b.simpleString(), a.simpleString())
    if rkey in WIDENING:
        return a if WIDENING[rkey] == a.simpleString() else b
    raise SchemaConflict(f"cannot reconcile {a.simpleString()} with {b.simpleString()}")


def evolve_schema(target: T.StructType, incoming: T.StructType) -> T.StructType:
    """Target schema after safely absorbing `incoming`.

    Field order: target fields first (possibly widened), then new
    incoming fields appended in their incoming order — matches Iceberg
    ``ALTER TABLE ADD COLUMN`` semantics.
    """
    by_name = {f.name: f for f in incoming.fields}
    out: list[T.StructField] = []
    for f in target.fields:
        inc = by_name.pop(f.name, None)
        if inc is None:
            out.append(f)
        else:
            out.append(T.StructField(f.name, _widen(f.dataType, inc.dataType), f.nullable or inc.nullable))
    out.extend(T.StructField(f.name, f.dataType, True) for f in incoming.fields if f.name in by_name)
    return T.StructType(out)


def conform(df: DataFrame, schema: T.StructType, keep: Sequence[str] = ()) -> DataFrame:
    """Project `df` onto `schema` (+ passthrough `keep` columns)."""
    cols = []
    have = set(df.columns)
    for f in schema.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    cols.extend(F.col(k) for k in keep if k in have and k not in schema.fieldNames())
    return df.select(*cols)


def payload_schema(df: DataFrame, exclude: Sequence[str]) -> T.StructType:
    """The payload portion of a change batch (envelope/lineage removed)."""
    ex = set(exclude)
    return T.StructType([f for f in df.schema.fields if f.name not in ex])
