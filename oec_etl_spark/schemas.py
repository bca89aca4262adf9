"""Authoritative schemas: the transcript target table and the CDC envelope.

The reference declares per-pipeline schemas as ClickHouse dtype dicts +
``pk`` + ``nullable_list`` (e.g. /root/reference/etl/trade_comtrade_monthly_pipeline.py:92-103);
here every schema is a real ``StructType`` and the primary key / ordering
metadata are module constants used by the sink (bucketing + write order)
instead of being stringly-typed load options.

Target (BASELINE.json input_hint):
  conv_id:string, turn_idx:int, role:string, text:string, tool:string, ts:timestamp
Change envelope adds: seq:long (binlog LSN), op:'I'|'U'|'D', lineage fields.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- target
KEY_COLUMNS = ("conv_id", "turn_idx")
# LWW: latest ts wins; deterministic tiebreak turn_idx then seq (north star).
ORDER_COLUMNS = ("ts", "turn_idx", "seq")

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Epoch-1 of the change stream predates the `tool` column (schema
# evolution is exercised by adding it mid-replay — the reference's only
# analogous event is an ad-hoc dtype-dict mutation,
# /root/reference/etl/countries/russia/trade_monthly_pipeline.py:61-62).
TRANSCRIPT_SCHEMA_V1 = T.StructType([f for f in TRANSCRIPT_SCHEMA.fields if f.name != "tool"])

# ------------------------------------------------------------- envelope
ENVELOPE_FIELDS = [
    T.StructField("seq", T.LongType(), False),
    T.StructField("op", T.StringType(), False),
]
LINEAGE_FIELDS = [
    T.StructField("source_file", T.StringType(), True),
    T.StructField("offset", T.LongType(), True),
]


def change_schema(payload: T.StructType = TRANSCRIPT_SCHEMA) -> T.StructType:
    """CDC change-event schema: envelope + payload + lineage."""
    return T.StructType(list(ENVELOPE_FIELDS) + list(payload.fields) + list(LINEAGE_FIELDS))


CHANGE_SCHEMA = change_schema()
CHANGE_SCHEMA_V1 = change_schema(TRANSCRIPT_SCHEMA_V1)

# Transaction-boundary metadata (Debezium transaction topic analog,
# inlined on the event): tx_id groups the events of one source-database
# transaction; tx_total is the transaction's event count, stamped by
# the binlog writer which knows the commit boundary. NULL tx_id =
# autocommit. Appended AFTER the lineage fields so segments written
# without them (every non-transactional log) read as NULL under this
# schema — the transactional reader is backward compatible.
TX_FIELDS = [
    T.StructField("tx_id", T.StringType(), True),
    T.StructField("tx_total", T.IntegerType(), True),
]
CHANGE_SCHEMA_TX = T.StructType(list(CHANGE_SCHEMA.fields) + list(TX_FIELDS))

# Internal columns the snapshot sink stores alongside the payload so the
# merge stays a semilattice (idempotent, commutative, associative):
# the winning writer's (ts, seq) and a tombstone flag.
META_SEQ = "__seq"
META_DELETED = "__deleted"
META_BUCKET = "__bucket"


def storage_schema(payload: T.StructType = TRANSCRIPT_SCHEMA) -> T.StructType:
    fields = list(payload.fields)
    fields.append(T.StructField(META_SEQ, T.LongType(), False))
    fields.append(T.StructField(META_DELETED, T.BooleanType(), False))
    return T.StructType(fields)


# Type-widening lattice for schema reconciliation (safe, lossless only).
# keys/values are DataType.simpleString() names — what _widen looks up
WIDENING: dict[tuple[str, str], str] = {
    ("smallint", "int"): "int",
    ("smallint", "bigint"): "bigint",
    ("int", "bigint"): "bigint",
    ("float", "double"): "double",
    ("int", "double"): "double",
    ("bigint", "double"): "double",
    ("date", "timestamp"): "timestamp",
}
