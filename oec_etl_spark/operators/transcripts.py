"""Conversation assembly — the consumer-facing shape of the CDC target.

The engine's invariant is *per-turn text equality under stable turn
ordering* (BASELINE input_hint); this module turns that row-level
guarantee into the product downstream consumers actually want: one row
per conversation with its turns as an ordered array, ready for
tokenization / training-sample packing.

Scale shape: ONE hash aggregate keyed by conv_id. ``collect_list``
builds per-conversation arrays partition-locally before the shuffle
moves each key once, and ``sort_array`` orders turns inside the
finished array (structs compare field-by-field, and ``turn_idx`` is the
first field) — no window, no global sort, no per-key row_number pass.
A conversation's turns must fit one executor's row budget, which is the
same assumption any transcript consumer already makes.

The reference has no multi-row assembly at all (its pandas steps are
row-wise); this is new-engine surface for the transcript payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def assemble_conversations(
    table: DataFrame,
    key: str = "conv_id",
    order_col: str = "turn_idx",
    turn_cols: tuple[str, ...] = ("role", "text", "tool", "ts"),
) -> DataFrame:
    """One row per conversation: (conv_id, turns array<struct> ordered
    by turn_idx, n_turns, last_ts). Input is the live snapshot
    (``ParquetSnapshotSink.read_table()``) or any frame with the same
    columns."""
    turn = F.struct(order_col, *turn_cols)
    return table.groupBy(key).agg(
        F.sort_array(F.collect_list(turn)).alias("turns"),
        F.count(F.lit(1)).alias("n_turns"),
        F.max("ts").alias("last_ts"),
    )


def transcript_text(
    assembled: DataFrame,
    sep: str = "\n",
    out_col: str = "transcript",
) -> DataFrame:
    """Render each assembled conversation to one training-ready
    ``role: text`` string per turn (NULL text renders empty). Pure
    array expressions — stays in codegen, no Python in the row path."""
    rendered = F.array_join(
        F.transform(
            F.col("turns"),
            lambda x: F.concat(x["role"], F.lit(": "), F.coalesce(x["text"], F.lit(""))),
        ),
        sep,
    )
    return assembled.withColumn(out_col, rendered)
