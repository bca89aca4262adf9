"""Transaction-boundary gate: atomic apply of multi-event transactions.

Debezium exposes source-database transaction metadata (transaction id +
total event count per tx) so a consumer can reassemble commit-atomic
units; the reference has no analog — its batch loads are implicitly
"atomic" because each month is one pandas DataFrame written in one shot
(/root/reference/etl/trade_comtrade_monthly_pipeline.py:120-135). A
streaming CDC apply loses that for free: a transaction's events can
straddle a micro-batch boundary (a segment split mid-tx), and a reader
of the intermediate snapshot would see a TORN transaction.

This gate restores commit atomicity as a streaming stage in front of
the merge:

- Change events MAY carry ``tx_id`` (string) and ``tx_total`` (the
  transaction's event count, stamped by the binlog writer which knows
  the commit boundary). NULL ``tx_id`` = autocommit, applied
  immediately — the gate is pay-as-you-go.
- A transaction is released to the merge only when all of its events
  have arrived: ``countDistinct(seq) >= max(tx_total)`` over the
  accumulated rows (distinct-by-seq, so at-least-once redelivery never
  double-counts). Until then its rows are HELD in a small state store
  and the table shows none of its effects.
- Released tx ids are remembered in a LEDGER for ``ledger_batches``
  batches: a duplicate of an already-released event redelivered later
  matches the ledger and flows straight to the (idempotent, LWW)
  merge instead of forming a ghost forever-incomplete transaction.
- A transaction still incomplete ``timeout_batches`` after its first
  event arrived is expired to the DLQ with reason ``tx_timeout`` —
  a torn apply is never forced; the operator decides (requeue strips
  tx columns, so a manual requeue applies the fragment explicitly).

Crash safety / exactly-once: state is written per batch to
``state_dir/batch-<id>`` via an atomic directory rename BEFORE the
merge runs. Batch ids are the streaming checkpoint's, so a crash
between state write and merge commit redelivers the SAME batch id with
the SAME input files; the gate deletes any state at/above the
redelivered id and recomputes it deterministically from the previous
state — the rewritten state is identical, and the sink's epoch guard
handles the merge side. State at ids below the previous batch is GC'd
when the next batch starts (the stream only advances past a batch
after its foreachBatch succeeded, so older state is unreachable).

Scale: the completeness verdict is a slim aggregate (tx_id → three
longs) over batch ∪ pending; pending is bounded by in-flight
transactions (transport disorder × tx size, plus the timeout bound),
the ledger by released-tx ids within the horizon — both tiny next to
the batch. Everything else is one filter/join pass, no per-row Python.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TX_COLUMNS = ("tx_id", "tx_total")
_FIRST = "__tx_first_batch"

_LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("tx_id", T.StringType(), False),
        T.StructField("released_batch", T.LongType(), False),
    ]
)


@dataclass
class TxnStats:
    rows_tx: int = 0  # tx-carrying rows in the batch (before gating)
    rows_tx_held: int = 0  # rows pending after this batch (all incomplete txs)
    txs_pending: int = 0  # distinct incomplete transactions held
    rows_tx_expired: int = 0  # rows DLQ'd as tx_timeout this batch
    txs_released: int = 0  # transactions whose hold ended this batch


class TxnGate:
    """One gate instance per stream (state_dir is per-pipeline)."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        timeout_batches: int | None = None,
        ledger_batches: int = 32,
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.timeout_batches = timeout_batches
        self.ledger_batches = ledger_batches
        self._cached: list[DataFrame] = []

    def finish(self) -> None:
        """Release the batch-scoped caches pinned by ``apply`` — call
        AFTER the merge consumed the released rows (the released plan
        reads through them; unpersisting earlier would recompute the
        verdict join once per downstream consumer)."""
        for df in self._cached:
            df.unpersist()
        self._cached.clear()

    # ---------------------------------------------------------- state io
    def _state_ids(self) -> list[int]:
        if not os.path.isdir(self.state_dir):
            return []
        out = []
        for name in os.listdir(self.state_dir):
            if name.startswith("batch-") and not name.endswith(".tmp"):
                try:
                    out.append(int(name.split("-", 1)[1]))
                except ValueError:
                    continue
        return sorted(out)

    def _read_state(self, batch_id: int, row_schema: T.StructType):
        """(pending rows, ledger) as of AFTER ``batch_id`` (empty DFs
        when no state exists). ``row_schema`` = batch schema + _FIRST."""
        d = os.path.join(self.state_dir, f"batch-{batch_id}")
        pend_d, ledg_d = os.path.join(d, "pending"), os.path.join(d, "ledger")
        pend = (
            self.spark.read.schema(row_schema).parquet(pend_d)
            if os.path.isdir(pend_d)
            else self.spark.createDataFrame([], row_schema)
        )
        ledg = (
            self.spark.read.schema(_LEDGER_SCHEMA).parquet(ledg_d)
            if os.path.isdir(ledg_d)
            else self.spark.createDataFrame([], _LEDGER_SCHEMA)
        )
        return pend, ledg

    def _write_state(self, batch_id: int, pending: DataFrame, ledger: DataFrame) -> None:
        """Atomic: materialize under batch-<id>.tmp, then one rename."""
        tmp = os.path.join(self.state_dir, f"batch-{batch_id}.tmp")
        final = os.path.join(self.state_dir, f"batch-{batch_id}")
        shutil.rmtree(tmp, ignore_errors=True)
        # state is tiny by design (in-flight txs + ledger) — one file each
        pending.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "pending"))
        ledger.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "ledger"))
        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)

    # -------------------------------------------------------------- gate
    def apply(self, bdf: DataFrame, batch_id: int) -> tuple[DataFrame, DataFrame, TxnStats]:
        """Gate one micro-batch. Returns ``(released, expired, stats)``:
        ``released`` has the tx columns STRIPPED and is ready for the
        normal quarantine → merge path; ``expired`` rows (tx_timeout)
        keep the change columns (tx columns stripped) for the DLQ.
        State for ``batch_id`` is durably written before returning."""
        stats = TxnStats()
        row_schema = T.StructType(
            list(bdf.schema.fields) + [T.StructField(_FIRST, T.LongType(), False)]
        )
        ids = self._state_ids()
        # crashed-attempt state at/above this id is stale: recompute
        # deterministically from the previous batch's state
        for i in ids:
            if i >= batch_id:
                shutil.rmtree(os.path.join(self.state_dir, f"batch-{i}"), ignore_errors=True)
        prev = max((i for i in ids if i < batch_id), default=None)
        # GC unreachable history: the stream advanced past `prev`, so
        # anything older can never be the recompute base again
        for i in ids:
            if prev is not None and i < prev:
                shutil.rmtree(os.path.join(self.state_dir, f"batch-{i}"), ignore_errors=True)
        if prev is not None:
            pending, ledger = self._read_state(prev, row_schema)
        else:
            pending = self.spark.createDataFrame([], row_schema)
            ledger = self.spark.createDataFrame([], _LEDGER_SCHEMA)

        plain = [c for c in bdf.columns if c not in TX_COLUMNS]
        auto = bdf.filter(F.col("tx_id").isNull()).select(*plain)
        cur = (
            bdf.filter(F.col("tx_id").isNotNull())
            .withColumn(_FIRST, F.lit(batch_id).cast("long"))
            .unionByName(pending)
            .cache()
        )
        stats.rows_tx = cur.filter(F.col(_FIRST) == batch_id).count()  # also pins the cache
        if stats.rows_tx == 0 and pending.isEmpty():
            # pure-autocommit batch with no carried state: nothing to do
            # beyond rolling the state forward (ledger ages out)
            ledger = ledger.filter(
                F.col("released_batch") >= F.lit(batch_id - self.ledger_batches)
            )
            self._write_state(batch_id, cur.limit(0), ledger)
            cur.unpersist()
            empty = bdf.limit(0).select(*plain)
            return auto, empty, stats
        self._cached.append(cur)

        # -- per-transaction verdict (slim aggregate) ---------------------
        verdict = (
            cur.groupBy("tx_id")
            .agg(
                F.countDistinct("seq").alias("__n"),
                F.max("tx_total").alias("__total"),
                F.min(_FIRST).alias("__first"),
            )
            .withColumn(
                "__complete",
                F.col("__total").isNotNull() & (F.col("__n") >= F.col("__total")),
            )
        )
        if self.timeout_batches is not None:
            verdict = verdict.withColumn(
                "__expired",
                ~F.col("__complete")
                & (F.lit(batch_id) - F.col("__first") >= F.lit(self.timeout_batches)),
            )
        else:
            verdict = verdict.withColumn("__expired", F.lit(False))
        # already-released txs (late duplicates): release straight through
        # — the merge is idempotent, a re-applied event is an LWW no-op
        verdict = (
            verdict.join(ledger.withColumnRenamed("tx_id", "__ltx"),
                         F.col("tx_id") == F.col("__ltx"), "left")
            .withColumn("__complete", F.col("__complete") | F.col("__ltx").isNotNull())
            .select("tx_id", "__complete", "__expired")
            .cache()
        )
        newly = [
            r["tx_id"]
            for r in verdict.filter(F.col("__complete")).select("tx_id").collect()
        ]  # released OR ledger-matched this batch; bounded by in-flight txs
        stats.txs_released = len(newly)
        tagged = cur.join(verdict, "tx_id", "left")
        released = auto.unionByName(
            tagged.filter(F.col("__complete")).select(*plain)
        )
        expired = tagged.filter(F.col("__expired")).select(*plain)
        new_pending = tagged.filter(
            ~F.col("__complete") & ~F.col("__expired")
        ).select(*cur.columns)
        new_ledger = (
            ledger.filter(F.col("released_batch") >= F.lit(batch_id - self.ledger_batches))
            .unionByName(
                self.spark.createDataFrame(
                    [(t, batch_id) for t in newly], _LEDGER_SCHEMA
                )
            )
            .groupBy("tx_id")
            .agg(F.max("released_batch").alias("released_batch"))
        )
        self._cached.append(verdict)
        self._write_state(batch_id, new_pending, new_ledger)
        # counts come from the just-written (tiny) state, not a replan
        wp, _ = self._read_state(batch_id, row_schema)
        stats.rows_tx_held = wp.count()
        stats.txs_pending = wp.select("tx_id").distinct().count()
        stats.rows_tx_expired = expired.count()
        return released, expired, stats
