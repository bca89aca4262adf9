"""Snapshot audit — the A of write-audit-publish.

A staging branch is only worth having if something machine-checks it
before main fast-forwards. ``audit_snapshot`` runs the table-level
invariants a CDC target must satisfy against any committed snapshot
(typically a branch head), and ``publish_audited`` gates
``ParquetSnapshotSink.publish`` on the resulting report:

- **key uniqueness** — exactly one live row per (conv_id, turn_idx);
  a duplicate means a broken merge or a corrupt data file.
- **non-null keys** — quarantine should have rejected these upstream.
- **schema legality** — the audited schema must be a pure evolution of
  the fork-base schema (columns added or widened, never dropped or
  narrowed), i.e. ``evolve_schema(base, head) == head``.
- **bounded delete drift** — an optional ceiling on the fraction of
  base keys the branch deletes; the classic WAP tripwire for a bad
  upstream extract that tombstones half the table.
- **expectations** — user-supplied SQL predicates over the payload
  (Delta constraints / Great-Expectations analog); rows where the
  predicate is not TRUE (false OR null) count as violations.

Scale shape: one key-level partial-aggregated count shuffle (the same
shape as the engine's merge statistics), one map-only aggregate for
expectations, and — only when drift is requested — the bucketed CDF
diff join. Nothing returns more than a handful of counters to the
driver.

The reference has no audit gate at all — loads go straight to the
warehouse (``/root/reference/etl/trade_comtrade_monthly_pipeline.py``
download-run-load with no validation step); this is new-engine surface
required for operating the same ingest unattended.
"""

from __future__ import annotations

import dataclasses

from pyspark.sql import SparkSession, functions as F, types as T

from oec_etl_spark.schemas import KEY_COLUMNS
from oec_etl_spark.streaming.reconcile import SchemaConflict, evolve_schema
from oec_etl_spark.streaming.sink import ParquetSnapshotSink


class AuditFailed(RuntimeError):
    """Raised by ``publish_audited`` when the branch fails its audit.
    Carries the full report; the branch is left in place for
    inspection (``drop_branch`` to abandon it)."""

    def __init__(self, report: "AuditReport"):
        super().__init__(f"audit failed: {'; '.join(report.failures)}")
        self.report = report


@dataclasses.dataclass
class AuditReport:
    ref: str
    version: int
    base_version: int | None
    rows: int
    dup_key_rows: int
    null_key_rows: int
    schema_ok: bool
    inserts: int | None = None
    updates: int | None = None
    deletes: int | None = None
    delete_frac: float | None = None
    expectation_violations: dict[str, int] = dataclasses.field(default_factory=dict)
    failures: list[str] = dataclasses.field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.failures

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["ok"] = self.ok
        return d


def audit_snapshot(
    spark: SparkSession,
    root: str,
    branch: str | None = None,
    n_buckets: int = 16,
    base_version: int | None = None,
    max_delete_frac: float | None = None,
    expectations: dict[str, str] | None = None,
) -> AuditReport:
    """Audit the head snapshot of ``branch`` (or main when ``None``).

    ``base_version`` defaults to the branch's fork base, enabling the
    schema-legality and delete-drift checks; auditing main without a
    base runs only the self-contained invariants (uniqueness, null
    keys, expectations)."""
    sink = ParquetSnapshotSink(spark, root, n_buckets, branch=branch)
    man = sink.load_manifest()
    if man is None:
        raise FileNotFoundError(f"no committed snapshot under {root}")
    head = int(man["version"])
    if base_version is None and branch is not None:
        base_version = int(sink.branches()[branch]["base"])

    table = sink.read_table()

    # One key-level count shuffle yields rows / duplicate-key rows /
    # null-key rows together (null keys group like any other value).
    null_key = F.lit(False)
    for k in KEY_COLUMNS:
        null_key = null_key | F.col(k).isNull()
    stats = (
        table.groupBy(*KEY_COLUMNS)
        .agg(F.count(F.lit(1)).alias("cnt"), F.first(null_key).alias("nullk"))
        .agg(
            F.coalesce(F.sum("cnt"), F.lit(0)).alias("rows"),
            F.coalesce(F.sum(F.when(F.col("cnt") > 1, F.col("cnt"))), F.lit(0)).alias("dup"),
            F.coalesce(F.sum(F.when(F.col("nullk"), F.col("cnt"))), F.lit(0)).alias("nullrows"),
        )
        .collect()[0]
    )

    report = AuditReport(
        ref=branch or "CURRENT",
        version=head,
        base_version=base_version,
        rows=int(stats["rows"]),
        dup_key_rows=int(stats["dup"]),
        null_key_rows=int(stats["nullrows"]),
        schema_ok=True,
    )
    if report.dup_key_rows:
        report.failures.append(f"{report.dup_key_rows} rows share a duplicated key")
    if report.null_key_rows:
        report.failures.append(f"{report.null_key_rows} rows have a null key column")

    # Expectations: one map-only aggregate; a predicate that is not
    # TRUE (false or null) marks the row as a violation — a null
    # answer means the data couldn't prove the invariant, which an
    # audit gate must treat as failure, not as a pass.
    for name, pred in (expectations or {}).items():
        bad = F.coalesce(
            F.sum(F.when(F.expr(pred), F.lit(0)).otherwise(F.lit(1))), F.lit(0)
        ).alias("bad")
        n = int(table.agg(bad).collect()[0]["bad"])
        report.expectation_violations[name] = n
        if n:
            report.failures.append(f"expectation {name!r} violated by {n} rows")

    if base_version is not None:
        base_man = sink.load_manifest(base_version)
        base_schema = T.StructType.fromJson(base_man["schema"])
        head_schema = T.StructType.fromJson(man["schema"])
        try:
            report.schema_ok = evolve_schema(base_schema, head_schema) == head_schema
        except SchemaConflict:
            report.schema_ok = False
        if not report.schema_ok:
            report.failures.append(
                f"schema of v{head} is not a pure evolution of v{base_version} "
                f"(column dropped, narrowed, or incompatibly retyped)"
            )

        # Precise drift via the CDF diff (bucket-co-located join).
        kinds = {
            r["_change_type"]: int(r["n"])
            for r in sink.changelog(base_version, head)
            .groupBy("_change_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        report.inserts = kinds.get("insert", 0)
        report.updates = kinds.get("update_postimage", 0)
        report.deletes = kinds.get("delete", 0)
        base_rows = report.rows - report.inserts + report.deletes
        report.delete_frac = report.deletes / base_rows if base_rows else 0.0
        if max_delete_frac is not None and report.delete_frac > max_delete_frac:
            report.failures.append(
                f"deletes {report.deletes}/{base_rows} = {report.delete_frac:.3f} "
                f"of base keys exceeds max_delete_frac={max_delete_frac}"
            )
    return report


def publish_audited(
    spark: SparkSession,
    root: str,
    name: str,
    n_buckets: int = 16,
    max_delete_frac: float | None = None,
    expectations: dict[str, str] | None = None,
) -> tuple[AuditReport, int]:
    """Audit branch ``name`` and fast-forward main only on a clean
    report. On failure raises :class:`AuditFailed` and leaves both the
    branch (for inspection) and main (unchanged) intact."""
    report = audit_snapshot(
        spark,
        root,
        branch=name,
        n_buckets=n_buckets,
        max_delete_frac=max_delete_frac,
        expectations=expectations,
    )
    if not report.ok:
        raise AuditFailed(report)
    version = ParquetSnapshotSink(spark, root, n_buckets).publish(name)
    return report, version
