"""Regression tests for operator edge-case semantics (round-2 ADVICE).

1. A schema-legal change event with NULL ts must survive BOTH LWW
   strategies (the hash path's winner join must be null-safe).
2. At-least-once redeliveries of one event in a batch that lacks
   source_file/offset lineage must still produce exactly one stored row
   (sink falls back to the sort strategy).
3. As-of join must carry ALL right columns from the SAME (latest) right
   row, including legitimately-NULL values — never stitch columns from
   different right rows.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F
from pyspark.sql import types as T

from oec_etl_spark.operators.asof import asof_join
from oec_etl_spark.operators.lww import lww_reduce, lww_reduce_hash
from oec_etl_spark.schemas import CHANGE_SCHEMA, ENVELOPE_FIELDS, TRANSCRIPT_SCHEMA
from oec_etl_spark.streaming.sink import ParquetSnapshotSink


def _ev(conv, turn, seq, op="I", ts=None, text="t", source_file="s0", offset=0):
    return {
        "seq": seq, "op": op, "conv_id": conv, "turn_idx": turn,
        "role": "user", "text": text, "tool": None, "ts": ts,
        "source_file": source_file, "offset": offset,
    }


def test_lww_strategies_agree_on_null_ts(spark):
    rows = [
        _ev("c1", 0, 1, ts=None, text="null-ts row"),  # the only event for its key
        _ev("c2", 0, 2, ts=datetime(2024, 1, 1, tzinfo=timezone.utc), text="a"),
        _ev("c2", 0, 3, ts=None, text="older null loses"),
    ]
    df = spark.createDataFrame(rows, CHANGE_SCHEMA)
    srt = {(r["conv_id"], r["turn_idx"]): r["text"]
           for r in lww_reduce(df, order=("ts", "seq", "offset")).collect()}
    hsh = {(r["conv_id"], r["turn_idx"]): r["text"]
           for r in lww_reduce_hash(df, order=("ts", "seq", "offset")).collect()}
    assert srt == hsh
    assert srt[("c1", 0)] == "null-ts row"  # null-ts key not silently dropped
    assert srt[("c2", 0)] == "a"  # non-null ts beats null ts (nulls-smallest)


def test_sink_keeps_null_ts_event(spark, tmp_path):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=4)  # default: hash
    df = spark.createDataFrame([_ev("c1", 0, 1, ts=None)], CHANGE_SCHEMA)
    sink.merge(df, batch_id=0)
    got = sink.read_table().collect()
    assert len(got) == 1 and got[0]["conv_id"] == "c1" and got[0]["ts"] is None


def test_duplicate_redelivery_without_lineage_columns(spark, tmp_path):
    """Two identical deliveries of one event, no source_file/offset: the
    snapshot must hold ONE row for the key (merge auto-falls back to the
    sort strategy, whose max_by collapses exact duplicates)."""
    bare = T.StructType(list(ENVELOPE_FIELDS) + list(TRANSCRIPT_SCHEMA.fields))
    ev = {"seq": 7, "op": "I", "conv_id": "c1", "turn_idx": 0, "role": "user",
          "text": "hello", "tool": None, "ts": datetime(2024, 1, 1, tzinfo=timezone.utc)}
    df = spark.createDataFrame([ev, dict(ev)], bare)  # redelivered twice
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=4, merge_strategy="hash")
    rec = sink.merge(df, batch_id=0)
    assert rec.merge_strategy == "sort"  # fallback recorded in lineage
    assert sink.read_table().count() == 1


def test_duplicate_redelivery_with_null_lineage_values(spark, tmp_path):
    """Lineage columns present but NULL per row — same hazard, same
    fallback (detected row-wise in the batch-stats pass)."""
    ev = _ev("c1", 0, 7, ts=datetime(2024, 1, 1, tzinfo=timezone.utc),
             source_file=None, offset=None)
    df = spark.createDataFrame([ev, dict(ev)], CHANGE_SCHEMA)
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=4, merge_strategy="hash")
    rec = sink.merge(df, batch_id=0)
    assert rec.merge_strategy == "sort"
    assert sink.read_table().count() == 1


def test_asof_carries_nulls_from_single_latest_row(spark):
    """Right rows (ts=1, value=5.0, eid=100) and (ts=5, value=NULL,
    eid=200): a left row at ts=6 must see (NULL, 200) — the latest right
    row verbatim — not (5.0, 200), a row that never existed."""
    left = spark.createDataFrame([("k", 6, "L1")], "k string, ts long, tag string")
    right = spark.createDataFrame(
        [("k", 1, 5.0, 100), ("k", 5, None, 200)],
        "k string, ts long, value double, eid long",
    )
    out = asof_join(left, right, on="k", ts="ts", right_cols=["value", "eid"]).collect()
    assert len(out) == 1
    assert out[0]["value_asof"] is None
    assert out[0]["eid_asof"] == 200
    # and a left row before any right row sees all-NULL carried columns
    left2 = spark.createDataFrame([("k", 0, "L0")], "k string, ts long, tag string")
    out2 = asof_join(left2, right, on="k", ts="ts", right_cols=["value", "eid"]).collect()
    assert out2[0]["value_asof"] is None and out2[0]["eid_asof"] is None


# ---------------------------------------------------------------- sampling
def test_hash_split_deterministic_and_partition_invariant(spark):
    from oec_etl_spark.operators.sampling import hash_split

    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = hash_split(df, "doc_id", splits).collect()
    b = hash_split(df.repartition(17), "doc_id", splits).collect()
    assert {(r["doc_id"], r["split"]) for r in a} == {(r["doc_id"], r["split"]) for r in b}
    frac = {s: sum(1 for r in a if r["split"] == s) / len(a) for s in splits}
    for name, target in splits.items():
        assert abs(frac[name] - target) < 0.03, (name, frac[name])


def test_hash_split_appends_are_stable(spark):
    """Rows hashed later (a corpus append) never change earlier rows'
    assignment — the property random-split lacks."""
    from oec_etl_spark.operators.sampling import hash_split

    splits = {"train": 0.8, "test": 0.2}
    small = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 3000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(small, "doc_id", splits).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(big, "doc_id", splits).collect()}
    assert all(b[k] == v for k, v in a.items())


def test_hash_sample_is_subset_semantics(spark):
    from oec_etl_spark.operators.sampling import hash_sample

    df = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    kept10 = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.10, seed="x").collect()}
    kept30 = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.30, seed="x").collect()}
    assert kept10 <= kept30  # nested samples: raising the rate only adds rows
    assert abs(len(kept30) / 4000 - 0.30) < 0.03


def test_hash_split_fraction_validation(spark):
    import pytest

    from oec_etl_spark.operators.sampling import hash_split

    df = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", {"a": 0.5, "b": 0.2})


def test_stratified_sample_rates_and_monotone_nesting(spark):
    """Per-stratum rates hold (±3%), strata without a rate pass whole,
    and lowering a stratum's rate only REMOVES rows (nested kept sets —
    the rebalanced corpus stays a subset of the previous cut)."""
    from oec_etl_spark.operators.sampling import stratified_sample

    df = (
        spark.range(0, 6000)
        .withColumnRenamed("id", "doc_id")
        .withColumn("lang", F.element_at(F.array(F.lit("en"), F.lit("en"), F.lit("de")),
                                         (F.col("doc_id") % 3 + 1).cast("int")))
    )
    kept = stratified_sample(df, "lang", {"en": 0.25}, id_col="doc_id").collect()
    n_en_total = 4000
    n_en = sum(1 for r in kept if r["lang"] == "en")
    n_de = sum(1 for r in kept if r["lang"] == "de")
    assert n_de == 2000  # no rate → kept whole
    assert abs(n_en / n_en_total - 0.25) < 0.03
    tighter = stratified_sample(df, "lang", {"en": 0.10}, id_col="doc_id").collect()
    ids_wide = {r["doc_id"] for r in kept}
    ids_tight = {r["doc_id"] for r in tighter}
    assert ids_tight < ids_wide  # strictly nested
