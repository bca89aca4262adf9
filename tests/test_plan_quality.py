"""Physical-plan quality gates.

Correctness says the query returns the right rows; these tests pin the
*plan shape* that keeps it right-and-fast at 100 TB: filters pushed
into the parquet scan, projections pruned to the read schema, small
dims broadcast (no shuffle join), codegen on the hot path, and zero
row-at-a-time Python UDFs anywhere in the registry.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oec_etl_spark.plans.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _plan(df, mode="formatted"):
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def test_filter_pushdown_reaches_scan(spark):
    df = REGISTRY["pricing_summary"].build(spark, SF)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_column_pruning_reaches_scan(spark):
    df = REGISTRY["pricing_summary"].build(spark, SF)
    plan = _plan(df)
    # Q1 touches 7 of 16 lineitem columns; the parquet ReadSchema must
    # not contain untouched ones.
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_quantity" in read and "l_orderkey" not in read and "l_comment" not in read


@pytest.mark.parametrize("name", ["revenue_by_nation", "top_parts_per_brand", "region_customer_rollup"])
def test_dim_joins_are_broadcast(spark, name):
    plan = _plan(REGISTRY[name].build(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_lww_sort_path_is_partial_aggregate_not_window(spark):
    """The sort-strategy reduce must be an aggregate with a map-side
    partial (combine before shuffle), never a row_number window (which
    would shuffle + sort every event with no combining)."""
    from oec_etl_spark.operators.lww import lww_reduce
    from oec_etl_spark.schemas import CHANGE_SCHEMA

    df = lww_reduce(spark.createDataFrame([], CHANGE_SCHEMA))
    plan = _plan(df, "simple")
    assert "partial_max_by" in plan  # map-side combine
    assert "Window" not in plan


def test_lww_hash_path_never_sorts_payload(spark):
    """The default (hash) reduce: winners found on a slim projection,
    payload fetched by a LEFT SEMI shuffled-hash join — no sort or
    aggregation ever touches a payload row."""
    from oec_etl_spark.operators.lww import lww_reduce_hash
    from oec_etl_spark.schemas import CHANGE_SCHEMA

    df = lww_reduce_hash(spark.createDataFrame([], CHANGE_SCHEMA), order=("ts", "seq", "offset"))
    plan = _plan(df, "simple")
    assert "ShuffledHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan and "Window" not in plan
    # the only sorts allowed are under the slim aggregate (keys+order),
    # whose rows carry no text column
    for chunk in plan.split("Sort ")[1:]:
        assert "text" not in chunk.split("\n")[0]


def test_whole_stage_codegen_on_hot_path(spark):
    df = REGISTRY["pricing_summary"].build(spark, SF)
    df.collect()  # AQE annotates codegen ids only once stages finalize
    assert "codegen id" in _plan(df)


def test_no_row_at_a_time_python_udfs_anywhere(spark):
    """North-rule ban: BatchEvalPython (per-row Python) must appear in
    no registered query plan. ArrowEvalPython / mapInPandas (vectorized)
    are the only allowed Python boundaries."""
    offenders = []
    for name, spec in REGISTRY.items():
        plan = _plan(spec.build(spark, SF), "simple")
        if "BatchEvalPython" in plan:
            offenders.append(name)
    assert offenders == []


def test_asof_join_is_single_shuffle(spark):
    """The as-of join must shuffle each side once (union + one window),
    never build a per-key cross product (no joins at all in the plan)."""
    plan = _plan(REGISTRY["events_asof_enrich"].build(spark, SF), "simple")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_no_cartesian_product_in_any_registered_plan(spark):
    """Scale gate: no registered query may contain a CartesianProduct
    (all-pairs) join. BroadcastNestedLoopJoin is permitted — that is the
    intentional small-side-broadcast shape (range join, centroid
    assignment); an unbroadcast cartesian is always a 100×-scale killer."""
    offenders = []
    for name, spec in REGISTRY.items():
        plan = _plan(spec.build(spark, SF), "simple")
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert offenders == []


def test_ivf_topk_scan_prunes_to_probed_clusters(spark):
    """The IVF query must read ONLY the probed partitions of the
    persisted index — partition pruning on centroid_id, not a full
    corpus re-assignment per query."""
    df = REGISTRY["ann_ivf_topk"].build(spark, SF)
    part_lines = [ln for ln in _plan(df).splitlines() if "PartitionFilters" in ln]
    # e.g. "PartitionFilters: [centroid_id#145 IN (0,3)]" — nprobe=2 of
    # 8 clusters reach the scan as a partition filter (inputFiles() is
    # pre-pruning, so the filter text is the assertable artifact)
    assert part_lines and "centroid_id" in part_lines[0]
    in_list = part_lines[0].split(" IN (")[1].split(")")[0]
    assert len(in_list.split(",")) == 2


def test_range_join_broadcasts_band_dim(spark):
    plan = _plan(REGISTRY["quantity_band_range_join"].build(spark, SF), "simple")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_chunking_is_map_only(spark):
    """doc_chunk_windows must stay a single project+explode over the
    scan — zero Exchange. At 100 TB the chunker runs at input-split
    parallelism; any shuffle here would be a planning regression."""
    plan = _plan(REGISTRY["doc_chunk_windows"].build(spark, SF))
    assert "Exchange" not in plan, plan
    assert "Generate explode" in plan or "explode" in plan


def test_mixture_window_runs_over_aggregated_rows_only(spark):
    """corpus_mixture_weights: the unpartitioned normalization window
    must sit ABOVE the per-source hash aggregate (a handful of rows),
    never over the raw corpus — i.e. exactly one pre-window shuffle,
    the groupBy's, plus the window's own single-partition exchange."""
    import re

    plan = _plan(REGISTRY["corpus_mixture_weights"].build(spark, SF))
    # formatted-mode node ids order the DETAIL section bottom-up:
    # scan -> partial agg -> exchange -> final agg -> exchange(1) -> window
    agg = min(int(m) for m in re.findall(r"\((\d+)\) HashAggregate", plan))
    win = min(int(m) for m in re.findall(r"\((\d+)\) Window", plan))
    assert agg < win, plan
    # the window's own exchange is the single-partition one, and it sits
    # between the final aggregate and the window — over #sources rows
    assert "Arguments: SinglePartition" in plan
