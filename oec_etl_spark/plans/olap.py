"""Declarative OLAP drilldown/cut queries — the tesseract serving shape.

The reference's entire purpose is loading star-schema tables consumed by
tesseract queries of the form ``?cube=...&measures=...&drilldowns=...
&<Level>=<cut>`` (/root/reference/README.md:67-74). The reference defers
those joins/aggregations to ClickHouse at query time; here the same
declarative request compiles to a Spark plan directly:

- each drilldown/cut level resolves through its dimension's join chain
  (conformed dims, broadcast — they are small by construction);
- cuts are pushed as filters (on the fact FK when the cut targets the
  dim key itself, so they prune at the scan);
- measures are aggregate expressions over the fact.

At 100 TB the fact scan is the only large input; Catalyst handles
column pruning + pushdown, and every dim join stays a broadcast hash
join (asserted in tests/test_plan_quality.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Level:
    """A drilldown level: how to get from the fact to a labeled column."""

    table: str | None  # dim table (None = level lives on the joined fact)
    fact_key: str  # FK on the (already-joined) fact side
    dim_key: str | None  # PK on the dim side
    label: str  # the column exposed for drilldown/cut
    via: str | None = None  # upstream level name to join through (snowflake)
    expr: str | None = None  # derived level: SQL expr computed as `label`


@dataclass(frozen=True)
class CubeDef:
    fact: str
    levels: dict[str, Level]
    measures: dict[str, Column] = field(default_factory=dict)


def _resolve(spark, sf_dir: str, cube: CubeDef, names: list[str], load) -> tuple[DataFrame, dict[str, str]]:
    """Join the fact with every dim needed by `names`; returns the joined
    frame and name→output-column mapping."""
    df = load(spark, sf_dir, cube.fact)
    joined: set[str] = set()
    out: dict[str, str] = {}

    def ensure(name: str):
        lvl = cube.levels[name]
        nonlocal df
        if lvl.via and lvl.via not in joined:
            ensure(lvl.via)
        if lvl.table is not None and name not in joined:
            dim = load(spark, sf_dir, lvl.table)
            df = df.join(F.broadcast(dim), df[lvl.fact_key] == dim[lvl.dim_key])
            joined.add(name)
        if lvl.expr is not None and lvl.label not in df.columns:
            df = df.withColumn(lvl.label, F.expr(lvl.expr))
        out[name] = lvl.label

    for n in names:
        ensure(n)
    return df, out


def drilldown(
    spark: SparkSession,
    sf_dir: str,
    cube: CubeDef,
    drilldowns: list[str],
    measures: list[str],
    cuts: dict[str, object] | None = None,
    load=None,
) -> DataFrame:
    """Execute a tesseract-style request: group by the drilldown levels,
    aggregate the measures, filter by the cuts."""
    if load is None:
        from oec_etl_spark.plans.queries import load as _default_load

        load = _default_load
    cuts = cuts or {}
    needed = [*drilldowns, *cuts.keys()]
    df, cols = _resolve(spark, sf_dir, cube, needed, load)
    for name, value in cuts.items():
        values = value if isinstance(value, (list, tuple)) else [value]
        df = df.filter(F.col(cols[name]).isin(list(values)))
    aggs = [cube.measures[m].alias(m) for m in measures]
    return df.groupBy(*[F.col(cols[d]).alias(d) for d in drilldowns]).agg(*aggs)
