"""The named query registry: one entry per implemented operator.

Each ``QuerySpec`` pairs a Spark DataFrame builder with the equivalent
ANSI SQL for the DuckDB oracle (None for genuinely non-SQL-expressible
ops — those get the driver's weaker rows-only check). Column aliases
are kept identical on both sides because the correctness gate hashes
values under name-sorted columns.

Float discipline: every aggregated double is rounded explicitly (sums
of 2-decimal money at 2, averages at 4-6) so double-summation-order
differences between Spark and DuckDB cannot flip the value hash.
Counts are BIGINT on both sides (DuckDB ``sum(BIGINT)`` is cast down
from HUGEINT explicitly).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oec_etl_spark.functions import hs6, text as tx, zorder
from oec_etl_spark.functions.vectors import cosine
from oec_etl_spark.operators import bpe, classifier, decontam, dsir, lm
from oec_etl_spark.operators import dedup as dd
from oec_etl_spark.operators import reshape, similarity, span_dedup
from oec_etl_spark.operators.lww import lww_reduce


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    headline: bool = False  # included in bench.py's headline set
    tags: str = ""
    # Optional production-tier builder used by bench.py instead of
    # `build`: same operator, but with engine-native hashing (xxhash64)
    # where `build` must use portable md5 purely so the DuckDB oracle
    # can replicate it. The bench measures what a cluster would run.
    bench_build: Callable[[SparkSession, str], DataFrame] | None = None


REGISTRY: dict[str, QuerySpec] = {}


def _register(name: str, oracle: str | None, headline: bool = False, tags: str = "",
              bench_build: Callable[[SparkSession, str], DataFrame] | None = None):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name, fn, oracle, headline, tags, bench_build)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def ivf_index_path(sf_dir: str) -> str:
    """Scratch location for the IVF index built over an sf_dir corpus
    (testdata is read-only, so the index lives under the OS tmp dir)."""
    import tempfile

    tag = os.path.basename(sf_dir.rstrip("/")) or "corpus"
    return os.path.join(tempfile.gettempdir(), f"oec_ivf_index_{tag}")


# =====================================================================
# Reference-derived relational operators (SURVEY.md §2)
# =====================================================================

@_register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
    tags="P1 P4 agg groupBy — TPC-H Q1 shape",
)
def pricing_summary(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@_register(
    "revenue_by_nation",
    """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_lineitems
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    headline=True,
    tags="joins: shuffle fact-fact + broadcast dim — TPC-H Q5 shape",
)
def revenue_by_nation(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@_register(
    "order_priority_semijoin",
    """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05)
    GROUP BY o_orderpriority
    """,
    tags="left-semi join (EXISTS) — TPC-H Q4 shape",
)
def order_priority_semijoin(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.05)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@_register(
    "customers_without_orders",
    """
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
    tags="left-anti join (NOT EXISTS)",
)
def customers_without_orders(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@_register(
    "top_parts_per_brand",
    """
    SELECT p_brand, p_partkey, revenue, rk FROM (
      SELECT p_brand, p_partkey,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             CAST(row_number() OVER (
                PARTITION BY p_brand
                ORDER BY round(sum(l_extendedprice * (1 - l_discount)), 2) DESC, p_partkey
             ) AS INT) AS rk
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand, p_partkey)
    WHERE rk <= 3
    """,
    headline=True,
    tags="window top-k per group + broadcast join",
)
def top_parts_per_brand(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("revenue"), F.asc("p_partkey"))
    return rev.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 3)


@_register(
    "region_customer_rollup",
    """
    SELECT r_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS sum_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    tags="P14/S6 recode via broadcast-join chain (star-schema drilldown)",
)
def region_customer_rollup(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"))
    )


@_register(
    "hs6_section_rollup",
    f"""
    SELECT {hs6.hs_section_sql("CAST(substr(lpad(CAST((p_partkey * 487) % 990000 + 10000 AS VARCHAR), 6, '0'), 1, 2) AS INT)")} AS section,
           count(*) AS n_parts,
           round(sum(p_retailprice), 2) AS sum_price,
           CAST(max({hs6.hs6_id_sql("CAST((p_partkey * 487) % 990000 + 10000 AS VARCHAR)")}) AS BIGINT) AS max_hs6_id
    FROM part
    GROUP BY 1
    """,
    tags="P8/P9/P10 banded scalar lookup (hs6_converter, ref etl/util.py:1-26)",
)
def hs6_section_rollup(spark, sf_dir):
    p = load(spark, sf_dir, "part")
    code = ((F.col("p_partkey") * 487) % 990000 + 10000).cast("string")
    hs2 = F.substring(F.lpad(code, 6, "0"), 1, 2).cast("int")
    return (
        p.withColumn("section", hs6.hs_section(hs2)).withColumn("hid", hs6.hs6_id(code))
        .groupBy("section")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("p_retailprice"), 2).alias("sum_price"),
            F.max("hid").alias("max_hs6_id"),
        )
    )


@_register(
    "dim_time_generated",
    """
    SELECT CAST(y * 100 + m AS INT) AS time_id,
           CAST(y AS INT) AS year, CAST(m AS INT) AS month,
           CAST(quarter(make_date(CAST(y AS INT), CAST(m AS INT), 1)) AS INT) AS quarter,
           strftime(make_date(CAST(y AS INT), CAST(m AS INT), 1), '%B') AS month_name
    FROM generate_series(1995, 2019) t(y), generate_series(1, 12) s(m)
    """,
    tags="S4/R6/R7 generated dim (ref dim_time_pipeline.py:40-56)",
)
def dim_time_generated(spark, sf_dir):
    return reshape.generate_time_dim(spark, 1995, 2019)


@_register(
    "melt_measures",
    """
    SELECT variable, count(*) AS n, round(sum(value), 2) AS total
    FROM (
      SELECT l_orderkey, 'qty' AS variable, l_quantity AS value FROM lineitem
      UNION ALL SELECT l_orderkey, 'price', l_extendedprice FROM lineitem
      UNION ALL SELECT l_orderkey, 'discount', l_discount FROM lineitem
      UNION ALL SELECT l_orderkey, 'tax', l_tax FROM lineitem)
    GROUP BY variable
    """,
    tags="R4 unpivot via stack() (ref indicators_wdi_annual_pipeline.py:19-30 iterrows melt)",
)
def melt_measures(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").withColumnsRenamed(
        {"l_quantity": "qty", "l_extendedprice": "price", "l_discount": "discount", "l_tax": "tax"}
    )
    long = reshape.melt(li, ["l_orderkey"], ["qty", "price", "discount", "tax"])
    return long.groupBy("variable").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")
    )


@_register(
    "period_explode_months",
    """
    SELECT CAST(m AS INT) AS month, count(*) AS n_orders
    FROM (
      SELECT unnest(CASE CAST(quarter(o_orderdate) AS INT)
                    WHEN 1 THEN [1,2,3] WHEN 2 THEN [4,5,6]
                    WHEN 3 THEN [7,8,9] ELSE [10,11,12] END) AS m
      FROM orders)
    GROUP BY 1
    """,
    tags="R5 period→rows explode (ref countries/sweden/trade_monthly_pipeline.py:59-89)",
)
def period_explode_months(spark, sf_dir):
    o = load(spark, sf_dir, "orders").withColumn("q", F.quarter("o_orderdate").cast("string"))
    months = {"1": [1, 2, 3], "2": [4, 5, 6], "3": [7, 8, 9], "4": [10, 11, 12]}
    return (
        reshape.explode_periods(o, months, "q", "month")
        .groupBy("month")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@_register(
    "events_clean_recode",
    """
    SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
    FROM (SELECT event_type, CAST(props->>'$.k' AS INT) AS k
          FROM events WHERE event_type <> 'error' AND value IS NOT NULL)
    WHERE k IS NOT NULL
    GROUP BY event_type
    """,
    tags="P4/P5/P6 filter+clean + JSON envelope parse (from_json analog)",
)
def events_clean_recode(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return (
        e.filter((F.col("event_type") != "error") & F.col("value").isNotNull())
        .withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("sum_k"))
    )


# =====================================================================
# Tesseract-style OLAP drilldown/cut surface (ref README.md:67-74)
# =====================================================================

def _trade_cube():
    from oec_etl_spark.plans.olap import CubeDef, Level

    return CubeDef(
        fact="lineitem",
        levels={
            "Order": Level("orders", "l_orderkey", "o_orderkey", "o_orderkey"),
            "Customer": Level("customer", "o_custkey", "c_custkey", "c_name", via="Order"),
            "Segment": Level(None, "", None, "c_mktsegment", via="Customer"),
            "Nation": Level("nation", "c_nationkey", "n_nationkey", "n_name", via="Customer"),
            "Region": Level("region", "n_regionkey", "r_regionkey", "r_name", via="Nation"),
            "Year": Level(None, "", None, "o_year", via="Order", expr="year(o_orderdate)"),
            "Brand": Level("part", "l_partkey", "p_partkey", "p_brand"),
        },
        measures={
            "trade_value": F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2),
            "quantity": F.round(F.sum("l_quantity"), 2),
            "n_rows": F.count(F.lit(1)),
        },
    )


@_register(
    "olap_nation_year_drilldown",
    """
    SELECT n_name AS Nation, CAST(year(o_orderdate) AS INT) AS Year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS trade_value,
           round(sum(l_quantity), 2) AS quantity
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'AMERICA'
    GROUP BY 1, 2
    """,
    tags="tesseract query shape: ?drilldowns=Nation,Year&measures=...&Region=AMERICA (ref README.md:67-74)",
)
def olap_nation_year_drilldown(spark, sf_dir):
    from oec_etl_spark.plans.olap import drilldown

    out = drilldown(
        spark, sf_dir, _trade_cube(),
        drilldowns=["Nation", "Year"], measures=["trade_value", "quantity"],
        cuts={"Region": "AMERICA"},
    )
    return out.withColumn("Year", F.col("Year").cast("int"))


@_register(
    "olap_brand_cut",
    """
    SELECT p_brand AS Brand,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS trade_value,
           count(*) AS n_rows
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN part     ON l_partkey = p_partkey
    WHERE year(o_orderdate) = 1996 AND c_mktsegment = 'BUILDING'
    GROUP BY 1
    """,
    tags="tesseract query shape: ?drilldowns=Brand&Year=1996&Segment=BUILDING",
)
def olap_brand_cut(spark, sf_dir):
    from oec_etl_spark.plans.olap import drilldown

    return drilldown(
        spark, sf_dir, _trade_cube(),
        drilldowns=["Brand"], measures=["trade_value", "n_rows"],
        cuts={"Year": 1996, "Segment": "BUILDING"},
    )


# =====================================================================
# CDC semantics over the shared tables (oracle-checkable LWW/windows)
# =====================================================================

@_register(
    "events_lww_latest",
    """
    SELECT user_id, event_type AS last_type, round(value, 4) AS last_value, ts AS last_ts
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
    headline=True,
    tags="LWW core: latest-per-key with deterministic tiebreak (engine's merge reduction)",
)
def events_lww_latest(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    win = lww_reduce(e, keys=("user_id",), order=("ts", "event_id"))
    return win.select(
        "user_id",
        F.col("event_type").alias("last_type"),
        F.round("value", 4).alias("last_value"),
        F.col("ts").alias("last_ts"),
    )


@_register(
    "events_hourly_rollup",
    """
    SELECT date_trunc('hour', ts) AS hour, event_type,
           count(*) AS n, round(sum(value), 4) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    headline=True,
    tags="time-bucketed rollup (streaming tumbling-window batch analog)",
)
def events_hourly_rollup(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


@_register(
    "events_sessionize",
    """
    SELECT user_id, CAST(max(session_id) AS INT) AS n_sessions, count(*) AS n_events
    FROM (
      SELECT user_id,
             CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS session_id
      FROM (SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_sess
            FROM events))
    GROUP BY user_id
    """,
    tags="sessionization: gap>30min windows (streaming session_window batch analog)",
)
def events_sessionize(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tsm = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = tsm - F.lag(tsm).over(w)
    sess = (
        e.withColumn("new_sess", F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0))
        .withColumn("session_id", F.sum("new_sess").over(w).cast("int"))
    )
    return sess.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"), F.count(F.lit(1)).alias("n_events")
    )


@_register(
    "events_json_percentiles",
    """
    SELECT CAST(CAST(props->>'$.k' AS INT) % 10 AS INT) AS kmod,
           count(*) AS n,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 4) AS p50,
           round(percentile_cont(0.9) WITHIN GROUP (ORDER BY value), 4) AS p90
    FROM events WHERE value IS NOT NULL AND props IS NOT NULL
    GROUP BY 1
    """,
    tags="JSON envelope parse (from_json w/ schema) + exact interpolated percentiles",
)
def events_json_percentiles(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return (
        e.filter(F.col("value").isNotNull() & F.col("props").isNotNull())
        .withColumn("p", F.from_json("props", "k int"))
        .groupBy((F.col("p.k") % 10).cast("int").alias("kmod"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
        )
    )


@_register(
    "doc_array_functions",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
           list_sort(string_split(text, ' '))[1] AS first_token
    FROM documents
    """,
    tags="array functions: split/size/distinct/sort (SURVEY §2.4 scalar-function row)",
)
def doc_array_functions(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.array_sort(toks).getItem(0).alias("first_token"),
    )


# =====================================================================
# Training-data pipeline: dedup / text analysis / similarity
# =====================================================================

_SH = dd.SHINGLE_LEN

_SHINGLE_CTE = f"""
    shingles AS (
      SELECT DISTINCT doc_id,
             unnest([substr(text, CAST(i AS INT), {_SH})
                     for i in generate_series(1, len(text) - {_SH - 1})]) AS shingle
      FROM documents
    )
"""


@_register(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash, min(doc_id) AS survivor_id, count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
    tags="exact dedup: hash-groupBy survivors",
)
def dedup_exact(spark, sf_dir):
    return dd.dedup_exact(load(spark, sf_dir, "documents"))


_LSH_CTES = f"""{_SHINGLE_CTE},
    sigs AS (
      SELECT doc_id,
             {", ".join(f"min(md5(concat('{i}:', shingle))) AS mh{i}" for i in range(dd.N_MINHASH))}
      FROM shingles GROUP BY doc_id
    ),
    bands AS (
      {" UNION ALL ".join(
          f"SELECT doc_id, {b} AS band_idx, md5(concat(mh{2*b}, mh{2*b+1})) AS band_key FROM sigs"
          for b in range(dd.N_BANDS)
      )}
    ),
    lsh_pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    )"""


def _dedup_minhash_lsh_fast(spark, sf_dir):
    """Production tier: identical pipeline, xxhash64 signatures/band
    keys (fixed-width longs, codegen'd) instead of the md5 strings the
    oracle comparison requires."""
    return dd.dedup_minhash_lsh(load(spark, sf_dir, "documents"), portable_hash=False)


@_register(
    "dedup_minhash_lsh",
    f"""
    WITH {_LSH_CTES}
    SELECT doc_a, doc_b FROM lsh_pairs
    """,
    headline=True,
    tags="MinHash+LSH near-dup candidates (shingle→minhash→band→bucket-join)",
    bench_build=_dedup_minhash_lsh_fast,
)
def dedup_minhash_lsh(spark, sf_dir):
    return dd.dedup_minhash_lsh(load(spark, sf_dir, "documents"))


@_register(
    "dedup_survivors",
    f"""
    WITH RECURSIVE {_LSH_CTES},
    und AS (SELECT doc_a AS u, doc_b AS v FROM lsh_pairs
            UNION SELECT doc_b, doc_a FROM lsh_pairs),
    reach(u, v) AS (
      SELECT u, v FROM und
      UNION
      SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u
    ),
    minr AS (SELECT u, min(v) AS mv FROM reach GROUP BY u)
    SELECT d.doc_id, least(d.doc_id, coalesce(minr.mv, d.doc_id)) AS survivor_id
    FROM documents d LEFT JOIN minr ON minr.u = d.doc_id
    """,
    tags="near-dup survivor resolution: iterative connected components (min-label propagation) vs recursive-CTE closure oracle",
)
def dedup_survivors(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return dd.dedup_survivors(docs, dd.dedup_minhash_lsh(docs))


@_register(
    "dedup_survivors_twophase",
    REGISTRY["dedup_survivors"].oracle,  # identical fixpoint, different engine
    tags="survivor resolution via large-star/small-star CC (O(log n) rounds, billion-edge regime)",
)
def dedup_survivors_twophase(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return dd.dedup_survivors(docs, dd.dedup_minhash_lsh(docs), algorithm="two-phase")


@_register(
    "ngram_jaccard_pairs",
    f"""
    WITH {_SHINGLE_CTE},
    rare AS (SELECT shingle FROM shingles GROUP BY shingle HAVING count(*) <= {dd.MAX_SHINGLE_DF}),
    sh AS (SELECT s.doc_id, s.shingle FROM shingles s JOIN rare USING (shingle)),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.2
    """,
    tags="n-gram Jaccard verify with stop-shingle DF cap (skew guard)",
)
def ngram_jaccard_pairs(spark, sf_dir):
    return dd.ngram_jaccard_pairs(load(spark, sf_dir, "documents"), threshold=0.2)


@_register(
    "doc_quality",
    f"""
    SELECT doc_id,
           {tx.n_tokens_sql("text")} AS n_tokens,
           {tx.quality_score_sql("text")} AS quality
    FROM documents
    """,
    tags="quality scoring: length/stopword/punctuation heuristics",
)
def doc_quality(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        tx.n_tokens(F.col("text")).alias("n_tokens"),
        tx.quality_score(F.col("text")).alias("quality"),
    )


@_register(
    "lang_id_confusion",
    f"""
    SELECT lang, {tx.predict_lang_sql("text")} AS pred_lang, count(*) AS n
    FROM documents GROUP BY 1, 2
    """,
    tags="language-ID marker heuristic (confusion matrix vs labels)",
)
def lang_id_confusion(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return (
        d.select("lang", tx.predict_lang(F.col("text")).alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_register(
    "doc_fingerprints",
    f"""
    SELECT doc_id, {tx.doc_fingerprint_sql("text")} AS fingerprint FROM documents
    """,
    tags="document fingerprinting (normalized content hash)",
)
def doc_fingerprints(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", tx.doc_fingerprint(F.col("text")).alias("fingerprint"))


_SH_HEX = "0123456789abcdef"
_SH_H = " + ".join(
    f"(strpos('{_SH_HEX}', substr(m, {i + 1}, 1)) - 1) * {16 ** (7 - i)}" for i in range(8)
)
_SH_BITS = 32


@_register(
    "simhash_docs",
    f"""
    WITH toks AS (SELECT doc_id, md5(unnest(string_split(text, ' '))) AS m FROM documents),
    h AS (SELECT doc_id, CAST({_SH_H} AS BIGINT) AS h FROM toks),
    votes AS (SELECT doc_id,
      {", ".join(f"sum(CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END) AS v{b}" for b in range(_SH_BITS))}
      FROM h GROUP BY doc_id)
    SELECT doc_id, CAST({" + ".join(f"CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(_SH_BITS))} AS BIGINT) AS simhash
    FROM votes
    """,
    tags="SimHash 32-bit fingerprint via bitwise vote aggregation (portable md5 hash for oracle parity)",
)
def simhash_docs(spark, sf_dir):
    return dd.simhash(load(spark, sf_dir, "documents"), portable_hash=True)


@_register(
    "ann_brute_topk",
    """
    SELECT e.vec_id,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 4) AS cos
    FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 4) DESC, e.vec_id
    LIMIT 10
    """,
    headline=True,
    tags="exact cosine top-k (ANN baseline)",
)
def ann_brute_topk(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    out = emb.select(
        "vec_id",
        F.round(cosine(F.col("embedding"), F.array(*[F.lit(float(x)) for x in qvec])), 4).alias("cos"),
    )
    return out.orderBy(F.desc("cos"), F.asc("vec_id")).limit(10)


@_register(
    "ann_ivf_assign",
    """
    SELECT vec_id, centroid_id FROM (
      SELECT e.vec_id, CAST(c.vec_id AS INT) AS centroid_id,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) DESC,
                        c.vec_id
             ) AS rn
      FROM embeddings e, (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8) c)
    WHERE rn = 1
    """,
    tags="IVF cluster assignment via broadcast centroids (ANN scale path)",
)
def ann_ivf_assign(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid")
    )
    out = similarity.ivf_assign(emb, cents)
    return out.select("vec_id", F.col("centroid_id").cast("int").alias("centroid_id"))


# Banded sign-LSH config for the registered near-dup path: 16 planes →
# 4 bands × 4 bits. Multi-band OR-construction: at cosine 0.35 per-bit
# agreement ≈ 0.61, so P(candidate) ≈ 1-(1-0.61^4)^4 ≈ 0.46 per pair —
# tunable recall with a bucket equi-join, never an all-pairs product.
_ND_PLANES = similarity.rp_hyperplanes(n_planes=16, dim=64, seed=11)
_ND_BANDS, _ND_BITS = 4, 4


def _bits_sql(planes: list[list[float]]) -> str:
    def arr(p):
        return "[" + ", ".join(f"{x!r}" for x in p) + "]"

    return " + ".join(
        f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), {arr(p)}) >= 0 "
        f"THEN 1 ELSE 0 END) * {1 << i}"
        for i, p in enumerate(planes)
    )


@_register(
    "embedding_neardup",
    f"""
    WITH sigs AS (SELECT vec_id, embedding, {_bits_sql(_ND_PLANES)} AS bucket FROM embeddings),
    bands AS (SELECT vec_id, b.band_idx,
                     (bucket >> (b.band_idx * {_ND_BITS})) & {(1 << _ND_BITS) - 1} AS band_key
              FROM sigs, (SELECT unnest([0,1,2,3]) AS band_idx) b),
    cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
             FROM bands a JOIN bands b
               ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.vec_id < b.vec_id)
    SELECT c.id_a, c.id_b,
           round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])), 4) AS cos
    FROM cand c
    JOIN embeddings ea ON ea.vec_id = c.id_a
    JOIN embeddings eb ON eb.vec_id = c.id_b
    WHERE round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])), 4) >= 0.35
    """,
    tags="embedding-cosine near-dup, banded sign-LSH scale path (bucket equi-join, no all-pairs)",
)
def embedding_neardup(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    return similarity.rp_lsh_banded_pairs(emb, _ND_PLANES, n_bands=_ND_BANDS, threshold=0.35)


@_register(
    "ann_ivf_topk",
    """
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
    probed AS (SELECT cid FROM cents, q
               ORDER BY round(list_cosine_similarity(CAST(cv AS DOUBLE[]), CAST(qv AS DOUBLE[])), 6) DESC, cid
               LIMIT 2),
    assigned AS (SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.cv AS DOUBLE[])), 6) DESC, c.cid) AS rn
        FROM embeddings e, cents c) WHERE rn = 1)
    SELECT e.vec_id,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), 4) AS cos
    FROM embeddings e
    JOIN assigned a ON e.vec_id = a.vec_id AND a.cid IN (SELECT cid FROM probed), q
    ORDER BY cos DESC, e.vec_id LIMIT 10
    """,
    tags="ANN IVF query: persisted centroid-partitioned index, scan pruned to probed partitions",
    headline=True,  # round-4 rotation: driver-grade timing for the ANN index path
)
def ann_ivf_topk(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid")
    )
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    idx = ivf_index_path(sf_dir)
    similarity.ivf_index_build(emb, cents, idx)  # one corpus pass, amortized over queries
    return similarity.ivf_topk(spark, idx, cents, qvec, k=10, nprobe=2)


@_register(
    "semantic_dedup_exemplars",
    """
    WITH RECURSIVE
    cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
    assigned AS (
      SELECT vec_id, cid, ccos FROM (
        SELECT e.vec_id, c.cid,
               round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.cv AS DOUBLE[])), 6) AS ccos,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.cv AS DOUBLE[])), 6) DESC, c.cid
               ) AS rn
        FROM embeddings e, cents c)
      WHERE rn = 1),
    pairs AS (
      SELECT a.vec_id AS u, b.vec_id AS v
      FROM assigned a JOIN assigned b ON a.cid = b.cid AND a.vec_id < b.vec_id
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id
      WHERE round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])), 4) >= 0.35),
    und AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
    reach(u, v) AS (
      SELECT u, v FROM und
      UNION
      SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
    minr AS (SELECT u, min(v) AS mv FROM reach GROUP BY u),
    lbl AS (SELECT a.vec_id, a.cid, a.ccos, least(a.vec_id, coalesce(m.mv, a.vec_id)) AS comp
            FROM assigned a LEFT JOIN minr m ON m.u = a.vec_id),
    ex AS (SELECT comp, vec_id AS exemplar_id FROM (
             SELECT comp, vec_id,
                    row_number() OVER (PARTITION BY comp ORDER BY ccos DESC, vec_id) AS rn
             FROM lbl)
           WHERE rn = 1)
    SELECT l.vec_id, CAST(l.cid AS INT) AS centroid_id, ex.exemplar_id,
           l.vec_id = ex.exemplar_id AS is_exemplar
    FROM lbl l JOIN ex ON ex.comp = l.comp
    """,
    tags="SemDeDup semantic dedup: IVF-cluster-confined cosine pairs → connected components → closest-to-centroid exemplar (quadratic search bounded per cluster, never corpus²)",
)
def semantic_dedup_exemplars(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid")
    )
    out = similarity.semdedup_exemplars(emb, cents, threshold=0.35)
    return out.select(
        "vec_id", F.col("centroid_id").cast("int").alias("centroid_id"),
        "exemplar_id", "is_exemplar",
    )


_RP_PLANES = similarity.rp_hyperplanes(n_planes=8, dim=64, seed=7)


def _planes_sql() -> str:
    def arr(p):
        return "[" + ", ".join(f"{x!r}" for x in p) + "]"

    bits = " + ".join(
        f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), {arr(p)}) >= 0 "
        f"THEN 1 ELSE 0 END) * {1 << i}"
        for i, p in enumerate(_RP_PLANES)
    )
    return bits


@_register(
    "ann_lsh_neardup",
    f"""
    WITH sigs AS (SELECT vec_id, embedding, {_planes_sql()} AS bucket FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS cos
    FROM sigs a JOIN sigs b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) >= 0.25
    """,
    tags="ANN scale path: random-hyperplane LSH bucket equi-join + exact cosine verify",
)
def ann_lsh_neardup(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    return similarity.rp_lsh_neardup_pairs(emb, _RP_PLANES, threshold=0.25)


# =====================================================================
# Temporal / range joins, multidim aggregation, set ops
# =====================================================================

_ASOF_ORACLE = """
    WITH p AS (SELECT user_id, ts, value, event_id FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase') WHERE rn = 1)
    SELECT c.event_id, c.user_id, c.ts,
           round(p.value, 4) AS purchase_value,
           p.event_id AS purchase_event_id
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.ts <= c.ts
    """


def _asof_inputs(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = lww_reduce(
        e.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value", "event_id"),
        keys=("user_id", "ts"),
        order=("event_id",),
    )
    return clicks, purchases


def _asof_shape(out):
    return out.select(
        "event_id", "user_id", "ts",
        F.round("value_asof", 4).alias("purchase_value"),
        F.col("event_id_asof").alias("purchase_event_id"),
    )


@_register(
    "events_asof_enrich",
    _ASOF_ORACLE,
    headline=True,
    tags="as-of join (temporal enrichment): union+sort-merge, no per-key cross product",
)
def events_asof_enrich(spark, sf_dir):
    from oec_etl_spark.operators.asof import asof_join

    clicks, purchases = _asof_inputs(spark, sf_dir)
    return _asof_shape(asof_join(clicks, purchases, on="user_id", ts="ts", right_cols=["value", "event_id"]))


@_register(
    "events_asof_bucketed",
    _ASOF_ORACLE,
    tags="hot-key as-of join: ts-range sub-buckets + carry-in rows, identical semantics (same DuckDB ASOF oracle)",
)
def events_asof_bucketed(spark, sf_dir):
    from oec_etl_spark.operators.asof import asof_join_bucketed

    clicks, purchases = _asof_inputs(spark, sf_dir)
    return _asof_shape(
        asof_join_bucketed(clicks, purchases, on="user_id", ts="ts",
                           right_cols=["value", "event_id"], n_buckets=8)
    )


@_register(
    "clicks_purchase_followup",
    """
    SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
           p.event_id AS purchase_id, p.ts AS purchase_ts,
           round(p.value, 4) AS purchase_value,
           (epoch_us(p.ts) - epoch_us(c.ts)) AS lag_us
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
    tags="interval join (attribution shape) — streaming twin is the watermarked stream-stream join in streaming/windows.py",
)
def clicks_purchase_followup(spark, sf_dir):
    from oec_etl_spark.streaming.windows import purchase_followup_join

    e = load(spark, sf_dir, "events")
    return purchase_followup_join(
        e.filter(F.col("event_type") == "click"),
        e.filter(F.col("event_type") == "purchase"),
        within="1 hour",
    )


_QTY_BANDS = [("low", 0, 10), ("mid", 10, 25), ("high", 25, 100)]


@_register(
    "quantity_band_range_join",
    f"""
    SELECT band, count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    JOIN (VALUES {", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in _QTY_BANDS)}) bands(band, lo, hi)
      ON l_quantity >= lo AND l_quantity < hi
    GROUP BY band
    """,
    tags="range join against broadcast band dim (banded-lookup-as-join, ref etl/util.py bands)",
)
def quantity_band_range_join(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(_QTY_BANDS, "band string, lo int, hi int")
    return (
        li.join(F.broadcast(bands), (li.l_quantity >= bands.lo) & (li.l_quantity < bands.hi))
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("sum_price"))
    )


@_register(
    "priority_status_rollup",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
           count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
    FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
    tags="multidim aggregation: ROLLUP + grouping_id (partial/final agg hierarchy)",
)
def priority_status_rollup(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n", "sum_price")
    )


_MANUAL_NATIONS = [(0, "MANUAL_ALGERIA", 0, 2), (98, "MANUAL_NEWLAND", 3, 2)]


@_register(
    "dim_union_dedup_keepfirst",
    f"""
    SELECT n_nationkey, n_name, src FROM (
      SELECT n_nationkey, n_name, src,
             row_number() OVER (PARTITION BY n_nationkey ORDER BY src, n_name) AS rn
      FROM (
        SELECT n_nationkey, n_name, 1 AS src FROM nation
        UNION ALL
        SELECT * FROM (VALUES {", ".join(f"({k}, '{nm}', {p})" for k, nm, _, p in _MANUAL_NATIONS)}) m(n_nationkey, n_name, src)
      )) WHERE rn = 1
    """,
    tags="R1+R3: union literal rows + keep-first dedup (ref dim_countries_pipeline.py:25-44, dim_eb_pipeline.py:43-55)",
)
def dim_union_dedup_keepfirst(spark, sf_dir):
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name", F.lit(1).alias("src"))
    manual = spark.createDataFrame(
        [(k, nm, p) for k, nm, _, p in _MANUAL_NATIONS], "n_nationkey int, n_name string, src int"
    )
    unioned = reshape.union_all([n, manual])
    return reshape.dedup_keep_first(unioned, keys=["n_nationkey"], order=["src", "n_name"])


@_register(
    "customer_nations_except_suppliers",
    """
    SELECT nationkey, count(*) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT ALL
      SELECT s_nationkey FROM supplier)
    GROUP BY nationkey
    """,
    tags="set op: EXCEPT ALL (multiset difference; replay-diff building block)",
)
def customer_nations_except_suppliers(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


@_register(
    "nations_with_both_roles",
    """
    SELECT nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT s_nationkey FROM supplier)
    """,
    tags="set op: INTERSECT (distinct intersection)",
)
def nations_with_both_roles(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@_register(
    "token_stats",
    f"""
    SELECT doc_id,
           {tx.n_tokens_sql("text")} AS ws_tokens,
           {tx.bpe_token_count_sql("text")} AS bpe_tokens
    FROM documents
    """,
    tags="token counting: whitespace + BPE-ish regex pre-tokenizer",
)
def token_stats(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        tx.n_tokens(F.col("text")).alias("ws_tokens"),
        tx.bpe_token_count(F.col("text")).alias("bpe_tokens"),
    )


# PII is injected deterministically from doc_id (the synthetic corpus
# contains none), then scrubbed — so the query exercises every pattern
# on every row and the oracle can rebuild the identical input.
_PII_INJECT_SQL = (
    "text || ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com ph ' "
    "|| printf('555-%03d-%04d', doc_id % 1000, (doc_id * 7) % 10000) "
    "|| ' ip ' || printf('10.%d.%d.%d', doc_id % 256, (doc_id * 3) % 256, (doc_id * 5) % 256) "
    "|| ' ssn ' || printf('%03d-%02d-%04d', doc_id % 1000, doc_id % 100, (doc_id * 11) % 10000)"
)


@_register(
    "doc_pii_redact",
    f"""
    WITH injected AS (SELECT doc_id, {_PII_INJECT_SQL} AS raw FROM documents),
    red AS (SELECT doc_id, {tx.pii_redact_sql("raw")} AS redacted FROM injected)
    SELECT doc_id,
           CAST({tx.occurrences_sql("redacted", "<EMAIL>")} AS BIGINT) AS n_emails,
           CAST({tx.occurrences_sql("redacted", "<PHONE>")} AS BIGINT) AS n_phones,
           CAST({tx.occurrences_sql("redacted", "<SSN>")} AS BIGINT) AS n_ssn,
           CAST({tx.occurrences_sql("redacted", "<IP>")} AS BIGINT) AS n_ips,
           md5(redacted) AS redacted_hash
    FROM red
    """,
    tags="PII redaction: email/SSN/phone/IPv4 scrub via RE2-portable regexp_replace chain",
)
def doc_pii_redact(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact u"), did.cast("string"), F.lit("@example.com ph "),
        F.format_string("555-%03d-%04d", did % 1000, (did * 7) % 10000),
        F.lit(" ip "),
        F.format_string("10.%d.%d.%d", did % 256, (did * 3) % 256, (did * 5) % 256),
        F.lit(" ssn "),
        F.format_string("%03d-%02d-%04d", did % 1000, did % 100, (did * 11) % 10000),
    )
    red = d.select("doc_id", tx.pii_redact(raw).alias("redacted"))
    return red.select(
        "doc_id",
        tx.occurrences(F.col("redacted"), "<EMAIL>").cast("long").alias("n_emails"),
        tx.occurrences(F.col("redacted"), "<PHONE>").cast("long").alias("n_phones"),
        tx.occurrences(F.col("redacted"), "<SSN>").cast("long").alias("n_ssn"),
        tx.occurrences(F.col("redacted"), "<IP>").cast("long").alias("n_ips"),
        F.md5(F.col("redacted")).alias("redacted_hash"),
    )


@_register(
    "doc_repetition_filter",
    f"""
    WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_words,
           {tx.dup_word_frac_sql("t")} AS dup_word_frac,
           {tx.dup_bigram_frac_sql("t")} AS dup_bigram_frac,
           {tx.mean_word_len_sql("text", "t")} AS mean_word_len,
           (len(t) >= 20
            AND {tx.mean_word_len_sql("text", "t")} BETWEEN 3.0 AND 10.0
            AND {tx.dup_word_frac_sql("t")} <= 0.55
            AND {tx.dup_bigram_frac_sql("t")} <= 0.1) AS keep
    FROM toks
    """,
    tags="Gopher-style repetition filters: dup word/bigram fraction, mean word length, keep rule",
)
def doc_repetition_filter(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    c = F.col("text")
    mwl = tx.mean_word_len(c)
    dwf = tx.dup_word_frac(c)
    dbf = tx.dup_bigram_frac(c)
    n_words = F.size(tx.tokens(c)).cast("long")
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        dwf.alias("dup_word_frac"),
        dbf.alias("dup_bigram_frac"),
        mwl.alias("mean_word_len"),
        (
            (n_words >= 20) & mwl.between(3.0, 10.0) & (dwf <= 0.55) & (dbf <= 0.1)
        ).alias("keep"),
    )


@_register(
    "doc_pipeline_gate",
    f"""
    WITH toks AS (SELECT doc_id, lang, text, string_split(text, ' ') AS t FROM documents)
    SELECT doc_id, lang,
           CASE WHEN len(t) < 20 THEN 'too_short'
                WHEN {tx.mean_word_len_sql("text", "t")} NOT BETWEEN 3.0 AND 10.0 THEN 'weird_words'
                WHEN {tx.dup_word_frac_sql("t")} > 0.55 THEN 'repetitive'
                WHEN {tx.quality_score_sql("text")} < 0.05 THEN 'low_quality'
                ELSE 'keep' END AS verdict
    FROM toks
    """,
    tags="single-pass filtering-stage gate: every hygiene rule evaluated in one scan, "
         "first failing rule attributed as the reject reason (C4-style verdict codes)",
)
def doc_pipeline_gate(spark, sf_dir):
    """The operational shape of a corpus-filter stage: ALL rules in one
    codegen'd CASE over one scan (no per-rule passes), emitting keep or
    the first failing reason — at 100 TB this is scan→project with zero
    shuffles, and the reasons feed the per-lang drop-rate monitors."""
    d = load(spark, sf_dir, "documents")
    c = F.col("text")
    n_words = F.size(tx.tokens(c)).cast("long")
    mwl = tx.mean_word_len(c)
    verdict = (
        F.when(n_words < 20, "too_short")
        .when(~mwl.between(3.0, 10.0), "weird_words")
        .when(tx.dup_word_frac(c) > 0.55, "repetitive")
        .when(tx.quality_score(c) < 0.05, "low_quality")
        .otherwise("keep")
    )
    return d.select("doc_id", "lang", verdict.alias("verdict"))


@_register(
    "events_zorder_key",
    f"""
    WITH b AS (SELECT min(user_id) AS __xmin, max(user_id) AS __xmax,
                      min(epoch_us(ts)) AS __ymin, max(epoch_us(ts)) AS __ymax FROM events)
    SELECT event_id,
           {zorder.zorder_key_expr("user_id", "__xmin", "__xmax",
                                   "epoch_us(ts)", "__ymin", "__ymax", dialect="duckdb")} AS zkey
    FROM events, b
    """,
    tags="z-order layout: Morton key over (user_id, ts) — exact integer arithmetic, both dialects",
)
def events_zorder_key(spark, sf_dir):
    from oec_etl_spark.operators.layout import with_zorder_key

    ev = load(spark, sf_dir, "events")
    return with_zorder_key(
        ev, "user_id", "unix_micros(cast(ts as timestamp))", key_col="zkey"
    ).select("event_id", "zkey")


_DECONTAM_GRAMS_SQL = f"""
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, gram FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) - {decontam.N_GRAM - 2}),
                                     i -> array_to_string(t[i:i+{decontam.N_GRAM - 1}], ' '))) AS gram
        FROM toks WHERE len(t) >= {decontam.N_GRAM}))
"""


@_register(
    "doc_decontaminate",
    f"""
    WITH {_DECONTAM_GRAMS_SQL},
    bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 10 = 0)
    SELECT g.doc_id, count(DISTINCT g.gram) AS n_contaminated_grams
    FROM grams g JOIN bench b USING (gram)
    WHERE g.doc_id % 10 <> 0
    GROUP BY g.doc_id
    """,
    tags="benchmark decontamination: 8-gram overlap vs eval set, broadcast semi-probe",
)
def doc_decontaminate(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 10 == 0)
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    return decontam.contamination(corpus, bench)


_SPAN_W = span_dedup.WIDTH
_SPAN_HITS_SQL = f"""
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT doc_id, s.pos AS pos, s.gram AS gram FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) - {_SPAN_W - 2}),
                   i -> struct_pack(pos := i,
                                    gram := array_to_string(t[i:i+{_SPAN_W - 1}], ' ')))) AS s
        FROM toks WHERE len(t) >= {_SPAN_W})),
    dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
    hits AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)),
    flagged AS (
      SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER w IS NULL
                       OR pos > lag(pos) OVER w + {_SPAN_W} THEN 1 ELSE 0 END AS brk
      FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    spans AS (
      SELECT doc_id, isl, min(pos) AS span_start, max(pos) + {_SPAN_W - 1} AS span_end
      FROM (SELECT doc_id, pos, sum(brk) OVER
                (PARTITION BY doc_id ORDER BY pos) AS isl FROM flagged)
      GROUP BY doc_id, isl)
"""


@_register(
    "doc_span_dedup",
    f"""
    WITH {_SPAN_HITS_SQL}
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT)                           AS n_dup_spans,
           CAST(sum(span_end - span_start + 1) AS BIGINT)     AS dup_tokens,
           CAST(any_value(len(t)) AS BIGINT)                  AS n_tokens,
           round(CAST(sum(span_end - span_start + 1) AS DOUBLE)
                 / any_value(len(t)), 4)                      AS dup_ratio
    FROM spans s JOIN toks USING (doc_id)
    GROUP BY s.doc_id
    """,
    tags="exact substring dedup: cross-doc repeated {W}-token spans, gaps-and-islands merge "
         "(distributed suffix-array approximation, Lee et al. 2022)".format(W=_SPAN_W),
    headline=True,  # round-4 rotation: newest dedup operator into the bench set
    # production tier: grams ride the two shuffles as xxhash64 longs, not
    # 8-token strings (same dual-tier pattern as dedup_minhash_lsh; the
    # oracle keeps raw grams so DuckDB replicates exactly)
    bench_build=lambda spark, sf_dir: span_dedup.span_dedup_stats(
        load(spark, sf_dir, "documents"), hashed=True
    ).select(
        "doc_id",
        F.col("n_dup_spans").cast("long").alias("n_dup_spans"),
        F.col("dup_tokens").cast("long").alias("dup_tokens"),
        "n_tokens",
        "dup_ratio",
    ),
)
def doc_span_dedup(spark, sf_dir):
    return span_dedup.span_dedup_stats(load(spark, sf_dir, "documents")).select(
        "doc_id",
        F.col("n_dup_spans").cast("long").alias("n_dup_spans"),
        F.col("dup_tokens").cast("long").alias("dup_tokens"),
        "n_tokens",
        "dup_ratio",
    )


# =====================================================================
# Multimodal: binary media columns + Arrow-batched decode plumbing
# =====================================================================

_MEDIA_SRC = """(
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
         CASE WHEN doc_id % 3 = 0 THEN 'IMG0'
              WHEN doc_id % 3 = 1 THEN 'AUD0' ELSE 'VID0' END AS hdr,
         4 + octet_length(encode(text)) AS n, text
  FROM documents)"""


@_register(
    "media_decode_meta",
    f"""
    SELECT doc_id, kind,
           CAST(n AS BIGINT) AS byte_len,
           CAST(64 + n % 640 AS INT) AS width,
           CAST(64 + (n * 7) % 480 AS INT) AS height,
           CAST(1 + n % 24 AS INT) AS n_frames,
           md5(hdr || text) AS checksum
    FROM {_MEDIA_SRC} s
    """,
    headline=True,
    tags="multimodal: binary media column → mapInPandas decode (deterministic fake codec) → typed metadata",
)
def media_decode_meta(spark, sf_dir):
    from oec_etl_spark.functions import multimodal as mm

    return mm.decode_media(mm.attach_media(load(spark, sf_dir, "documents")))


@_register(
    "media_frame_sample",
    f"""
    SELECT doc_id, CAST(u AS INT) AS frame_idx
    FROM (SELECT doc_id, 1 + n % 24 AS nf FROM {_MEDIA_SRC} s WHERE kind = 'video') v,
    UNNEST(generate_series(0, CAST(nf - 1 AS INT), 4)) t(u)
    """,
    tags="multimodal: video frame sampling via Arrow-batched row expansion",
)
def media_frame_sample(spark, sf_dir):
    from oec_etl_spark.functions import multimodal as mm

    frames = mm.sample_frames(mm.attach_media(load(spark, sf_dir, "documents")), every=4)
    return frames.select("doc_id", "frame_idx")


@_register(
    "media_resize_stats",
    f"""
    SELECT doc_id, CAST(least(n, 256) AS INT) AS thumb_len FROM {_MEDIA_SRC} s
    """,
    tags="multimodal: bandwidth-bounded resize stub (binary in → capped binary out)",
)
def media_resize_stats(spark, sf_dir):
    from oec_etl_spark.functions import multimodal as mm

    thumbs = mm.resize_media(mm.attach_media(load(spark, sf_dir, "documents")), max_bytes=256)
    return thumbs.select("doc_id", "thumb_len")


_HEXD = "0123456789abcdef"
_FEAT_BYTE = "((strpos('{hx}', substr(h, {p1}, 1)) - 1) * 16 + strpos('{hx}', substr(h, {p2}, 1)) - 1)"


@_register(
    "media_feature_sum",
    f"""
    SELECT doc_id, round({" + ".join(
        _FEAT_BYTE.format(hx=_HEXD, p1=2 * i + 1, p2=2 * i + 2) + " / 256.0" for i in range(8)
    )}, 4) AS feat_sum
    FROM (SELECT doc_id, md5(hdr || text) AS h FROM {_MEDIA_SRC} s) m
    """,
    tags="multimodal: feature-extract stub (binary → float vector, Arrow-batched)",
)
def media_feature_sum(spark, sf_dir):
    from oec_etl_spark.functions import multimodal as mm

    feats = mm.extract_features(mm.attach_media(load(spark, sf_dir, "documents")), dim=8)
    return feats.select(
        "doc_id",
        F.round(
            F.aggregate("features", F.lit(0.0), lambda acc, x: acc + x.cast("double")), 4
        ).alias("feat_sum"),
    )


# =====================================================================
# CDC table services: SCD2 history + change-data-feed (round 2)
# =====================================================================

@_register(
    "events_scd2_history",
    """
    SELECT user_id, event_id, event_type,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL) AS is_current
    FROM events
    """,
    tags="SCD Type-2: per-version validity intervals from the change stream, one shuffle",
)
def events_scd2_history(spark, sf_dir):
    from oec_etl_spark.operators.scd import scd2

    e = load(spark, sf_dir, "events")
    return scd2(e, keys=("user_id",), order=("ts", "event_id")).select(
        "user_id", "event_id", "event_type", "valid_from", "valid_to", "is_current"
    )


@_register(
    "events_cdf_window",
    """
    WITH old_w AS (
      SELECT user_id, event_id, round(value, 4) AS value, ts FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_id < 5000) WHERE rn = 1 AND event_type <> 'error'
    ), new_w AS (
      SELECT user_id, event_id, round(value, 4) AS value, ts FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) WHERE rn = 1 AND event_type <> 'error'
    )
    SELECT CASE WHEN n.user_id IS NULL THEN o.user_id ELSE n.user_id END AS user_id,
           CASE WHEN n.user_id IS NULL THEN o.event_id ELSE n.event_id END AS event_id,
           CASE WHEN n.user_id IS NULL THEN o.value ELSE n.value END AS value,
           CASE WHEN n.user_id IS NULL THEN o.ts ELSE n.ts END AS ts,
           CASE WHEN o.user_id IS NULL THEN 'insert'
                WHEN n.user_id IS NULL THEN 'delete'
                ELSE 'update_postimage' END AS _change_type
    FROM old_w o FULL JOIN new_w n ON o.user_id = n.user_id
    WHERE o.user_id IS NULL OR n.user_id IS NULL
       OR o.event_id IS DISTINCT FROM n.event_id
       OR o.value IS DISTINCT FROM n.value
       OR o.ts IS DISTINCT FROM n.ts
    """,
    tags="change-data-feed: net row diff between two LWW snapshot states ('error' = delete)",
)
def events_cdf_window(spark, sf_dir):
    from oec_etl_spark.operators.cdf import table_diff

    e = load(spark, sf_dir, "events")

    def state(df):
        w = lww_reduce(df, keys=("user_id",), order=("ts", "event_id"))
        return w.filter(F.col("event_type") != "error").select(
            "user_id", "event_id", F.round("value", 4).alias("value"), "ts"
        )

    old = state(e.filter(F.col("event_id") < 5000))
    new = state(e)
    return table_diff(old, new, keys=("user_id",))


# =====================================================================
# Aggregation breadth: cube, pivot, statistical aggregates (round 2)
# =====================================================================

@_register(
    "orders_cube",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags="CUBE aggregate with grouping_id (all 4 grouping sets in one pass)",
)
def orders_cube(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n", "total")
    )


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@_register(
    "events_pivot_daily",
    f"""
    SELECT date_trunc('day', ts) AS day,
           {", ".join(f"count(*) FILTER (event_type = '{t}') AS {t}" for t in _EVENT_TYPES)}
    FROM events GROUP BY 1
    """,
    tags="pivot: wide per-day event-type counts (explicit value list keeps columns deterministic)",
)
def events_pivot_daily(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        # the explicit value list avoids the extra distinct-scan Spark
        # otherwise runs to discover pivot columns — and makes the
        # output schema deterministic for downstream writers
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(_EVENT_TYPES))
    )


@_register(
    "lineitem_stats_agg",
    """
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6)        AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 2)  AS covar_qp,
           round(stddev_samp(l_quantity), 6)                  AS sd_qty,
           round(var_samp(l_discount), 6)                     AS var_disc
    FROM lineitem GROUP BY l_returnflag
    """,
    tags="statistical aggregates: corr/covar/stddev/variance (single pass, map-side partials)",
)
def lineitem_stats_agg(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qp"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
    )


# =====================================================================
# Subquery breadth: scalar / correlated / EXISTS (round 2)
# =====================================================================

@_register(
    "orders_above_avg_price",
    """
    SELECT o_orderpriority, count(*) AS n
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    GROUP BY o_orderpriority
    """,
    tags="scalar subquery: filter against a single-row aggregate (broadcast into the scan filter)",
)
def orders_above_avg_price(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("_orders_sq")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n
        FROM _orders_sq
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM _orders_sq)
        GROUP BY o_orderpriority
        """
    )


@_register(
    "customers_above_nation_avg",
    """
    SELECT c_nationkey, count(*) AS n_above
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                       WHERE c2.c_nationkey = c.c_nationkey)
    GROUP BY c_nationkey
    """,
    tags="correlated scalar subquery: Catalyst de-correlates to an aggregate + equi-join",
)
def customers_above_nation_avg(spark, sf_dir):
    load(spark, sf_dir, "customer").createOrReplaceTempView("_customer_sq")
    return spark.sql(
        """
        SELECT c_nationkey, count(*) AS n_above
        FROM _customer_sq c
        WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM _customer_sq c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        GROUP BY c_nationkey
        """
    )


@_register(
    "late_order_priority_count",
    """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    tags="EXISTS subquery (TPC-H Q4 shape): planned as a left-semi join",
)
def late_order_priority_count(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("_orders_ex")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("_lineitem_ex")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM _orders_ex o
        WHERE EXISTS (SELECT 1 FROM _lineitem_ex l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
        """
    )


@_register(
    "promo_revenue_share",
    """
    SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                                  THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
    tags="conditional-aggregate ratio (TPC-H Q14 shape), part dim broadcast",
)
def promo_revenue_share(spark, sf_dir):
    li, p = load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0)) / F.sum(rev), 4
            ).alias("promo_share_pct")
        )
    )


@_register(
    "doc_tfidf_topterms",
    """
    WITH toks AS (
      SELECT doc_id, t.term FROM documents,
             UNNEST(string_split(text, ' ')) AS t(term)
      WHERE t.term <> ''
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
    ), df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1
    ), n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM toks)
    SELECT doc_id, term, CAST(rnk AS INT) AS rnk,
           round(tfidf, 6) AS tfidf
    FROM (
      SELECT tf.doc_id, tf.term,
             tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS tfidf,
             row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) DESC, tf.term
             ) AS rnk
      FROM tf JOIN df USING (term) CROSS JOIN n
    ) WHERE rnk <= 3
    """,
    tags="TF-IDF top-terms: tokenize → tf → df → idf join → per-doc top-k, all built-ins",
)
def doc_tfidf_topterms(spark, sf_dir):
    """Multi-stage text-scoring pipeline with zero Python in the row
    path: explode+groupBy for tf, a second aggregate for df (its
    output is vocabulary-sized — AQE broadcasts the join back), and a
    per-doc window for the top-k. At 100 TB the only wide exchanges
    are the two (doc_id|term) hash aggregates; both combine map-side."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n_docs = toks.select(F.count_distinct("doc_id").alias("n_docs"))
    tfidf = F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))
    w = Window.partitionBy("doc_id").orderBy(tfidf.desc(), F.col("term"))
    return (
        tf.join(df, "term").crossJoin(F.broadcast(n_docs))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", F.col("rnk").cast("int").alias("rnk"),
                F.round(tfidf, 6).alias("tfidf"))
    )


def _split_sql() -> str:
    from oec_etl_spark.operators.sampling import hash_split_sql

    return hash_split_sql("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed="s0")


def _sample_sql() -> str:
    from oec_etl_spark.operators.sampling import hash_sample_sql

    return hash_sample_sql("doc_id", 0.25, seed="bal")


@_register(
    "doc_hash_split",
    f"""
    SELECT split, lang, count(*) AS n
    FROM (SELECT lang, {_split_sql()} AS split FROM documents)
    GROUP BY 1, 2
    """,
    tags="deterministic train/val/test split by hash-mod bucket (stable across runs/appends)",
    bench_build=lambda spark, sf_dir: __import__("oec_etl_spark.operators.sampling", fromlist=["hash_split"]).hash_split(
        load(spark, sf_dir, "documents"), "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1}, portable_hash=False,
    ).groupBy("split", "lang").agg(F.count(F.lit(1)).alias("n")),
)
def doc_hash_split(spark, sf_dir):
    from oec_etl_spark.operators.sampling import hash_split

    d = load(spark, sf_dir, "documents")
    return (
        hash_split(d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed="s0", portable_hash=True)
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_register(
    "doc_hash_sample",
    f"""
    SELECT lang, count(*) AS n, min(doc_id) AS min_id
    FROM documents WHERE {_sample_sql()}
    GROUP BY 1
    """,
    tags="deterministic hash downsample (reproducible independent of partitioning/retries)",
)
def doc_hash_sample(spark, sf_dir):
    from oec_etl_spark.operators.sampling import hash_sample

    d = load(spark, sf_dir, "documents")
    return (
        hash_sample(d, "doc_id", 0.25, seed="bal", portable_hash=True)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("min_id"))
    )


def _strat_sql() -> str:
    from oec_etl_spark.operators.sampling import stratified_sample_sql

    return stratified_sample_sql("doc_id", "lang", {"en": 0.3, "zh": 0.6}, seed="bal2")


@_register(
    "doc_stratified_sample",
    f"""
    SELECT lang, count(*) AS n, min(doc_id) AS min_id
    FROM documents WHERE {_strat_sql()}
    GROUP BY 1
    """,
    tags="per-stratum deterministic rebalance (cap dominant langs, keep the tail whole); "
         "same hash bucketing as hash_sample so kept sets nest monotonically as rates drop",
)
def doc_stratified_sample(spark, sf_dir):
    """Corpus rebalancing without per-stratum counts: each stratum gets
    its own keep-threshold over one shared hash bucketing — pure per-row
    arithmetic (codegen'd CASE + filter before any shuffle), so the 100TB
    plan is scan→filter→partial-agg with no extra pass."""
    from oec_etl_spark.operators.sampling import stratified_sample

    d = load(spark, sf_dir, "documents")
    return (
        stratified_sample(d, "lang", {"en": 0.3, "zh": 0.6}, id_col="doc_id",
                          seed="bal2", portable_hash=True)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("min_id"))
    )


@_register(
    "events_approx_users_daily",
    """
    SELECT date_trunc('day', ts) AS day, count(DISTINCT user_id) AS approx_users
    FROM events GROUP BY 1
    """,
    tags="HLL sketch distinct (DataSketches, mergeable): oracle is the exact count — below "
         "~3/4·2^lg_k distincts the sketch is in exact coupon mode, so at oracle scale "
         "estimate == exact; at 10^10 rows the same plan ships 4 KB partials instead of "
         "shuffling every distinct user",
)
def events_approx_users_daily(spark, sf_dir):
    from oec_etl_spark.functions import sketches as sk

    e = load(spark, sf_dir, "events").withColumn("day", F.date_trunc("day", "ts"))
    out = sk.approx_distinct(e, "user_id", by=["day"], lg_k=12)
    return out.select("day", F.col("approx_distinct_user_id").cast("long").alias("approx_users"))


@_register(
    "events_sliding_rollup",
    """
    SELECT CAST(to_timestamp(bucket0 - k * 900) AS TIMESTAMP) AS window_start, event_type,
           count(*) AS n
    FROM (SELECT CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) AS bucket0, event_type
          FROM events),
         UNNEST([0, 1, 2, 3]) AS t(k)
    GROUP BY 1, 2
    """,
    tags="sliding windows in batch (1h window / 15min slide): each event lands in 4 "
         "overlapping windows; same F.window op the streaming path uses",
)
def events_sliding_rollup(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n")
    )


@_register(
    "events_role_transitions",
    """
    SELECT prev_type AS from_type, event_type AS to_type, count(*) AS n
    FROM (SELECT event_type,
                 lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
          FROM events)
    WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """,
    tags="transcript role-transition matrix (who answers whom): window lag + count; "
         "one shuffle keyed by the conversation, matrix is |roles|^2 rows",
)
def events_role_transitions(spark, sf_dir):
    """Markov-style transition counts over each conversation's ordered
    turns — the transcript-product analog of funnel analysis. Scale
    shape: a single shuffle partitioned by user_id (the conversation
    key) for the lag window, then a partial-agg count over a tiny
    (from,to) domain."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("from_type", F.lag("event_type").over(w))
        .filter(F.col("from_type").isNotNull())
        .groupBy(F.col("from_type").alias("from_type"), F.col("event_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_register(
    "events_turn_gap_stats",
    """
    SELECT event_type,
           count(*) AS n_gaps,
           round(avg(gap_us), 4) AS avg_gap_us,
           CAST(max(gap_us) AS BIGINT) AS max_gap_us
    FROM (SELECT event_type,
                 epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
          FROM events)
    WHERE gap_us IS NOT NULL
    GROUP BY 1
    """,
    tags="inter-turn latency per role (exact integer micros, no float drift in the "
         "window): window lag on event time + avg/max rollup",
)
def events_turn_gap_stats(spark, sf_dir):
    """Response-latency profile: how long after the previous turn does
    each role speak? Gaps are computed in exact integer microseconds
    (unix_micros) so the only float op is the final avg — kept
    bit-comparable to the oracle by round(.,4)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))  # ntz -> utc instant
    return (
        e.withColumn("gap_us", us - F.lag(us).over(w))
        .filter(F.col("gap_us").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(F.avg("gap_us"), 4).alias("avg_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
        )
    )


@_register(
    "events_transcript_render",
    """
    SELECT user_id,
           count(*) AS n_turns,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS flow
    FROM events
    GROUP BY user_id
    """,
    tags="ordered transcript assembly as a REGISTERED oracle query (north-rule "
         "stable-turn-ordering invariant): one hash agg, partition-local "
         "collect_list + array_sort, no window/global sort",
)
def events_transcript_render(spark, sf_dir):
    """The engine's conversation-assembly shape (operators/transcripts.py)
    over the shared events table, oracle-checked: each conversation's
    turns rendered in stable (ts, event_id) order with ONE hash
    aggregate — collect_list is partition-local after the groupBy
    shuffle and array_sort runs per group, so there is no global sort
    and no per-key window. Mirrors the reference's per-pipeline ORDER
    BY materialization (/root/reference/etl/trade_comtrade_monthly_pipeline.py)
    without its single-node sort."""
    e = load(spark, sf_dir, "events")
    turn = F.struct(F.col("ts"), F.col("event_id"), F.col("event_type"))
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list(turn)), lambda x: x["event_type"]),
            ">",
        ).alias("flow"),
    )


# =====================================================================
# Classic decision-support shapes + k-NN graph / quantization (round 2,
# sixth pass): the remaining TPC-H query skeletons expressible over the
# provided tables (no partsupp → Q2/Q11/Q16/Q20 are out of reach), plus
# the two embedding ops an LLM-data pipeline still lacked — the k-NN
# graph (clustering / semantic-dedup input) and int8 quantization.
# =====================================================================

@_register(
    "top_supplier_revenue",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    tags="TPC-H Q15 shape: agg view + scalar-max subquery + broadcast dim join",
)
def top_supplier_revenue(spark, sf_dir):
    """Q15: the quarter's top supplier(s) by discounted revenue. The
    revenue view is one partial-agg groupBy; the scalar max is a 1-row
    broadcast (BroadcastNestedLoop on an equality against one row, not
    a cartesian); supplier is a broadcast dim."""
    li = load(spark, sf_dir, "lineitem")
    rev = (
        li.filter((F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01"))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    sup = load(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev["total_revenue"] == mx["__mx"])
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@_register(
    "big_orders_topk",
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           round(sum(l_quantity), 2) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags="TPC-H Q18 shape: having-subquery semi-join + multi-join agg + top-k",
)
def big_orders_topk(spark, sf_dir):
    """Q18: large-volume orders. The HAVING subquery becomes a LEFT
    SEMI join against a pre-aggregated key set — at scale the semi side
    is the slim (orderkey) projection of one partial agg, and the big
    fact joins stay key-partitioned (no IN-list broadcast of an
    unbounded set to the driver)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 300).select("l_orderkey")
    )
    return (
        orders.join(big, orders["o_orderkey"] == big["l_orderkey"], "left_semi")
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@_register(
    "returned_items_topk",
    """
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags="TPC-H Q10 shape: returned-item revenue, 4-way join + top-k",
)
def returned_items_topk(spark, sf_dir):
    """Q10: customers who returned the most (by discounted revenue) in
    one quarter. Pushdown keeps only one quarter of orders and the 'R'
    lineitems at the scans; nation broadcasts; the agg keys include the
    customer attributes so no second join after the groupBy."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load(spark, sf_dir, "nation")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@_register(
    "nation_trade_volume",
    """
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags="TPC-H Q7 shape: bidirectional nation-pair volume, two aliased dims",
)
def nation_trade_volume(spark, sf_dir):
    """Q7: shipping volume between two nations by year and direction.
    The same dimension table joins TWICE under different roles (supplier
    nation / customer nation) — both broadcast; the disjunctive pair
    filter lands on the broadcast-joined columns so the big facts only
    carry keys through the shuffle."""
    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("__n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("__n2_key"), F.col("n_name").alias("cust_nation"))
    pair = ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        sup.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("__n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("__n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@_register(
    "unshipped_orders_topk",
    """
    SELECT o_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'MACHINERY'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    tags="TPC-H Q3 shape: segment filter + date straddle + top-k revenue",
)
def unshipped_orders_topk(spark, sf_dir):
    """Q3: highest-value orders not yet shipped at the cutoff. All
    three filters push to their scans (segment on the dim, the two date
    bounds on the facts) before any join; the top-k is a TakeOrdered,
    never a global sort."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "MACHINERY")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@_register(
    "ann_knn_join",
    f"""
    WITH sigs AS (SELECT vec_id, embedding, {_bits_sql(_ND_PLANES)} AS bucket FROM embeddings),
    bands AS (SELECT vec_id, b.band_idx,
                     (bucket >> (b.band_idx * {_ND_BITS})) & {(1 << _ND_BITS) - 1} AS band_key
              FROM sigs, (SELECT unnest([0,1,2,3]) AS band_idx) b),
    cand AS (SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS neighbor_id
             FROM bands a JOIN bands b
               ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.vec_id <> b.vec_id),
    scored AS (SELECT c.vec_id, c.neighbor_id,
                      round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                                   CAST(eb.embedding AS DOUBLE[])), 4) AS cos
               FROM cand c
               JOIN embeddings ea ON ea.vec_id = c.vec_id
               JOIN embeddings eb ON eb.vec_id = c.neighbor_id)
    SELECT vec_id, neighbor_id, cos, CAST(rn AS INT) AS nn_rank FROM (
      SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rn
      FROM scored)
    WHERE rn <= 3
    """,
    tags="approximate k-NN graph: banded sign-LSH candidates + per-vector cosine rank "
         "(clustering / semantic-dedup input, no all-pairs product)",
)
def ann_knn_join(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    return similarity.knn_join(emb, _ND_PLANES, n_bands=_ND_BANDS, k=3)


@_register(
    "embedding_quantize",
    """
    SELECT label,
           count(*) AS n_vecs,
           round(avg(max_err), 6) AS avg_max_err,
           round(max(max_err), 6) AS worst_err
    FROM (
      SELECT label,
             list_aggregate(list_transform(v, x -> abs(x - floor(x / scale + 0.5) * scale)),
                            'max') AS max_err
      FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS v,
                   list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)),
                                  'max') / 127.0 AS scale
            FROM embeddings))
    GROUP BY label
    """,
    tags="int8 scalar quantization roundtrip error by label (embedding compression "
         "quality gauge; map-only higher-order builtins, zero Python)",
)
def embedding_quantize(spark, sf_dir):
    """Symmetric int8 quantization (scale = max|x|/127) and the largest
    per-dimension reconstruction error of the roundtrip, summarized per
    label. 4 bytes/dim → 1 is the standard storage cut before ANN at
    10^10-vector scale; the whole computation is one map stage of
    higher-order builtins over the array column — no shuffle except the
    final small groupBy, no Python in the row path."""
    from oec_etl_spark.functions.vectors import dequantize_max_err, quantize_scale

    emb = load(spark, sf_dir, "embeddings")
    scale = quantize_scale(F.col("embedding"))
    return (
        emb.select("label", dequantize_max_err(F.col("embedding"), scale).alias("max_err"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("max_err"), 6).alias("avg_max_err"),
            F.round(F.max("max_err"), 6).alias("worst_err"),
        )
    )


@_register(
    "dedup_best_survivors",
    f"""
    WITH RECURSIVE {_LSH_CTES},
    und AS (SELECT doc_a AS u, doc_b AS v FROM lsh_pairs
            UNION SELECT doc_b, doc_a FROM lsh_pairs),
    reach(u, v) AS (
      SELECT u, v FROM und
      UNION
      SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u
    ),
    minr AS (SELECT u, min(v) AS mv FROM reach GROUP BY u),
    comp AS (SELECT d.doc_id, least(d.doc_id, coalesce(minr.mv, d.doc_id)) AS comp_id
             FROM documents d LEFT JOIN minr ON minr.u = d.doc_id),
    q AS (SELECT doc_id, {tx.quality_score_sql("text")} AS q FROM documents),
    best AS (SELECT comp_id, doc_id AS best_id FROM (
        SELECT c.comp_id, c.doc_id,
               row_number() OVER (PARTITION BY c.comp_id ORDER BY q.q DESC, c.doc_id) AS rn
        FROM comp c JOIN q ON q.doc_id = c.doc_id) WHERE rn = 1)
    SELECT c.doc_id, b.best_id AS survivor_id, round(q2.q, 6) AS survivor_quality
    FROM comp c JOIN best b ON b.comp_id = c.comp_id JOIN q q2 ON q2.doc_id = b.best_id
    """,
    tags="cluster-exemplar selection: keep the highest-quality doc per near-dup "
         "component (the keeper a corpus pipeline actually wants), min-id tiebreak",
)
def dedup_best_survivors(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return dd.dedup_best_survivors(
        docs, dd.dedup_minhash_lsh(docs), tx.quality_score(F.col("text"))
    )


# The gate CASE shared by doc_pipeline_gate and corpus_curated (SQL side).
_GATE_CASE = f"""CASE WHEN len(t) < 20 THEN 'too_short'
                WHEN {{mwl}} NOT BETWEEN 3.0 AND 10.0 THEN 'weird_words'
                WHEN {{dup}} > 0.55 THEN 'repetitive'
                WHEN {{q}} < 0.05 THEN 'low_quality'
                ELSE 'keep' END"""


@_register(
    "corpus_curated",
    f"""
    WITH RECURSIVE kept AS (
      SELECT doc_id, lang, text FROM (
        SELECT doc_id, lang, text,
               {_GATE_CASE.format(mwl=tx.mean_word_len_sql("text", "t"),
                                  dup=tx.dup_word_frac_sql("t"),
                                  q=tx.quality_score_sql("text"))} AS verdict
        FROM (SELECT doc_id, lang, text, string_split(text, ' ') AS t FROM documents))
      WHERE verdict = 'keep'),
    {_LSH_CTES.replace("FROM documents", "FROM kept")},
    und AS (SELECT doc_a AS u, doc_b AS v FROM lsh_pairs
            UNION SELECT doc_b, doc_a FROM lsh_pairs),
    reach(u, v) AS (
      SELECT u, v FROM und
      UNION
      SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u
    ),
    minr AS (SELECT u, min(v) AS mv FROM reach GROUP BY u),
    comp AS (SELECT k.doc_id, least(k.doc_id, coalesce(minr.mv, k.doc_id)) AS comp_id
             FROM kept k LEFT JOIN minr ON minr.u = k.doc_id),
    q AS (SELECT doc_id, {tx.quality_score_sql("text")} AS q FROM kept),
    best AS (SELECT comp_id, doc_id AS best_id FROM (
        SELECT c.comp_id, c.doc_id,
               row_number() OVER (PARTITION BY c.comp_id ORDER BY q.q DESC, c.doc_id) AS rn
        FROM comp c JOIN q ON q.doc_id = c.doc_id) WHERE rn = 1)
    SELECT b.best_id AS doc_id, k.lang, round(q.q, 6) AS quality,
           {tx.n_tokens_sql("k.text")} AS n_tokens
    FROM best b
    JOIN kept k ON k.doc_id = b.best_id
    JOIN q ON q.doc_id = b.best_id
    """,
    tags="end-to-end corpus curation: hygiene gate → near-dup clustering over the "
         "KEPT docs only (garbage can't bridge clusters) → highest-quality exemplar "
         "per cluster — one composed lazy plan, the full training-data filter stage",
)
def corpus_curated(spark, sf_dir):
    """The whole curation stage as ONE lazy composition: the gate's
    codegen'd CASE prunes first (so near-dup never shingles garbage,
    and rejected docs can't bridge two clusters), MinHash-LSH pairs +
    CC labels run over the kept subset, and each cluster keeps its
    highest-quality copy. Catalyst fuses gate+shingle into one scan;
    the only shuffles are the LSH band join, the CC rounds, and two
    hash aggregates — the same plan shape at 100 TB."""
    d = load(spark, sf_dir, "documents")
    c = F.col("text")
    n_words = F.size(tx.tokens(c)).cast("long")
    verdict = (
        F.when(n_words < 20, "too_short")
        .when(~tx.mean_word_len(c).between(3.0, 10.0), "weird_words")
        .when(tx.dup_word_frac(c) > 0.55, "repetitive")
        .when(tx.quality_score(c) < 0.05, "low_quality")
        .otherwise("keep")
    )
    kept = d.filter(verdict == "keep")
    surv = dd.dedup_best_survivors(kept, dd.dedup_minhash_lsh(kept), tx.quality_score(c))
    return (
        surv.filter(F.col("doc_id") == F.col("survivor_id"))
        .join(kept, "doc_id")
        .select(
            "doc_id", "lang",
            F.col("survivor_quality").alias("quality"),
            tx.n_tokens(F.col("text")).alias("n_tokens"),
        )
    )


@_register(
    "orders_value_deciles",
    """
    SELECT o_orderpriority, CAST(decile AS INT) AS decile,
           count(*) AS n_orders,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM (
      SELECT o_orderpriority, o_totalprice,
             ntile(10) OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders)
    GROUP BY o_orderpriority, decile
    """,
    tags="window breadth: NTILE decile banding per group + per-band stats "
         "(the value-distribution profile a monitoring job computes)",
)
def orders_value_deciles(spark, sf_dir):
    """Per-priority price deciles: ntile's deterministic tie order is
    pinned with o_orderkey so Spark and DuckDB band identically. One
    window shuffle keyed by the group + one hash agg — the window
    partitions by a bounded-cardinality key, so no single-reducer
    global sort at any scale."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_orderpriority", "o_totalprice", F.ntile(10).over(w).alias("decile"))
        .groupBy("o_orderpriority", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .select("o_orderpriority", F.col("decile").cast("int").alias("decile"),
                "n_orders", "lo", "hi")
    )


@_register(
    "orders_grouping_sets",
    """
    SELECT o_orderpriority, o_orderstatus,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total,
           CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus) AS INT) AS gid
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
    tags="aggregation breadth: explicit GROUPING SETS (two independent "
         "one-dimension rollups + grand total in ONE pass, completing "
         "rollup/cube/pivot)",
)
def orders_grouping_sets(spark, sf_dir):
    """Two marginals + the grand total in one shuffle — GROUPING SETS
    expands to a union-of-groupings inside the aggregate (each input
    row feeds every set), so the scan runs once; grouping() flags
    disambiguate the NULLs of absent dimensions from real NULL data."""
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__gs_orders")
    return spark.sql("""
        SELECT o_orderpriority, o_orderstatus,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total,
               CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus) AS INT) AS gid
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """)


_PACK_BUDGET = 512  # tokens per packed sequence (shared with the oracle SQL)


@_register(
    "doc_pack_sequences",
    f"""
    SELECT lang, CAST(bin_id AS INT) AS bin_id,
           count(*) AS n_docs, sum(n_tokens) AS tokens
    FROM (
      SELECT lang, n_tokens,
             CAST(floor((cum - n_tokens) / {_PACK_BUDGET}.0) AS BIGINT) AS bin_id
      FROM (
        SELECT lang, n_tokens,
               sum(n_tokens) OVER (PARTITION BY lang
                                   ORDER BY n_tokens DESC, doc_id) AS cum
        FROM (SELECT doc_id, lang, {tx.n_tokens_sql("text")} AS n_tokens
              FROM documents)))
    GROUP BY lang, bin_id
    """,
    tags="LLM training-data sequence packing: next-fit bin assignment over a "
         "deterministic (tokens desc, id) order per language — per-bin fill stats",
)
def doc_pack_sequences(spark, sf_dir):
    """Sample packing — assign documents to fixed-token-budget training
    sequences: a next-fit pass over the deterministic (tokens desc, id)
    order, bin = exclusive-prefix-sum // budget, so a document is never
    split and each bin overflows by at most one document. Packing here
    is windowed PER LANGUAGE (the natural packing domain); at 10^10
    docs production packs within hash-shards instead — same window,
    partitioned by (shard), identical fill quality in expectation and
    no global sort anywhere."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", "lang", tx.n_tokens(F.col("text")).alias("n_tokens"))
    w = (
        Window.partitionBy("lang")
        .orderBy(F.desc("n_tokens"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = toks.select(
        "lang", "n_tokens",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / float(_PACK_BUDGET))
        .alias("bin_id"),
    )
    return (
        binned.groupBy("lang", F.col("bin_id").cast("int").alias("bin_id"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("tokens"))
    )


@_register(
    "doc_lm_xent",
    lm.score_bigram_xent_sql("documents"),
    tags="LLM corpus quality: CCNet-style per-doc cross-entropy under a "
         "corpus-trained add-k bigram LM (Zipf-aware head-broadcast + "
         "tail-shuffle scoring join)",
)
def doc_lm_xent(spark, sf_dir):
    """Self-trained bigram-LM perplexity filter (operators/lm.py):
    training is two map-side-combined aggregations over the exploded
    bigram stream; scoring splits the Zipf-skewed gram join into a
    broadcast head (the stop-pairs that would otherwise converge on
    single reducers) and a uniform shuffled tail."""
    return lm.score_bigram_xent(load(spark, sf_dir, "documents"))


@_register(
    "bpe_learn_merges",
    bpe.learn_merges_sql("documents"),
    tags="distributed BPE tokenizer training: merge ranks learned from the "
         "(word,count) table — corpus scanned once, one small shuffle per merge",
)
def bpe_learn_merges(spark, sf_dir):
    """Train N_MERGES BPE merges on the documents corpus
    (operators/bpe.py) and return the ranked merge table. The oracle
    replays the identical loop as a generated CTE chain, so argmax
    tie-breaks and replace-all merge semantics are pinned bit-for-bit
    across engines."""
    merges, _ = bpe.learn_merges(load(spark, sf_dir, "documents"))
    return bpe.merges_df(spark, merges)


@_register(
    "bpe_compression",
    bpe.compression_sql("documents"),
    tags="distributed BPE tokenizer training: corpus compression of the "
         "learned vocab (words/chars/subword tokens + tokens-per-char)",
)
def bpe_compression(spark, sf_dir):
    """Corpus-level compression of the trained BPE vocab: exact-integer
    totals plus one division, so the double is identical in both
    engines without rounding slack."""
    _, words = bpe.learn_merges(load(spark, sf_dir, "documents"))
    return bpe.compression(words)


@_register(
    "bpe_encode_docs",
    bpe.encode_sql("documents"),
    tags="BPE corpus encoding: apply learned merges as a map-only literal replace "
         "chain, vocab ids as plan literals — the tokenize step after training",
    headline=True,  # round-4 rotation: BPE train+encode into the bench set
)
def bpe_encode_docs(spark, sf_dir):
    """Encode the corpus with the trained merges (operators/bpe.py
    encode): per doc, word count, BPE token count, and the full id
    sequence (CSV so the hash gate compares scalars, not arrays). The
    oracle re-learns the same chain in SQL and re-encodes by joining
    words to their final trained repr — proving chain-application ==
    trained-table lookup."""
    docs = load(spark, sf_dir, "documents")
    merges, words = bpe.learn_merges(docs)
    v = bpe.vocab(merges, words)
    enc = bpe.encode(docs, merges, v)
    return enc.select(
        "doc_id", "n_words", "n_bpe_tokens",
        F.array_join(F.col("token_ids"), ",").alias("ids_csv"),
    )


# Supervised-quality demo label: density of the marker token 'spark'
# (a text-DERIVED signal — the metadata `lang` column is uncorrelated
# with the synthetic text, AUC ≈ 0.5). Threshold splits the corpus
# roughly 40/60, so both classes are populated at every SF.
def _qc_label_spark():
    # built lazily: higher-order-function lambdas need a live SparkContext
    return (
        F.size(F.filter(F.split("text", " "), lambda t: t == F.lit("spark")))
        / F.size(F.split("text", " "))
        >= 0.033
    ).cast("int")
_QC_LABEL_SPARK_SQL = (
    "CASE WHEN CAST(len(list_filter(string_split(text,' '), t -> t = 'spark'))"
    " AS DOUBLE) / len(string_split(text,' ')) >= 0.033 THEN 1 ELSE 0 END"
)
_QC_DIM, _QC_ITER, _QC_LR = 128, 4, 20.0


@_register(
    "doc_quality_classifier",
    classifier.train_score_sql(
        "documents", label_expr=_QC_LABEL_SPARK_SQL,
        dim=_QC_DIM, n_iter=_QC_ITER, lr=_QC_LR,
    ),
    tags="trainable quality classifier (CCNet's supervised half): hashed-ngram "
         "features + full-batch logistic regression, gradient = one map-side-"
         "combined hash-agg per iteration, scoring a map-only expression; "
         "weights pinned bit-exact across engines via 12dp gradient rounding",
    # round-5: moved to bench.py's EXTENDED_SET — as a headline entry the
    # 4-iteration training loop dominated the total (77% in round 4) and
    # masked regressions in the other 13 entries; it still gets
    # driver-grade timing every round, just outside the headline sum
    # (BENCH_r05 carries value_r4_comparable for round-over-round).
)
def doc_quality_classifier(spark, sf_dir):
    """Train on docs with doc_id % 5 != 0, score the held-out fifth
    (operators/classifier.py). The oracle replays the EXACT training
    loop as a generated CTE chain — per-iteration gradients round to
    the same 1e-12 grid in both engines, so trained weights (and hence
    4dp scores) are identical, not merely close. Reference analog:
    none (the reference has no ML surface); SURVEY.md §2.5 family."""
    d = load(spark, sf_dir, "documents").withColumn("label", _qc_label_spark())
    clf = classifier.train(
        d.filter("doc_id % 5 <> 0"), "label",
        dim=_QC_DIM, n_iter=_QC_ITER, lr=_QC_LR,
    )
    return d.filter("doc_id % 5 = 0").select(
        "doc_id",
        F.col("label").cast("int").alias("label"),
        clf.score().alias("score"),
    )


_CHUNK_SIZE, _CHUNK_STRIDE = 32, 24  # tokens per chunk / window step


@_register(
    "doc_chunk_windows",
    f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    ), c AS (
      SELECT doc_id, toks, n,
             unnest(range(CASE WHEN n <= {_CHUNK_SIZE} THEN 1
                          ELSE (n - {_CHUNK_SIZE} + {_CHUNK_STRIDE - 1}) // {_CHUNK_STRIDE} + 1 END)) AS chunk_id
      FROM t
    )
    SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
           array_to_string(toks[chunk_id*{_CHUNK_STRIDE} + 1 : chunk_id*{_CHUNK_STRIDE} + {_CHUNK_SIZE}], ' ') AS chunk,
           CAST(least({_CHUNK_SIZE}, n - chunk_id*{_CHUNK_STRIDE}) AS INT) AS n_chunk_tokens
    FROM c
    """,
    tags="RAG/long-context chunking: sliding token windows (size 32, stride 24) "
         "as pure codegen'd array ops — map-only, zero shuffle, zero Python",
)
def doc_chunk_windows(spark, sf_dir):
    """Context-window chunking (functions/text.chunk_text): one row per
    overlapping token window per document. The plan is a single
    project+explode over the scan — no shuffle — so at 100 TB it runs
    at input-split parallelism; the downstream embed step consumes the
    chunks without repartitioning."""
    d = load(spark, sf_dir, "documents")
    c = tx.chunk_text(F.col("text"), size=_CHUNK_SIZE, stride=_CHUNK_STRIDE)
    return d.select("doc_id", F.explode(c).alias("c")).select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.chunk").alias("chunk"),
        F.col("c.n_chunk_tokens").alias("n_chunk_tokens"),
    )


def _lsh_ctes_over(table: str, id_col: str, text_col: str) -> str:
    """The MinHash-LSH candidate-pair CTE chain over an arbitrary
    (id, text) relation — same constants and hashes as _LSH_CTES (which
    is the documents-table instance of this)."""
    sh = dd.SHINGLE_LEN
    return f"""
    shingles AS (
      SELECT DISTINCT {id_col} AS doc_id,
             unnest([substr({text_col}, CAST(i AS INT), {sh})
                     for i in generate_series(1, len({text_col}) - {sh - 1})]) AS shingle
      FROM {table}
    ),
    sigs AS (
      SELECT doc_id,
             {", ".join(f"min(md5(concat('{i}:', shingle))) AS mh{i}" for i in range(dd.N_MINHASH))}
      FROM shingles GROUP BY doc_id
    ),
    bands AS (
      {" UNION ALL ".join(
          f"SELECT doc_id, {b} AS band_idx, md5(concat(mh{2*b}, mh{2*b+1})) AS band_key FROM sigs"
          for b in range(dd.N_BANDS)
      )}
    ),
    lsh_pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    )"""


@_register(
    "transcript_neardup",
    f"""
    WITH flows AS (
      SELECT user_id, string_agg(event_type, '>' ORDER BY ts, event_id) AS flow
      FROM events GROUP BY user_id
    ),
    reps AS (
      SELECT min(user_id) AS user_id, flow FROM flows GROUP BY flow
    ),
    {_lsh_ctes_over("reps", "user_id", "flow")}
    SELECT doc_a AS user_a, doc_b AS user_b FROM lsh_pairs
    """,
    tags="CONVERSATION-level near-dup: assemble each transcript in stable turn "
         "order, exact-collapse identical flows, then MinHash-LSH the distinct "
         "flows — dedup at the unit a training pipeline actually samples",
)
def transcript_neardup(spark, sf_dir):
    """Whole-conversation near-duplicate candidates: render each
    user's event flow in stable (ts, event_id) order (one hash agg —
    the same single-shuffle assembly as events_transcript_render),
    EXACT-collapse identical flows to their min-id representative, and
    only then run the shingle→minhash→band pipeline over the distinct
    flows. The collapse is the scale guard: identical trivial
    conversations (every corpus has millions) would otherwise form
    full O(c²) cliques inside their LSH buckets; after it, the exact
    tier owns identical content and LSH sees each flow once. The band
    join stays the proven bucketed equi-join — never all-pairs — the
    shape that survives 10^9 conversations."""
    e = load(spark, sf_dir, "events")
    turn = F.struct(F.col("ts"), F.col("event_id"), F.col("event_type"))
    flows = e.groupBy("user_id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(turn)), lambda x: x["event_type"]),
            ">",
        ).alias("flow")
    )
    reps = flows.groupBy("flow").agg(F.min("user_id").alias("user_id"))
    pairs = dd.dedup_minhash_lsh(reps, text_col="flow", id_col="user_id")
    return pairs.select(
        F.col("doc_a").alias("user_a"), F.col("doc_b").alias("user_b")
    )


_MIX_ALPHA = 0.5  # mixture temperature: 1 = proportional, 0 = uniform


@_register(
    "corpus_mixture_weights",
    f"""
    WITH s AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum({tx.n_tokens_sql('text')}) AS BIGINT) AS tokens
      FROM documents GROUP BY source
    )
    SELECT source, n_docs, tokens,
           round(pow(tokens, {_MIX_ALPHA}) / sum(pow(tokens, {_MIX_ALPHA})) OVER (), 6) AS mix_weight
    FROM s
    """,
    tags="training-mixture design: temperature-weighted domain sampling rates "
         "(weight ∝ tokens^alpha, alpha=0.5) — the multilingual/domain "
         "rebalancing rule used by large-corpus pretraining recipes",
)
def corpus_mixture_weights(spark, sf_dir):
    """Per-source sampling weights for corpus mixing: token share
    raised to a temperature alpha<1 upweights small domains without
    letting any dominate. One map-side-combined aggregate over the
    corpus; the unpartitioned normalization window runs over the
    already-aggregated per-source rows (a handful), so the single-
    partition window is O(#sources), never O(corpus)."""
    d = load(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tx.n_tokens(F.col("text"))).alias("tokens"),
    )
    w = Window.partitionBy()
    p = F.pow(F.col("tokens"), F.lit(_MIX_ALPHA))
    return s.select(
        "source", "n_docs", "tokens",
        F.round(p / F.sum(p).over(w), 6).alias("mix_weight"),
    )


@_register(
    "doc_dsir_weights",
    dsir.importance_weights_sql("documents", target_predicate="lang = 'en'"),
    tags="DSIR data selection (Xie et al. 2023): hashed-unigram importance "
         "log-weights of every doc against the lang='en' target slice — "
         "one token-scale shuffle (map-side combined to doc×bucket), "
         "64-cell broadcast model, portable md5 bucket tier for the oracle",
    bench_build=lambda spark, sf_dir: dsir.importance_weights(
        load(spark, sf_dir, "documents"), F.col("lang") == "en", portable_hash=False
    ),
)
def doc_dsir_weights(spark, sf_dir):
    """DSIR importance weights (operators/dsir.py): ln p_target/p_raw
    of each document's hashed unigram bag, target = the English slice.
    The bench tier swaps the oracle's md5 bucket hash for xxhash64
    (identical plan shape). Reference analog: none — corpus-selection
    surface mandated by the brief."""
    return dsir.importance_weights(
        load(spark, sf_dir, "documents"), F.col("lang") == "en", portable_hash=True
    )


@_register(
    "doc_dsir_weights_bigram",
    dsir.importance_weights_sql("documents", target_predicate="lang = 'en'", ngram=2),
    tags="DSIR with the paper's full feature space: unigrams + adjacent "
         "bigrams hashed into one bucket space — same one-shuffle/"
         "broadcast-model plan as doc_dsir_weights, ~2x the exploded "
         "feature stream",
    bench_build=lambda spark, sf_dir: dsir.importance_weights(
        load(spark, sf_dir, "documents"), F.col("lang") == "en",
        portable_hash=False, ngram=2,
    ),
)
def doc_dsir_weights_bigram(spark, sf_dir):
    """DSIR importance weights over hashed unigrams+bigrams (ngram=2),
    the feature space of the paper. The bigram stream is built with
    pure array built-ins (slice/zip_with/concat) before the explode —
    map-only, no Python."""
    return dsir.importance_weights(
        load(spark, sf_dir, "documents"), F.col("lang") == "en",
        portable_hash=True, ngram=2,
    )


@_register(
    "doc_dsir_sample",
    dsir.sample_topk_sql("documents", target_predicate="lang = 'en'", k=100),
    tags="DSIR resampling step: without-replacement sample of k docs with "
         "P ∝ exp(importance log-weight) via seeded Gumbel top-k — "
         "replay-deterministic (noise is a pure hash of the doc id), "
         "TakeOrderedAndProject plan (per-partition top-k, k-row merge), "
         "never a global sort of the corpus",
)
def doc_dsir_sample(spark, sf_dir):
    """DSIR selection (operators/dsir.py): importance weights against
    the lang='en' target slice, then the Gumbel top-k trick draws the
    100-doc training sample ∝ exp(weight) with hash-seeded noise —
    the full select-your-pretraining-data loop, end to end, with the
    DuckDB oracle replaying both stages bit-for-bit."""
    w = dsir.importance_weights(
        load(spark, sf_dir, "documents"), F.col("lang") == "en", portable_hash=True
    )
    return dsir.gumbel_topk(w, k=100)


def headline_names() -> list[str]:
    return [s.name for s in REGISTRY.values() if s.headline]
