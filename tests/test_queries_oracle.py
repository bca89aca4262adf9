"""Query-surface tests: every SQL-expressible query must match its
DuckDB oracle at sf0.001 (the driver gate runs the same comparison at
sf0.01 — scripts/check_oracles.py replicates that exactly)."""

from __future__ import annotations

import math

import duckdb
import pytest

from oec_etl_spark.plans.queries import REGISTRY

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.9g}"
    return str(v)


def _canon(pdf):
    cols = sorted(pdf.columns)
    return sorted(tuple(_norm(r[c]) for c in cols) for _, r in pdf[cols].iterrows())


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    spec = REGISTRY[name]
    sdf = spec.build(spark, sf_dir).toPandas()
    if spec.oracle is None:
        assert len(sdf) >= 0  # rows-only smoke: runs and returns a frame
        return
    odf = duck.sql(spec.oracle).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert _canon(sdf) == _canon(odf)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"conv_id", "turn_idx", "role", "text", "tool", "ts"}
    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 20
