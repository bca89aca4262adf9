"""Local replica of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB over
the same sf dir, sorts columns by name, and compares the row multisets
value-by-value. Exit code 1 on any mismatch.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]

A full-registry run (no query filter) also writes the driver-format
artifact CORRECTNESS_local.json next to this repo's BENCH files, so a
reviewer can diff the committed record instead of re-running ~90
queries.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from oec_etl_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def canon(df) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(r[c]) for c in cols) for _, r in df[cols].iterrows()]
    return sorted(rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="check_oracles", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    record: dict[str, dict] = {}
    for name, build in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = build(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            record[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": None,
                            "oracle_rows": None, "err": f"spark: {e}"}
            failures += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{t_spark:.1f}s]")
            # rows_match stays null: only a row count was produced, and the
            # committed artifact must not read as a passed comparison.
            record[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": len(sdf),
                            "oracle_rows": None, "err": None,
                            "note": "no oracle: rows-only check"}
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            record[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": len(sdf),
                            "oracle_rows": None, "err": f"duckdb: {e}"}
            failures += 1
            continue
        a, b = canon(sdf), canon(odf)
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        rec = {"rows_match": len(a) == len(b), "schema_match": scols == ocols,
               "hash_match": a == b, "spark_rows": len(a),
               "oracle_rows": len(b), "err": None}
        record[name] = rec
        if scols != ocols:
            print(f"FAIL  {name}: column mismatch spark={scols} duck={ocols}")
            failures += 1
        elif a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y]
            extra = abs(len(a) - len(b))
            print(
                f"FAIL  {name}: rows spark={len(a)} duck={len(b)};"
                f" first diffs: {diff[:2]}{' +len diff ' + str(extra) if extra else ''}"
            )
            if not diff and extra:
                sa, sb = set(a), set(b)
                print("   only-spark:", list(sa - sb)[:2])
                print("   only-duck :", list(sb - sa)[:2])
            failures += 1
        else:
            print(f"OK    {name}: {len(a)} rows match [{t_spark:.1f}s]")
    spark.stop()
    if not only:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out = os.path.join(repo, "CORRECTNESS_local.json")
        with open(out, "w") as f:
            json.dump({"sf_dir": sf_dir, "queries": record}, f, indent=2)
        print(f"wrote {out} ({len(record)} queries, {failures} failures)")
        # Same gate regenerates the plan evidence, so PLANS.md can never
        # lag the registry again (round-3 finding: plans were committed
        # at 87 queries after the registry grew to 90).
        import subprocess

        subprocess.run(
            [sys.executable, os.path.join(repo, "scripts", "dump_plans.py")],
            check=True,
        )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
