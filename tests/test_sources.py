"""CSV source tests (SURVEY §2.1 S3): quirky separators/encodings read
back bit-identical to the parquet original under an explicit schema."""

from __future__ import annotations

from oec_etl_spark.sources import csv_scan, multi_file_scan

NATION = "/root/testdata/sf0.001/nation.parquet"
SCHEMA = "n_nationkey int, n_name string, n_regionkey int"


def _write_csv(spark, tmp_path, sep=";", encoding="ISO-8859-1", n_files=1):
    import pandas as pd

    pdf = pd.read_parquet(NATION)
    d = tmp_path / "csv"
    d.mkdir(exist_ok=True)
    step = (len(pdf) + n_files - 1) // n_files
    for i in range(n_files):
        pdf.iloc[i * step : (i + 1) * step].to_csv(
            d / f"part-{i:02d}.csv", sep=sep, index=False, encoding=encoding
        )
    return str(d)


def test_csv_scan_sep_encoding_roundtrip(spark, tmp_path):
    d = _write_csv(spark, tmp_path, sep=";", encoding="ISO-8859-1")
    got = csv_scan(spark, f"{d}/*.csv", SCHEMA, sep=";", encoding="ISO-8859-1")
    want = spark.read.parquet(NATION)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_multi_file_scan_is_one_read(spark, tmp_path):
    d = _write_csv(spark, tmp_path, sep=",", encoding="UTF-8", n_files=4)
    got = multi_file_scan(spark, f"{d}/*.csv", SCHEMA)
    want = spark.read.parquet(NATION)
    assert got.count() == want.count()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
