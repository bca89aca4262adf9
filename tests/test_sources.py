"""CSV source tests (SURVEY §2.1 S3): quirky separators/encodings read
back bit-identical to the parquet original under an explicit schema."""

from __future__ import annotations

from pyspark.sql import types as T

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


def test_zip_scan_reads_matching_members_of_all_archives(spark, tmp_path):
    """S2 roundtrip: two multi-member zips → one DataFrame with only the
    pattern-matched members parsed, plus per-row archive/member lineage
    (UnzipStep(pattern=r'\\.csv$') + foreach, Spark-shaped)."""
    import zipfile

    from oec_etl_spark.sources import zip_scan

    for zi in range(2):
        with zipfile.ZipFile(tmp_path / f"part{zi}.zip", "w") as zf:
            zf.writestr("data_a.csv", "x,y\n1,one\n2,two\n")
            zf.writestr("data_b.csv", f"x,y\n{10 + zi},ten\n")
            zf.writestr("README.txt", "not data")  # filtered by pattern
    df = zip_scan(spark, str(tmp_path / "*.zip"), T.StructType([
        T.StructField("x", T.IntegerType()), T.StructField("y", T.StringType()),
    ]))
    rows = df.collect()
    assert len(rows) == 6  # 2 zips x (2+1) csv rows; README excluded
    assert {r["x"] for r in rows} == {1, 2, 10, 11}
    assert {r["member"] for r in rows} == {"data_a.csv", "data_b.csv"}
    assert all(r["source_archive"].endswith(".zip") for r in rows)


def test_multi_file_scan_is_one_read(spark, tmp_path):
    d = _write_csv(spark, tmp_path, sep=",", encoding="UTF-8", n_files=4)
    got = multi_file_scan(spark, f"{d}/*.csv", SCHEMA)
    want = spark.read.parquet(NATION)
    assert got.count() == want.count()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
