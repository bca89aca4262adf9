"""Operator library: SURVEY.md §2 re-expressed Spark-first, plus
training-data-pipeline operators (dedup, similarity, text analysis)."""

from oec_etl_spark.operators.lww import lww_reduce, materialize  # noqa: F401
