"""Scalar function library — pyspark.sql.functions compositions only
(JVM-side, whole-stage-codegen'd); zero per-row Python UDFs."""
