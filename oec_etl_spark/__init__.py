"""oec_etl_spark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Re-expresses the ingest surface of the reference repo (pedrocondor/oec-etl,
a pandas→ClickHouse batch ETL; see /root/reference) as an idiomatic Spark
engine:

- ``streaming/`` — the core: Structured-Streaming change-log tail →
  last-writer-wins MERGE upsert into a snapshot-versioned lake table
  (Iceberg SQL when the runtime jar is present; an atomic
  parquet-manifest sink with identical MERGE semantics otherwise),
  with schema evolution, exactly-once batch guards, per-partition
  lineage and checkpoint resume.
- ``operators/`` — every distinct data operation found in the reference
  (SURVEY.md §2: projections, filters, recodes, unpivot/explode
  reshape, dedup) plus the training-data-pipeline operators a 100 TB
  corpus needs (exact/MinHash-LSH/SimHash dedup, ANN similarity,
  text quality / language-id / token statistics).
- ``functions/`` — scalar function library (banded lookups, text
  metrics, vector math) built ONLY from ``pyspark.sql.functions``
  (JVM-side, codegen'd); no per-row Python anywhere.
- ``sources/`` — schema'd batch + streaming readers (CSV with header
  override, change-log segment directories).
- ``plans/`` — the named query surface exported through
  ``__spark_entry__.py`` and ``bench.py``.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

__version__ = "0.1.0"
