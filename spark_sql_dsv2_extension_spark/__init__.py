"""spark_sql_dsv2_extension_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference (permanentstar/spark-sql-dsv2-extension, a Spark 3 DSv2 Hive
catalog connector — see SURVEY.md), re-expressed idiomatically on public
PySpark 4 APIs:

- ``session``    — SparkSession factory (UTC, AQE, arrow) [SURVEY §7 M0]
- ``catalog``    — named-catalog / namespace / table DDL layer (reference
  operators A1-A11, A24-A28; V2ExternalCatalog.scala, V2Table.scala)
- ``tables``     — parquet table registry over the test fixture dirs
- ``registry``   — query inventory: every operator registers a
  (spark_fn, oracle_sql) pair consumed by ``__spark_entry__.py``
- ``operators``  — the relational surface (SURVEY §2B)
- ``functions``  — scalar function families (SURVEY §2B fn_*)
- ``sources``    — read/write paths: csv/json round-trips, partitioned
  writes with dynamic overwrite (reference A12-A23)
- ``streaming``  — Structured Streaming window/watermark/dedup operators
- ``extensions`` — LLM-data-pipeline operators beyond the reference:
  dedup (exact/MinHash/SimHash/Jaccard), embedding similarity search,
  text analysis, multimodal columns (SURVEY §2C)
- ``plans``      — plan-inspection helpers (pushdown/broadcast audits)
"""

__version__ = "0.1.0"
