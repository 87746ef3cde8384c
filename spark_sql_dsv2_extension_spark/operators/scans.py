"""Scan-path operators (SURVEY §2B "Scans / sources / sinks", reference A12-A16).

The reference's scan stack is a Hive SerDe row reader behind a
HMS-partition-pruned file index (V2Table.scala:51-68,
ExternalCatalogFileIndex.scala:41-76, HiveFilePartitionReaderFactory.scala:43-156).
Our engine's equivalent is Spark's vectorized parquet source: column pruning
and filter pushdown reach the scan via Catalyst (check ``PushedFilters`` /
``ReadSchema`` in the plan), and partition pruning falls out of directory
partitioning (see sources/roundtrip.py for the partitioned-write keys).

Scale notes: all keys here are embarrassingly parallel scans — at 100 TB the
only levers are file layout (partitioned + ~128 MB row groups) and pushdown,
both exercised below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "scan_parquet",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table scan, schema-on-read (reference A12 newScanBuilder)."""
    return load(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")


@query(
    "scan_projection_pushdown",
    oracle="""
    SELECT l_orderkey, l_extendedprice FROM lineitem
    """,
)
def scan_projection_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned scan (reference A13 FileScanBuilder.readDataSchema).

    Catalyst prunes the parquet ReadSchema to exactly these two columns —
    at 100 TB this is the difference between reading 2/11 and 11/11 of the
    fact table's bytes.
    """
    return load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")


@query(
    "scan_filter_pushdown",
    oracle="""
    SELECT l_orderkey, l_quantity, l_shipdate FROM lineitem
    WHERE l_quantity < 5.0
    """,
)
def scan_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate pushed to the parquet reader (row-group/page skipping).

    The reference captures data filters but evaluates nothing in the reader
    (HiveFileScan.scala:20-21) — Spark's parquet source actually skips IO.
    """
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") < 5.0)
        .select("l_orderkey", "l_quantity", "l_shipdate")
    )


@query(
    "count_star_fastpath",
    oracle="SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem",
)
def count_star_fastpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(*) without materializing columns (reference A15 fast path,
    HiveFilePartitionReaderFactory.scala:53-55 emits UnsafeRow(0) per record).

    Spark answers this from parquet row-group metadata — zero data pages read.
    """
    return load(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))


@query(
    "scan_file_metadata",
    oracle="""
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT)
             AS row_index,
           TRUE AS from_documents_file
    FROM documents
    """,
)
def scan_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden ``_metadata`` file columns: per-row provenance (source file +
    row index) surfaced by the scan itself — the lineage hook a 100 TB
    pipeline uses to trace any training example back to its shard and
    offset without storing either in the data. Spark materializes these
    from split metadata at scan time (zero extra I/O). The oracle
    reconstructs row_index from the fixture's doc_id ordering (verified:
    documents.parquet is doc_id-sorted at every SF) and checks file
    identity as a basename predicate, since absolute paths differ by
    environment."""
    df = load(spark, sf_dir, "documents")
    return df.select(
        "doc_id",
        F.col("_metadata.row_index").alias("row_index"),
        F.col("_metadata.file_name").endswith("documents.parquet").alias(
            "from_documents_file"
        ),
    )
