"""Sort / limit / top-k operators (SURVEY §2B "Sorts / limits / top-k").

The driver's value-hash is order-insensitive, so each key makes ordering
*observable* by projecting a rank computed over the total order — a wrong
sort produces wrong ranks, not just a reordered hash.

Scale posture: global ORDER BY is a range-partitioned sort (sampled
boundaries, no single-node sort); ORDER BY + LIMIT k never sorts globally —
Spark plans ``TakeOrderedAndProject`` (per-partition top-k, then a k-sized
merge on the driver); per-group top-k is a window over a single hash shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .quantiles import distributed_row_number
from ..registry import query
from ..tables import load


@query(
    "sort_multi_dir",
    oracle="""
    WITH t AS (
      SELECT c_custkey, c_mktsegment,
             CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
      FROM customer
    )
    SELECT c_custkey, c_mktsegment, bal,
           CAST(row_number() OVER (
             ORDER BY c_mktsegment ASC NULLS LAST, bal DESC NULLS LAST, c_custkey ASC
           ) AS BIGINT) AS rk
    FROM t
    """,
)
def sort_multi_dir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key asc/desc sort with explicit NULLS LAST, made hash-observable
    via the rank column (ties broken by the primary key → total order)."""
    c = load(spark, sf_dir, "customer")
    t = c.select(
        "c_custkey",
        "c_mktsegment",
        F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_acctbal")).alias("bal"),
    )
    order = [
        # NULLS LAST on the segment too (Family N1): Spark's ASC default
        # is NULLS FIRST, DuckDB's is NULLS LAST
        F.col("c_mktsegment").asc_nulls_last(),
        F.col("bal").desc_nulls_last(),
        F.col("c_custkey").asc(),
    ]
    # rank via the distributed helper (range exchange + broadcast
    # offsets) — a global window here would single-task-sort the whole
    # customer table (round-5 fix); the final orderBy is a sort the key
    # itself demonstrates and stays a parallel range sort
    return distributed_row_number(t, order, rn="rk").orderBy(*order)


@query(
    "topk_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 15
    """,
)
def topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (k rows per partition to the
    driver, never a full sort)."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(15)
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             row_number() OVER (
               PARTITION BY c_mktsegment
               ORDER BY c_acctbal DESC, c_custkey ASC
             ) AS rk
      FROM customer
    )
    WHERE rk <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via ranking window (one shuffle on the group key;
    Spark's WindowGroupLimit pushes the k-limit below the sort)."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        load(spark, sf_dir, "customer")
        .select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )
