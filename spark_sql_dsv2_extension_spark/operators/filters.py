"""Projection & predicate operators (SURVEY §2B "Projection / filter").

All predicates here are Catalyst-pushable: at 100 TB each one reaches the
parquet scan as ``PushedFilters`` (row-group + page skipping), so the cost is
proportional to selectivity, not table size. Per-row double arithmetic is
IEEE-754-identical across engines, so projected expressions compare exactly
against the oracle without any determinism tricks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "project_expr",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           l_quantity + 1.0 AS qty_plus
    FROM lineitem
    """,
)
def project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic projection + aliasing (per-row, bit-exact across engines)."""
    li = load(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc.alias("disc_price"),
        (disc * (1 + F.col("l_tax"))).alias("charge"),
        (F.col("l_quantity") + 1.0).alias("qty_plus"),
    )


@query(
    "filter_compound",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE (l_quantity > 30.0 AND l_discount < 0.05)
       OR (l_returnflag = 'R' AND NOT (l_tax > 0.02))
    """,
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT with comparisons — one conjunctive tree pushed to the scan."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        ((F.col("l_quantity") > 30.0) & (F.col("l_discount") < 0.05))
        | ((F.col("l_returnflag") == "R") & ~(F.col("l_tax") > 0.02))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@query(
    "filter_null_semantics",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END AS price_np
      FROM orders
    )
    SELECT o_orderkey,
           price_np IS NULL AS is_null,
           price_np IS NOT NULL AS not_null,
           price_np IS NOT DISTINCT FROM 0.0 AS nullsafe_zero
    FROM t
    WHERE price_np IS NULL OR price_np > 150000.0
    """,
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] NULL + null-safe equality (<=>), the semantics the reference's
    overwrite-filter unwrap relies on (EqualNullSafe,
    HiveFileFormatWriteBuilder.scala:190-200)."""
    o = load(spark, sf_dir, "orders")
    price_np = F.when(F.col("o_orderstatus") == "P", F.lit(None)).otherwise(
        F.col("o_totalprice")
    )
    t = o.select("o_orderkey", price_np.alias("price_np"))
    return t.filter(F.col("price_np").isNull() | (F.col("price_np") > 150000.0)).select(
        "o_orderkey",
        F.col("price_np").isNull().alias("is_null"),
        F.col("price_np").isNotNull().alias("not_null"),
        F.col("price_np").eqNullSafe(F.lit(0.0)).alias("nullsafe_zero"),
    )


@query(
    "filter_in_between_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_size, p_type
    FROM part
    WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      AND p_size BETWEEN 10 AND 30
      AND p_type LIKE 'S%'
    """,
)
def filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + BETWEEN + LIKE in one pushable conjunction."""
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & F.col("p_size").between(10, 30)
        & F.col("p_type").like("S%")
    ).select("p_partkey", "p_name", "p_brand", "p_size", "p_type")
