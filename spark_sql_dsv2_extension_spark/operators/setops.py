"""Set operations & dedup (SURVEY §2B "Set operations / dedup").

UNION ALL is shuffle-free (plan concatenation); the distinct variants are
hash aggregates on the full row. At 100 TB, EXCEPT/INTERSECT shuffle both
sides on the row hash — if one side is dimension-sized, an anti/semi join
with a broadcast is the cheaper equivalent (join_left_anti/_semi cover that
shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "set_union_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (keeps duplicates, no shuffle)."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 300000.0).select("o_custkey")
    return a.unionAll(b)


@query(
    "set_union_distinct",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    UNION
    SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union = bag union + distinct hash aggregate."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 300000.0).select("o_custkey")
    return a.union(b).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics) — planned as a left-semi hash join."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.intersect(o)


@query(
    "set_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 200000.0
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) via ``subtract`` — planned as a left-anti hash join."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 200000.0)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.subtract(o)


@query(
    "set_except_all",
    oracle="""
    SELECT l_suppkey FROM lineitem WHERE l_quantity < 10.0
    EXCEPT ALL
    SELECT l_suppkey FROM lineitem WHERE l_quantity > 45.0
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference — multiplicities subtract)."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") < 10.0).select("l_suppkey")
    b = li.filter(F.col("l_quantity") > 45.0).select("l_suppkey")
    return a.exceptAll(b)


@query(
    "distinct_rows",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate FROM lineitem
    """,
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DISTINCT (hash aggregate on all projected columns)."""
    return load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_shipdate"
    ).distinct()


@query(
    "dedup_by_key",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate ASC NULLS LAST, o_orderkey ASC
             ) AS rn
      FROM orders
    )
    WHERE rn = 1
    """,
)
def dedup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-one-per-key with a DETERMINISTIC winner (earliest order, then
    lowest key). ``dropDuplicates([k])`` is the one-shuffle equivalent when
    the winner doesn't matter; this ranked form is what a 100 TB pipeline
    should use — same single shuffle, reproducible output."""
    w = Window.partitionBy("o_custkey").orderBy(
        # NULLS LAST pinned on both engines (Family N1): an order with an
        # unknown date cannot be the "earliest" winner
        F.col("o_orderdate").asc_nulls_last(), F.col("o_orderkey").asc()
    )
    return (
        load(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "set_union_by_name",
    oracle="""
    SELECT c_custkey AS id, c_name AS name, c_acctbal AS balance FROM customer
    UNION ALL BY NAME
    SELECT s_suppkey AS id, s_name AS name FROM supplier
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolving union: unionByName(allowMissingColumns=True) aligns
    columns by NAME and null-fills the missing ones (DuckDB: UNION ALL BY
    NAME) — the union you actually want when appending a new data source
    whose schema lags the canonical one."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("balance"),
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"), F.col("s_name").alias("name")
    )
    return c.unionByName(s, allowMissingColumns=True)


@query(
    "set_intersect_all",
    oracle="""
    SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'A'
    INTERSECT ALL
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag intersection keeps min(multiplicity) copies of
    each value (vs INTERSECT's set semantics, `set_intersect`). Spark
    plans it as a counted aggregate on each side plus a join — one shuffle
    per side on the value, no row explosion."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select(F.col("l_suppkey").alias("k"))
    r = li.filter(F.col("l_returnflag") == "R").select(F.col("l_suppkey").alias("k"))
    return a.intersectAll(r)
