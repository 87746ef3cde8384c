"""Composite analytical workloads (TPC-H-shaped; SURVEY §2B composition).

Single-operator keys prove each primitive; these keys prove the primitives
COMPOSE — multi-join + multi-aggregate + subquery in one plan, the shape
real reporting queries take. Modeled on TPC-H Q1/Q5/Q16 over the driver's
TPC-H-ish fixtures (column subsets differ from the official spec where the
fixtures lack columns; the operator composition is the point).

Scale notes: these are the plans AQE was built for — star joins where
dimension sides broadcast, fact-fact joins shuffle on the key, partial
aggregation runs map-side, and runtime stats re-plan the join order. No
driver materialization anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import davg, dsum, load, sql_davg, sql_dsum


@query(
    "tpch_q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum("l_quantity", 2)} AS sum_qty,
           {sql_dsum("l_extendedprice", 2)} AS sum_base_price,
           {sql_dsum("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
           {sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)}
             AS sum_charge,
           {sql_davg("l_quantity", 2)} AS avg_qty,
           {sql_davg("l_extendedprice", 2)} AS avg_price,
           {sql_davg("l_discount", 2)} AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: the canonical scan-heavy aggregate — 8 aggregates over a
    date-filtered fact scan, grouped by two low-cardinality flags. The
    filter pushes to parquet; partial aggregation collapses 600k rows to 4
    groups map-side, so the shuffle carries ~4 rows per task."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= "1998-09-02"
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", 2).alias("sum_qty"),
            dsum("l_extendedprice", 2).alias("sum_base_price"),
            dsum(disc_price, 4).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            davg("l_quantity", 2).alias("avg_qty"),
            davg("l_extendedprice", 2).alias("avg_price"),
            davg("l_discount", 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "tpch_q5_local_volume",
    oracle=f"""
    SELECT n_name,
           {sql_dsum("l_extendedprice * (1 - l_discount)", 4)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def tpch_q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: six-table star join (two fact tables, four dimensions)
    with a same-nation correlation between customer and supplier. The
    dimensions (supplier/nation/region/customer-at-this-sf) broadcast; the
    orders⋈lineitem fact join is the only large shuffle. This is the query
    join-reordering exists for — Catalyst pushes the region filter through
    nation into supplier before any fact joins."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
    )


@query(
    "tpch_q16_supplier_cnt",
    oracle="""
    SELECT p_brand, p_type,
           CAST(count(DISTINCT s_suppkey) AS BIGINT) AS supplier_cnt
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE p_brand <> 'Brand#1'
      AND s_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type
    """,
)
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: join + NOT IN subquery (null-aware anti join) +
    COUNT(DISTINCT) per group. The anti join broadcasts the excluded-key
    set; the distinct aggregate expands to a two-phase plan (distinct on
    (group, suppkey), then count per group)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    excluded = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        p.join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(s.join(excluded, "s_suppkey", "left_anti"), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("s_suppkey").cast("long").alias("supplier_cnt"))
    )


@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum("l_extendedprice * (1 - l_discount)", 4)} AS revenue,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_orderdate_epoch,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-03-15'
      AND l_shipdate  > TIMESTAMP '1997-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: the classic shipping-priority top-k — segment-filtered
    customer broadcast into orders, fact-fact join to lineitem, grouped
    revenue, global top-10 (TakeOrderedAndProject, no full sort). Both
    date filters push to the parquet scans; the only shuffle is
    orders⋈lineitem on the order key. o_orderdate is projected as an epoch
    bigint (temporal outputs as numbers keeps the oracle comparison exact).
    """
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1997-03-15")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-03-15")
    return (
        o.join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.unix_timestamp("o_orderdate").alias("o_orderdate_epoch"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {sql_dsum("l_extendedprice * (1 - l_discount)", 4)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue ranking — quarter-filtered orders
    joined to return-flagged lineitems, nation broadcast onto the customer
    dimension, top-20 customers by lost revenue. The o_orderdate range and
    l_returnflag equality both reach PushedFilters; AQE sizes the
    orders⋈lineitem shuffle from runtime stats."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "tpch_q18_large_volume",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice,
           SUM(CAST(round(l_quantity * 100) AS BIGINT)) / 1e2 AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(round(l_quantity * 100) AS BIGINT)) > 30000
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    """,
)
def tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume-customer — an aggregated HAVING subquery
    feeding a semi join back onto the same fact table, then a second
    grouped aggregate. The qualifying-order set is tiny after the HAVING
    cut, so it broadcasts into the semi join; the quantity threshold is
    compared in exact int64 (scaled) so both engines make the identical
    cut. One logical lineitem scan serves both sides (same parquet
    splits; Spark reuses the exchange under AQE where possible)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    qscaled = F.sum(F.round(F.col("l_quantity") * 100).cast("long"))
    big = (
        li.groupBy("l_orderkey")
        .agg(qscaled.alias("q"))
        .filter(F.col("q") > 30000)
        .select("l_orderkey")
    )
    return (
        o.join(F.broadcast(big), F.col("o_orderkey") == big["l_orderkey"], "left_semi")
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg((qscaled / F.lit(1e2)).alias("sum_qty"))
    )
