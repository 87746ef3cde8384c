"""Subqueries (SURVEY §2B "Subqueries") — Catalyst's decorrelation surface.

Correlated subqueries are rewritten by Catalyst into joins (scalar → left
outer + aggregate, EXISTS → left semi, IN → left semi with null handling),
so at 100 TB they cost exactly what the equivalent join costs — these keys
prove the rewrite produces join-equivalent results.

The SQL text is written in the common dialect subset so the SAME string runs
on Spark SQL (over temp views) and DuckDB (the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..tables import load, sql_davg

_SCALAR_SQL = f"""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_totalprice > 1.5 * (SELECT {sql_davg("o_totalprice", 2)} FROM orders)
"""
# 1.5x: the fixtures' totalprice tops out just under 2x the mean, so a 2x
# threshold selected zero rows and the oracle checked nothing

_IN_SQL = """
SELECT o_orderkey, o_custkey
FROM orders
WHERE o_custkey IN (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
) AND o_orderstatus = 'O'
"""

_EXISTS_SQL = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0
)
"""


def _run(spark: SparkSession, sf_dir: str, sql: str, names: tuple[str, ...]) -> DataFrame:
    for name in names:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(sql)


@query("subq_scalar", oracle=_SCALAR_SQL)
def subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in WHERE (uncorrelated → broadcast of one value).
    The threshold uses the deterministic avg so both engines agree bit-exactly."""
    return _run(spark, sf_dir, _SCALAR_SQL, ("orders",))


@query("subq_in", oracle=_IN_SQL)
def subq_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) → left semi join after decorrelation."""
    return _run(spark, sf_dir, _IN_SQL, ("orders", "customer"))


@query("subq_exists_correlated", oracle=_EXISTS_SQL)
def subq_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS → left semi join on the correlation key."""
    return _run(spark, sf_dir, _EXISTS_SQL, ("orders", "customer"))


_LATERAL_SQL = """
    SELECT c_custkey, c_name,
           o.o_orderkey AS latest_order, o.o_totalprice AS latest_price
    FROM customer, LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders WHERE o_custkey = c_custkey
      ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1
    ) o
"""


@query("subq_lateral", oracle=_LATERAL_SQL)
def subq_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (top-1 order per customer) — the same
    SQL text runs on both engines. Catalyst decorrelates the LATERAL into
    a ranked window join, so despite the per-row subquery syntax the plan
    is one shuffle, not N queries."""
    return _run(spark, sf_dir, _LATERAL_SQL, ("customer", "orders"))


_NOT_IN_SQL = """
SELECT c_custkey, c_name
FROM (
  SELECT c_custkey, c_name, nullif(c_nationkey, 3) AS nk FROM customer
) c
WHERE nk NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
"""


@query("subq_not_in_null", oracle=_NOT_IN_SQL)
def subq_not_in_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with NULLs on the outer side — SQL's three-valued-logic trap.
    ``NULL NOT IN (...)`` is UNKNOWN, so every nation-3 customer (nulled by
    the nullif) is excluded even though 3 may be absent from the list.
    Catalyst plans this as a null-aware anti join (the reference leans on
    the same rewrite for its Q16-style filters); both engines implement
    ANSI semantics, so the oracle is the identical SQL text."""
    return _run(spark, sf_dir, _NOT_IN_SQL, ("customer", "nation"))


_SCALAR_SELECT_SQL = """
SELECT o_orderkey, o_totalprice,
       (SELECT max(l.l_extendedprice) FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey) AS max_line_price,
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey) AS n_lines
FROM orders o
WHERE o_orderkey % 40 = 0
"""


@query("subq_scalar_correlated_select", oracle=_SCALAR_SELECT_SQL)
def subq_scalar_correlated_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORRELATED scalar subqueries in the SELECT list — per-order lookups
    into the fact table, the shape analysts write constantly. Catalyst
    decorrelates each into a left-outer aggregate join (one shuffle per
    subquery, never a per-row probe), so orders without lines surface as
    NULL/0 exactly like the oracle. max/count are both exact (no float
    accumulation)."""
    return _run(spark, sf_dir, _SCALAR_SELECT_SQL, ("orders", "lineitem"))


_RECURSIVE_SPARK_SQL = """
WITH RECURSIVE h(k, name, depth, path) AS (
  SELECT n_nationkey, n_name, CAST(0 AS BIGINT), CAST(n_name AS STRING)
  FROM nation WHERE n_nationkey = 0
  UNION ALL
  SELECT n.n_nationkey, n.n_name, h.depth + 1, h.path || '>' || n.n_name
  FROM nation n JOIN h ON (n.n_nationkey - 1) DIV 2 = h.k
  WHERE n.n_nationkey > 0
)
SELECT k AS n_nationkey, name AS n_name, depth, path FROM h
"""


@query(
    "sql_recursive_hierarchy",
    oracle="""
    WITH RECURSIVE h(k, name, depth, path) AS (
      SELECT n_nationkey, n_name, CAST(0 AS BIGINT), CAST(n_name AS VARCHAR)
      FROM nation WHERE n_nationkey = 0
      UNION ALL
      SELECT n.n_nationkey, n.n_name, h.depth + 1, h.path || '>' || n.n_name
      FROM nation n JOIN h ON (n.n_nationkey - 1) // 2 = h.k
      WHERE n.n_nationkey > 0
    )
    SELECT k AS n_nationkey, name AS n_name, depth, path FROM h
    """,
)
def sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE (Spark 4): hierarchy traversal in pure SQL — the
    nation table arranged as a binary tree (parent(k) = (k−1) div 2) and
    walked from the root, accumulating depth and the root path. This is
    the org-chart / category-tree / BOM-rollup query shape that previously
    required a driver-side loop of joins (ext_dedup_clusters' pattern);
    WITH RECURSIVE pushes the whole fixpoint into the engine, one
    iteration per level (tree depth, here 5), each iteration a small
    broadcast-able join.

    Scale: work per iteration is the frontier x edge join — for fan-out
    hierarchies the frontier is bounded by the level width, and Spark
    plans each step like any other join (AQE included). Dialects differ
    only in integer division (DIV vs //) and the string cast."""
    return _run(spark, sf_dir, _RECURSIVE_SPARK_SQL, ("nation",))
