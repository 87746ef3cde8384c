"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The inventory itself lives in ``spark_sql_dsv2_extension_spark`` — each
operator module registers (name, spark_fn, oracle_sql) triples with
``spark_sql_dsv2_extension_spark.registry``; this file only re-exposes them.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_sql_dsv2_extension_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (driver checks rows>0).

    TPC-H Q3 shape: scan → filter → 3-way join → agg → sort → limit,
    exercising the full §3.1 lifecycle (partition-pruned scans, broadcast +
    shuffle joins, hash aggregation, top-k) in one plan.
    """
    from spark_sql_dsv2_extension_spark.operators.joins import flagship_q3

    return flagship_q3(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in registry.load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query key."""
    return {
        name: spec.oracle
        for name, spec in registry.load_all().items()
        if spec.oracle is not None
    }
