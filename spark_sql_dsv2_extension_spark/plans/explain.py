"""Plan-inspection helpers (the engine's optimizer audit surface).

The reference's performance mechanisms are plan-level (metastore partition
pruning, file-listing cache, COUNT(*) fast path — SURVEY §4); in this engine
the equivalents are Catalyst features that must be VISIBLE in the physical
plan. These helpers make plan properties assertable in tests so regressions
in pushdown / join strategy / partial aggregation fail CI, not production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed (post-AQE-preparation) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """``EXPLAIN FORMATTED`` output — includes PushedFilters / ReadSchema."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def has_cartesian(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section(s) of the formatted plan."""
    out = []
    for line in formatted_plan(df).splitlines():
        if "PushedFilters" in line:
            out.append(line.strip())
    return "\n".join(out)


def read_schema(df: DataFrame) -> str:
    """The ReadSchema section(s) of the formatted plan (column pruning)."""
    out = []
    for line in formatted_plan(df).splitlines():
        if "ReadSchema" in line:
            out.append(line.strip())
    return "\n".join(out)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (scale-cost proxy)."""
    return physical_plan(df).count("Exchange hashpartitioning") + physical_plan(
        df
    ).count("Exchange rangepartitioning")
