"""UDF / UDAF / UDTF surface (SURVEY §2B "UDF / UDAF / UDTF").

The reference has no UDF surface of its own (SURVEY §2A coverage notes);
this is the PySpark-native extension point. Performance ladder, which these
keys demonstrate in order:

1. ``udf_python_scalar`` — row-at-a-time Python UDF: per-row pickle
   round-trip, the SLOW path; present for API completeness only.
2. ``udf_pandas_scalar`` — Arrow-vectorized Pandas UDF: ~10-100× faster,
   the correct Python hot path at 100 TB.
3. ``udaf_pandas_grouped`` — GROUPED_AGG Pandas UDF: whole group as a
   Series; group cardinality must fit executor memory per key.
4. ``udtf_python`` — Spark 4 Python UDTF (table function).

Oracles re-express the Python logic in SQL, proving the UDF results equal
the declarative equivalent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf

from ..registry import query
from ..tables import load


def _sql_round(x: pd.Series) -> pd.Series:
    """SQL ROUND (half-AWAY-FROM-ZERO), vectorized — NOT pandas .round().

    pandas/numpy round HALF-EVEN (banker's): a half-cent value (0.5 after
    scaling) rounds to 0 where SQL's round() on BOTH engines gives 1,
    shifting every integer-cents moment built on it
    (EXTREME_AUDIT_r11.md Family X4). The worker must implement the
    ENGINE's rounding, WITHOUT the floor(|x| + 0.5) idiom: for a double
    1 ulp below a half boundary (0.49999999999999994) the +0.5 addition
    carries to exactly 0.5 and floors to 1, while Spark round()
    (BigDecimal HALF_UP on the exact double) and DuckDB round() both give
    0 (r12 ADVICE). Compare the fractional part exactly instead — no
    addition, no carry, exact at every double. NaN propagates (NaN >= 0.5
    is False, but i is NaN so the sum stays NaN).
    """
    f = x.abs()
    i = np.floor(f)
    return (i + ((f - i) >= 0.5)) * np.sign(x).replace(0.0, 1.0)


@query(
    "udf_python_scalar",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice IS NULL THEN NULL
                WHEN o_totalprice >= 300000.0 THEN 'A'
                WHEN o_totalprice >= 100000.0 THEN 'B'
                ELSE 'C' END AS bracket
    FROM orders
    """,
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (deliberately the slow path — each row
    crosses the JVM↔Python boundary individually). NULL prices bracket to
    NULL on both engines (Family N2, NULL_AUDIT_r10.md): an unknown price
    is an unknown bracket, not the else-branch 'C' that bare CASE
    semantics would silently assign."""

    @F.udf(T.StringType())
    def bracket(price: float) -> str:
        if price is None:
            return None
        if price >= 300000.0:
            return "A"
        if price >= 100000.0:
            return "B"
        return "C"

    o = load(spark, sf_dir, "orders")
    return o.select("o_orderkey", bracket("o_totalprice").alias("bracket"))


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge_vec
    FROM lineitem
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched Pandas UDF — whole columns cross the boundary as Arrow
    buffers; numpy does the arithmetic (bit-identical to the SQL oracle
    because IEEE-754 double ops are per-element)."""

    @pandas_udf(T.DoubleType())
    def charge(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1 - disc) * (1 + tax)

    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge("l_extendedprice", "l_discount", "l_tax").alias("charge_vec"),
    )


@query(
    "udaf_pandas_grouped",
    oracle="""
    SELECT l_returnflag,
           SUM(CAST(round(l_quantity * 100) AS BIGINT)) / (COUNT(*) * 1e2) AS mean_qty,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udaf_pandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate Pandas UDAF. The mean is computed on integer cents
    so the result doesn't depend on the (shuffle-nondeterministic) row order
    within each group — the same discipline tables.dsum applies engine-wide.

    NULL quantities (Family N2): the oracle's SUM skips NULLs while its
    COUNT(*) counts every row, so the UDF drops NaN before the integer
    cast but divides by the full group size; an all-NULL group yields a
    NULL mean exactly as SUM-of-nothing does."""

    @pandas_udf(T.DoubleType())
    def mean_cents(qty: pd.Series) -> float:
        cents = _sql_round(qty * 100).dropna().astype("int64")
        if len(cents) == 0:
            return None
        return float(cents.sum()) / (len(qty) * 100.0)

    # Spark disallows mixing GROUPED_AGG pandas UDFs with built-in
    # aggregates in one agg() — the count is a second pandas UDAF.
    @pandas_udf(T.LongType())
    def n_rows(qty: pd.Series) -> int:
        return len(qty)

    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        mean_cents("l_quantity").alias("mean_qty"),
        n_rows("l_quantity").alias("n"),
    )


@query(
    "udaf_grouped_map_zscore",
    oracle="""
    WITH stats AS (
      SELECT l_returnflag,
             SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS cents,
             SUM(CAST(round(l_quantity * 100) AS BIGINT)
                 * CAST(round(l_quantity * 100) AS BIGINT)) AS cents_sq,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
           (l.l_quantity - s.cents / (s.n * 1e2)) /
           nullif(sqrt(greatest(
             s.cents_sq / (s.n * 1e4)
             - (s.cents / (s.n * 1e2)) * (s.cents / (s.n * 1e2)), 0)), 0)
             AS qty_z
    FROM lineitem l JOIN stats s
      ON l.l_returnflag IS NOT DISTINCT FROM s.l_returnflag
    """,
)
def udaf_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-MAP pandas transform (applyInPandas): whole group in, whole
    group out — per-group z-score normalization, the shape windowless
    per-group feature engineering takes. Moments are computed on integer
    cents (Σc, Σc²) so the result is independent of row order within the
    group and matches the SQL oracle bit-for-bit.

    Zero-variance groups need a COORDINATED gate on both sides
    (DEGENERATE_AUDIT_r8.md Family C — the only key where the ORACLE
    itself raised): a constant group's sample variance is 0, and float
    cancellation can leave it epsilon-negative, so DuckDB's bare sqrt
    threw OutOfRangeException while the pandas worker raised on the
    division. The oracle clamps with sqrt(greatest(var, 0)) and NULLifies
    the zero stddev; the UDF mirrors it exactly (max(var, 0), NaN z-score
    when std == 0 — the driver-matched canonicalizer equates NaN with
    NULL). Non-degenerate groups evaluate the identical expression as
    before. NULL group keys (Family N2 rider): groupBy keeps a NULL
    l_returnflag group per SQL GROUP BY semantics, so the oracle joins
    stats back NULL-safely (IS NOT DISTINCT FROM) instead of USING,
    which would silently drop the NULL-flag rows."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        # NULL quantities (Family N2): drop NaN before the integer cast —
        # the oracle's SUMs skip NULLs while its n = count(*) counts every
        # row, and a NULL quantity's z-score is NULL via NaN propagation
        # in the (qty - mean) / std expression below, matching the
        # oracle's NULL arithmetic row-for-row.
        cents = _sql_round(pdf["l_quantity"] * 100).dropna().astype("int64")
        n = len(pdf)
        if len(cents) == 0:
            # oracle: SUM over an all-NULL group is NULL, so every z is NULL
            z = pd.Series(float("nan"), index=pdf.index)
        else:
            mean = int(cents.sum()) / (n * 1e2)
            var = int((cents * cents).sum()) / (n * 1e4) - mean * mean
            std = max(var, 0.0) ** 0.5
            z = (
                (pdf["l_quantity"] - mean) / std
                if std > 0
                else pd.Series(float("nan"), index=pdf.index)
            )
        return pd.DataFrame(
            {
                "l_orderkey": pdf["l_orderkey"],
                "l_linenumber": pdf["l_linenumber"],
                "l_returnflag": pdf["l_returnflag"],
                "qty_z": z,
            }
        )

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    return li.groupBy("l_returnflag").applyInPandas(
        zscore,
        "l_orderkey BIGINT, l_linenumber INT, l_returnflag STRING, qty_z DOUBLE",
    )


@query(
    "udtf_python",
    oracle="""
    SELECT o_orderkey, unnest(['hi', 'lo']) AS half,
           unnest([o_totalprice * 0.75, o_totalprice * 0.25]) AS amount
    FROM orders
    WHERE o_totalprice > 450000.0
    """,
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function): one input row → several output
    rows with computed columns. Runs per-partition; no driver involvement."""

    @udtf(returnType="half: string, amount: double")
    class SplitAmount:
        def eval(self, price: float):
            yield "hi", price * 0.75
            yield "lo", price * 0.25

    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000.0)
        .select("o_orderkey", "o_totalprice")
    )
    # lateral-join the UDTF against each input row via the SQL surface
    o.createOrReplaceTempView("big_orders")
    spark.udtf.register("split_amount", SplitAmount)
    return spark.sql(
        """
        SELECT o_orderkey, s.half, s.amount
        FROM big_orders, LATERAL split_amount(o_totalprice) s
        """
    )


@query(
    "udf_map_in_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(CAST(l_extendedprice * (1 - l_discount) - l_quantity * 10.0
                 AS DOUBLE), 4) AS margin
    FROM lineitem WHERE l_orderkey % 50 = 0
    """,
)
def udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInPandas`` — the whole-partition Arrow iterator, completing the
    Python-boundary ladder (row UDF → pandas UDF → grouped agg → grouped
    map → UDTF → partition iterator). The function sees each partition as
    a STREAM of Arrow batches (constant memory regardless of partition
    size — unlike grouped-map, which materializes a group), which is the
    right Python escape hatch for per-batch model inference at 100 TB.
    Here the batch op is vectorized pandas arithmetic; values are IEEE
    ops on parquet-exact inputs, rounded for the 1-ulp margin."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)

    def per_batch(batches):
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "l_orderkey": pdf["l_orderkey"],
                    "l_linenumber": pdf["l_linenumber"],
                    "margin": (
                        pdf["l_extendedprice"] * (1 - pdf["l_discount"])
                        - pdf["l_quantity"] * 10.0
                    ).round(4),
                }
            )
            yield out

    return li.select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_quantity"
    ).mapInPandas(
        per_batch,
        "l_orderkey BIGINT, l_linenumber INT, margin DOUBLE",
    ).select("l_orderkey", "l_linenumber", "margin")


@query(
    "udf_arrow_scalar",
    oracle="""
    SELECT doc_id,
           (n_chars * 31 + len(source)) % 97 AS shard,
           upper(source[1:3]) || '-' || lang AS tag
    FROM documents
    """,
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python scalar UDF (``useArrow=True``) — the middle
    rung between the row-pickling classic UDF and the pandas UDF: same
    per-row Python function, but batches cross the JVM boundary as Arrow
    record batches (SPARK-40307), cutting serialization cost several-fold
    without rewriting the function vectorized. Same deterministic
    arithmetic as the classic-UDF key so the ladder is comparable."""
    from pyspark.sql.functions import udf

    # None in → None out (Family N2): mirrors the oracle's natural NULL
    # propagation through arithmetic and string concatenation.
    @udf("long", useArrow=True)
    def shard_of(n_chars: int, source: str) -> int:
        if n_chars is None or source is None:
            return None
        return (n_chars * 31 + len(source)) % 97

    @udf("string", useArrow=True)
    def tag_of(source: str, lang: str) -> str:
        if source is None or lang is None:
            return None
        return source[:3].upper() + "-" + lang

    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        shard_of("n_chars", "source").alias("shard"),
        tag_of("source", "lang").alias("tag"),
    )


@query(
    "udtf_arrow",
    oracle="""
    SELECT o_orderkey,
           unnest(['q1', 'q2', 'q3', 'q4']) AS quarter,
           unnest([CAST(round(o_totalprice * 100) AS BIGINT) // 4,
                   CAST(round(o_totalprice * 100) AS BIGINT) // 4,
                   CAST(round(o_totalprice * 100) AS BIGINT) // 4,
                   CAST(round(o_totalprice * 100) AS BIGINT)
                   - 3 * (CAST(round(o_totalprice * 100) AS BIGINT) // 4)])
             AS cents
    FROM orders WHERE o_totalprice > 490000.0
    """,
)
def udtf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARROW-optimized Python UDTF (Spark 4 ``useArrow=True``): the same
    table-function surface as udtf_python but with Arrow-batched transfer
    instead of pickled rows — the variant that keeps UDTFs viable in a hot
    path. The function splits each order's total into four quarter
    installments with the remainder on the last (exact integer cents, so
    the oracle reproduces every row).

    Scale: per-partition execution, Arrow both directions — the 10-100x
    row-transfer speedup every other Pandas-UDF rung in this module
    already banks."""
    from pyspark.sql.functions import udtf as _udtf

    @_udtf(returnType="quarter: string, cents: long", useArrow=True)
    class QuarterInstallments:
        def eval(self, cents: int):
            q = cents // 4
            yield "q1", q
            yield "q2", q
            yield "q3", q
            yield "q4", cents - 3 * q

    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 490000.0)
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents0"),
        )
    )
    o.createOrReplaceTempView("huge_orders")
    spark.udtf.register("quarter_installments", QuarterInstallments)
    return spark.sql(
        """
        SELECT o_orderkey, s.quarter, s.cents
        FROM huge_orders, LATERAL quarter_installments(cents0) s
        """
    )
