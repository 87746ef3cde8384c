"""Unit tests for the shared distributed quantile helper (round-5).

``distributed_ntile`` / ``distributed_row_number`` must be bit-identical
to the single-task ``F.ntile``/``F.row_number`` global windows they
replace, for any bucket count (including B > n) and descending orders —
and deterministic when the same input feeds several helper calls in one
plan (the RangePartitioner-seed regression: without the pinned
materialization, plan branches could draw different partition boundaries
and emit an impossible extra bucket).
"""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from spark_sql_dsv2_extension_spark.operators.quantiles import (
    distributed_ntile,
    distributed_row_number,
)


def _df(spark, n=5003, seed=11):
    rnd = random.Random(seed)
    rows = [(i, rnd.randint(0, 40)) for i in range(n)]
    return spark.createDataFrame(rows, "id BIGINT, v BIGINT")


def test_ntile_matches_native_window(spark):
    df = _df(spark)
    for b in (4, 10, 64, 5003, 9999):
        got = distributed_ntile(df, [F.col("v"), F.col("id")], b, out="b")
        exp = df.withColumn("b", F.ntile(b).over(Window.orderBy("v", "id")))
        assert got.select("id", "b").exceptAll(exp.select("id", "b")).count() == 0, b


def test_row_number_matches_native_window(spark):
    df = _df(spark)
    got = distributed_row_number(df, ["v", "id"], rn="r")
    exp = df.withColumn(
        "r", F.row_number().over(Window.orderBy("v", "id")).cast("long")
    )
    assert got.select("id", "r").exceptAll(exp.select("id", "r")).count() == 0


def test_ntile_descending_order(spark):
    df = _df(spark)
    order = [F.col("v").desc(), F.col("id").desc()]
    got = distributed_ntile(df, order, 7, out="b")
    exp = df.withColumn("b", F.ntile(7).over(Window.orderBy(*order)))
    assert got.select("id", "b").exceptAll(exp.select("id", "b")).count() == 0


def test_two_helper_calls_in_one_plan_stay_consistent(spark):
    """Regression: two distributed_ntile subtrees unioned in one action
    must each produce exactly B buckets. Before the pinned
    materialization, re-executed range exchanges could sample different
    boundaries per branch (seed includes rdd.id), yielding a 65th bucket
    from a 64-bucket request, flakily."""
    df = _df(spark, n=20011)
    a = distributed_ntile(df, ["id"], 64, out="b").groupBy("b").count()
    b = distributed_ntile(df, ["v", "id"], 64, out="b").groupBy("b").count()
    pdf = a.unionAll(b).toPandas()
    assert len(pdf) == 128
    assert pdf["b"].min() == 1 and pdf["b"].max() == 64
    assert pdf["count"].sum() == 2 * 20011


def test_distributed_fill_matches_native_windows(spark):
    """distributed_fill must equal the unpartitioned last/first
    IGNORE NULLS windows it replaces (forward + backward in one call)."""
    rnd = random.Random(3)
    rows = [(i, rnd.randint(0, 50), rnd.random() < 0.3) for i in range(8009)]
    df = spark.createDataFrame(rows, "id BIGINT, s BIGINT, ctl BOOLEAN")
    val = F.when(F.col("ctl"), F.col("s"))
    from spark_sql_dsv2_extension_spark.operators.quantiles import (
        distributed_fill,
    )

    got = distributed_fill(df, ["s", "id"], val, out_prev="p", out_next="nx")
    wp = Window.orderBy("s", "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wn = Window.orderBy("s", "id").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    exp = df.select(
        "id",
        F.last(val, ignorenulls=True).over(wp).alias("p"),
        F.first(val, ignorenulls=True).over(wn).alias("nx"),
    )
    assert got.select("id", "p", "nx").exceptAll(exp).count() == 0
    assert exp.exceptAll(got.select("id", "p", "nx")).count() == 0
    # all-null value column: fills stay null everywhere
    allnull = distributed_fill(
        df.withColumn("ctl", F.lit(False)), ["s", "id"], val, out_prev="p"
    )
    assert allnull.filter(F.col("p").isNotNull()).count() == 0


def test_distributed_running_sum_matches_native(spark):
    rnd = random.Random(5)
    rows = [(i, rnd.randint(1, 1000)) for i in range(6007)]
    df = spark.createDataFrame(rows, "id BIGINT, b BIGINT")
    from spark_sql_dsv2_extension_spark.operators.quantiles import (
        distributed_running_sum,
    )

    got = distributed_running_sum(df, ["id"], "b", out="cum")
    w = Window.orderBy("id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    exp = df.select("id", F.sum("b").over(w).cast("long").alias("cum"))
    assert got.select("id", "cum").exceptAll(exp).count() == 0
    assert exp.exceptAll(got.select("id", "cum")).count() == 0


def test_distributed_running_sum_multi_column(spark):
    rnd = random.Random(9)
    rows = [(i, rnd.randint(0, 3), rnd.randint(0, 3)) for i in range(3001)]
    df = spark.createDataFrame(rows, "id BIGINT, a BIGINT, b BIGINT")
    from spark_sql_dsv2_extension_spark.operators.quantiles import (
        distributed_running_sum,
    )

    got = distributed_running_sum(df, ["id"], ["a", "b"], ["ca", "cb"])
    w = Window.orderBy("id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    exp = df.select(
        "id",
        F.sum("a").over(w).cast("long").alias("ca"),
        F.sum("b").over(w).cast("long").alias("cb"),
    )
    assert got.select("id", "ca", "cb").exceptAll(exp).count() == 0
    assert exp.exceptAll(got.select("id", "ca", "cb")).count() == 0


def test_distributed_running_sum_rejects_fractional_values(spark):
    """The offset arithmetic is exact int64 (repo integer-scaling
    convention); a double value column must be refused loudly, not
    silently truncated at partition boundaries (round-6 verdict ask #5)."""
    import pytest

    from spark_sql_dsv2_extension_spark.operators.quantiles import (
        distributed_running_sum,
    )

    df = spark.createDataFrame(
        [(1, 0.5), (2, 1.25)], "id BIGINT, v DOUBLE"
    )
    with pytest.raises(TypeError, match="non-integral"):
        distributed_running_sum(df, ["id"], "v", out="cum")


def test_distributed_range_sum_matches_native_window(spark):
    """distributed_range_sum must equal the unpartitioned value-RANGE
    frame it replaces — sums AND count, including duplicate order keys
    (peers share frames) and a fractional frame width."""
    from spark_sql_dsv2_extension_spark.operators.quantiles import (
        distributed_range_sum,
    )

    rnd = random.Random(7)
    rows = [(i, rnd.randint(0, 60), rnd.randint(1, 500)) for i in range(7001)]
    df = spark.createDataFrame(rows, "id BIGINT, k BIGINT, v BIGINT")
    got = distributed_range_sum(df, "k", 5, {"s": "v"}, count_out="n")
    w = Window.orderBy("k").rangeBetween(-5, 0)
    exp = df.select(
        "id",
        F.sum("v").over(w).alias("s"),
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
    )
    assert got.select("id", "s", "n").exceptAll(exp).count() == 0
    assert exp.exceptAll(got.select("id", "s", "n")).count() == 0
    # fractional key + fractional delta (bucket = floor(k/delta) on doubles)
    fr = [(i, rnd.randint(0, 400) / 8.0, rnd.randint(1, 9)) for i in range(4001)]
    dff = spark.createDataFrame(fr, "id BIGINT, k DOUBLE, v BIGINT")
    got2 = distributed_range_sum(dff, "k", 2.5, {"s": "v"}, count_out="n")
    # PySpark's rangeBetween only takes integer bounds; fractional frames
    # need the SQL form
    frame = "OVER (ORDER BY k RANGE BETWEEN 2.5 PRECEDING AND CURRENT ROW)"
    exp2 = dff.select(
        "id",
        F.expr(f"sum(v) {frame}").alias("s"),
        F.expr(f"CAST(count(*) {frame} AS BIGINT)").alias("n"),
    )
    assert got2.select("id", "s", "n").exceptAll(exp2).count() == 0
    assert exp2.exceptAll(got2.select("id", "s", "n")).count() == 0


def test_helpers_null_order_keys_match_native(spark):
    """NULL order keys through the rank/ntile/fill/running-sum helpers:
    repartitionByRange and the in-partition windows both sort NULLS
    FIRST, so results must be bit-identical to the native unpartitioned
    windows (which do the same). Guards the class of silent-divergence
    bug found in distributed_range_sum during the round-6 review."""
    from spark_sql_dsv2_extension_spark.operators.quantiles import (
        distributed_fill,
        distributed_ntile,
        distributed_row_number,
        distributed_running_sum,
    )

    rnd = random.Random(23)
    rows = [
        (i, None if rnd.random() < 0.15 else rnd.randint(0, 25),
         rnd.randint(1, 9))
        for i in range(4001)
    ]
    df = spark.createDataFrame(rows, "id BIGINT, s BIGINT, v BIGINT")
    order = ["s", "id"]  # id tie-break keeps the order total despite NULLs
    # row_number
    got = distributed_row_number(df, order, rn="r")
    exp = df.withColumn(
        "r", F.row_number().over(Window.orderBy(*order)).cast("long")
    )
    assert got.select("id", "r").exceptAll(exp.select("id", "r")).count() == 0
    # ntile
    gotn = distributed_ntile(df, order, 7, out="b")
    expn = df.withColumn("b", F.ntile(7).over(Window.orderBy(*order)))
    assert gotn.select("id", "b").exceptAll(expn.select("id", "b")).count() == 0
    # forward fill over a value that is NULL whenever s is NULL
    val = F.when(F.col("s").isNotNull(), F.col("v"))
    gotf = distributed_fill(df, order, val, out_prev="p")
    wp = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    expf = df.select("id", F.last(val, ignorenulls=True).over(wp).alias("p"))
    assert gotf.select("id", "p").exceptAll(expf).count() == 0
    assert expf.exceptAll(gotf.select("id", "p")).count() == 0
    # running sum (ROWS frame: NULL keys sort first, ties broken by id)
    gots = distributed_running_sum(df, order, "v", out="c")
    exps = df.select("id", F.sum("v").over(wp).cast("long").alias("c"))
    assert gots.select("id", "c").exceptAll(exps).count() == 0
    assert exps.exceptAll(gots.select("id", "c")).count() == 0


def test_helpers_empty_input(spark):
    """Zero-row inputs must come back empty (with the output columns
    present), not error — the degenerate case every caller hits on a
    filtered-out partition."""
    from spark_sql_dsv2_extension_spark.operators.quantiles import (
        distributed_ntile,
        distributed_range_sum,
        distributed_row_number,
        distributed_running_sum,
    )

    df = spark.createDataFrame([], "id BIGINT, k BIGINT, v BIGINT")
    assert distributed_row_number(df, ["k", "id"], rn="r").count() == 0
    assert distributed_ntile(df, ["k", "id"], 4, out="b").count() == 0
    assert distributed_running_sum(df, ["k"], "v", out="c").count() == 0
    out = distributed_range_sum(df, "k", 5, {"s": "v"}, count_out="n")
    assert out.count() == 0
    assert {"s", "n"} <= set(out.columns)


def test_distributed_range_sum_null_keys_match_native(spark):
    """Rows with a NULL order key are one peer group whose frame is
    exactly the NULL rows — they must be KEPT with the native window's
    results, not dropped by the bucket equi-join (round-6 review
    finding). Also guards delta<=0 rejection."""
    import pytest

    from spark_sql_dsv2_extension_spark.operators.quantiles import (
        distributed_range_sum,
    )

    rnd = random.Random(17)
    rows = [
        (i, None if rnd.random() < 0.1 else rnd.randint(0, 30),
         rnd.randint(1, 50))
        for i in range(3001)
    ]
    df = spark.createDataFrame(rows, "id BIGINT, k BIGINT, v BIGINT")
    got = distributed_range_sum(df, "k", 5, {"s": "v"}, count_out="n")
    assert got.count() == 3001  # nothing dropped
    w = Window.orderBy("k").rangeBetween(-5, 0)
    exp = df.select(
        "id",
        F.sum("v").over(w).alias("s"),
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
    )
    assert got.select("id", "s", "n").exceptAll(exp).count() == 0
    assert exp.exceptAll(got.select("id", "s", "n")).count() == 0
    with pytest.raises(ValueError, match="delta"):
        distributed_range_sum(df, "k", 0, {"s": "v"})


def test_distributed_range_sum_negative_keys_and_widths(spark):
    """Banded bucketing must hold for negative order keys (floor(k/delta)
    is negative-correct, unlike integer div) and for several frame widths,
    including delta == 1 (adjacent-bucket frames) and a width larger than
    the key domain (every row in frame)."""
    from spark_sql_dsv2_extension_spark.operators.quantiles import (
        distributed_range_sum,
    )

    rnd = random.Random(13)
    rows = [
        (i, rnd.randint(-40, 40), rnd.randint(1, 99)) for i in range(5003)
    ]
    df = spark.createDataFrame(rows, "id BIGINT, k BIGINT, v BIGINT")
    for delta in (1, 7, 200):
        got = distributed_range_sum(df, "k", delta, {"s": "v"}, count_out="n")
        w = Window.orderBy("k").rangeBetween(-delta, 0)
        exp = df.select(
            "id",
            F.sum("v").over(w).alias("s"),
            F.count(F.lit(1)).over(w).cast("long").alias("n"),
        )
        assert got.select("id", "s", "n").exceptAll(exp).count() == 0, delta
        assert exp.exceptAll(got.select("id", "s", "n")).count() == 0, delta


def test_distributed_range_sum_single_band_skew(spark):
    """Degenerate-skew stress (r6 verdict ask #6): ALL distinct keys
    inside ONE delta-wide band, d = 10^4 — the banded candidate join
    degenerates to ~d^2/2 pairs (~5e7) flowing through a single bucket's
    hash-join. The helper must stay correct and complete in bounded time
    (the docstring states the O(d^2)-per-band cost model and the sub-band
    salting escape hatch). Correctness is checked against the native
    unpartitioned RANGE window, which is O(n) and therefore cheap enough
    to serve as the oracle here."""
    from spark_sql_dsv2_extension_spark.operators.quantiles import (
        distributed_range_sum,
    )

    rnd = random.Random(31)
    d = 10_000
    # two rows per key so peer groups are exercised under skew too
    rows = [(i, i % d, rnd.randint(1, 9)) for i in range(2 * d)]
    df = spark.createDataFrame(rows, "id BIGINT, k BIGINT, v BIGINT")
    delta = 2 * d  # frame wider than the key domain: one band holds all keys
    got = distributed_range_sum(df, "k", delta, {"s": "v"}, count_out="n")
    w = Window.orderBy("k").rangeBetween(-delta, 0)
    exp = df.select(
        "id",
        F.sum("v").over(w).alias("s"),
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
    )
    assert got.select("id", "s", "n").exceptAll(exp).count() == 0
    assert exp.exceptAll(got.select("id", "s", "n")).count() == 0
