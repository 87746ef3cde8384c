"""Distributed global order statistics — the scale-safe ntile/row_number.

A plain ``F.ntile(B).over(Window.orderBy(...))`` (no partitionBy) funnels
the ENTIRE relation through one task for the global sort — fine at sf0.1,
a guaranteed straggler at 100 TB. This module is the shared replacement
(round-4 verdict ask #3): the same two-level pattern already proven in
``ext_equidepth_histogram`` (evaluation.py) and ``agg_salted_twophase``,
generalized to arbitrary ordering keys:

1. ``repartitionByRange`` on the ordering key — a range EXCHANGE, every
   partition holds a contiguous key range, no partition sees more than
   ~n/P rows (Spark's RangePartitioner samples boundaries; AQE may
   coalesce, but only ADJACENT ranges, so partition-id order still follows
   key order).
2. An in-partition ``row_number`` window PARTITIONED by
   ``spark_partition_id()`` — P concurrent bounded sorts, never one
   global one.
3. Per-partition row counts (P rows, a plan constant ≪ data) roll into
   cumulative offsets with a window over that TINY relation, broadcast
   back: ``global_rank = offset(pid) + in-partition rank``.

``ntile`` then becomes closed-form arithmetic on the exact global rank
(SQL ntile: with n rows and B buckets the first ``n mod B`` buckets get
``n div B + 1`` rows, the rest ``n div B``), so results are bit-identical
to the single-task window for any total ordering key.

Reference parity note: the reference engine (Scala DSv2 connector) has no
window machinery at all — these helpers serve the repo's extension
operators (SURVEY §2C / LLM-pipeline families).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Range-exchange width for the distributed sort. ``None`` (the default)
# defers to the session's ``spark.sql.shuffle.partitions`` — the right
# behavior at every scale: local[32] tests run 32-wide, a 1000-executor
# cluster runs at its configured tens-of-thousands width. A hardcoded
# constant would be a scale bug: AQE only COALESCES user-specified
# partition counts, never splits them, so 64 fixed partitions at 100 TB
# would mean 64 tasks sorting ~1.5 TB each. The offsets relation stays
# bounded by the conf value (a plan constant), never by data volume.
RANGE_PARTITIONS: int | None = None


def _cols(order_cols) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_cols]


def distributed_row_number(
    df: DataFrame,
    order_cols,
    rn: str = "_rn",
    num_partitions: int | None = RANGE_PARTITIONS,
) -> DataFrame:
    """Exact global ``row_number() OVER (ORDER BY order_cols)`` with no
    single-task sort.

    ``order_cols`` should be a total order (add a unique tiebreaker) —
    with ties the ranking is still a valid one, but tie order is
    partition-placement dependent, same as any parallel sort.
    """
    cols = _cols(order_cols)
    # The lazy localCheckpoint pins ONE materialization of the range
    # exchange: the ranks branch and the offsets branch below both read
    # the same RDD. Without it each branch may re-execute the exchange,
    # and RangePartitioner's boundary sampling is seeded by the RDD id
    # (Partitioner.scala `byteswap32(idx ^ (7919 * rdd.id))`), so two
    # executions can draw DIFFERENT partition boundaries — offsets then
    # disagree with ranks (observed: ntile(64) emitting a 65th bucket,
    # flaky run-to-run). Lazy (not eager) so no job fires at plan time
    # and bench timings still charge the materialization to the query.
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else df.repartitionByRange(*cols)
    )
    d = (
        ranged
        .withColumn("_qpid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_in = Window.partitionBy("_qpid").orderBy(*cols)
    d = d.withColumn("_qprn", F.row_number().over(w_in))
    counts = d.groupBy("_qpid").agg(F.count(F.lit(1)).alias("_qpc"))
    # offsets: P-row relation (bounded by num_partitions, not by data) —
    # the only global window in the plan runs over these P rows.
    w_off = Window.orderBy("_qpid").rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.select(
        "_qpid",
        F.coalesce(F.sum("_qpc").over(w_off), F.lit(0))
        .cast("long")
        .alias("_qoff"),
    )
    return (
        d.join(F.broadcast(offs), "_qpid")
        .withColumn(rn, (F.col("_qoff") + F.col("_qprn")).cast("long"))
        .drop("_qpid", "_qprn", "_qoff")
    )


def distributed_ntile(
    df: DataFrame,
    order_cols,
    n_buckets: int,
    out: str = "bucket",
    num_partitions: int | None = RANGE_PARTITIONS,
) -> DataFrame:
    """Exact global ``ntile(n_buckets) OVER (ORDER BY order_cols)``.

    Derived from the distributed global rank plus the total row count
    (broadcast, 1 row): with q = n div B and rem = n mod B, rank r maps to
    bucket ``(r + q) div (q + 1)`` when r ≤ rem·(q+1), else
    ``rem + ceil((r − rem·(q+1)) / q)`` — byte-identical to SQL ntile.
    """
    d = distributed_row_number(df, order_cols, rn="_qgrn",
                               num_partitions=num_partitions)
    return ntile_from_rank(d, "_qgrn", n_buckets, out).drop("_qgrn")


def ntile_from_rank(
    d: DataFrame, rank_col: str, n_buckets: int, out: str
) -> DataFrame:
    """Closed-form SQL-ntile bucket from an exact 1-based global rank
    column (broadcast 1-row total; no extra sort). Exposed so operators
    that need BOTH the rank and the bucket pay one range exchange."""
    total = d.agg(F.count(F.lit(1)).cast("long").alias("_qn"))
    B = int(n_buckets)
    d = d.join(F.broadcast(total))
    qd = F.expr(f"_qn div {B}")  # small-bucket size q
    rem = F.expr(f"_qn % {B}")  # first `rem` buckets hold q+1 rows
    r = F.col(rank_col)
    big = qd + F.lit(1)
    # Pure int64 arithmetic (round-6, ADVICE): for positive longs
    # floor(a/b) == a div b and ceil(a/b) == (a+b-1) div b, exact at ANY
    # row count — the previous double-precision floor/ceil could misround
    # a boundary rank once bucket sizes approach 2^53/B. The ELSE branch
    # is only reached when r > rem·(q+1), which requires q ≥ 1, so its
    # div-by-q never sees q == 0 (CASE WHEN evaluates lazily per row).
    bucket = F.when(
        r <= rem * big,
        F.expr(f"({rank_col} + _qn div {B}) div (_qn div {B} + 1)"),
    ).otherwise(
        rem
        + F.expr(
            f"({rank_col} - (_qn % {B}) * (_qn div {B} + 1)"
            f" + _qn div {B} - 1) div (_qn div {B})"
        )
    )
    return d.withColumn(out, bucket.cast("long")).drop("_qn")


def distributed_fill(
    df: DataFrame,
    order_cols: list[str],
    value,
    out_prev: str | None = None,
    out_next: str | None = None,
    num_partitions: int | None = RANGE_PARTITIONS,
) -> DataFrame:
    """Distributed ``last(value IGNORE NULLS) OVER (ORDER BY ... ROWS
    UNBOUNDED PRECEDING..CURRENT)`` (``out_prev``) and/or
    ``first(value IGNORE NULLS) OVER (CURRENT..UNBOUNDED FOLLOWING)``
    (``out_next``) — the global sorted-merge carry, without the
    single-task sort of an unpartitioned window.

    Same two-level shape as the rank helpers: range exchange (pinned with
    a lazy localCheckpoint), in-partition fill windows, then a P-row
    carry relation (per-partition last/first non-null via max_by/min_by
    on the ordering key) whose cross-partition carry is broadcast back.
    ``order_cols`` must be plain ascending column names (they form the
    max_by/min_by ordering struct).
    """
    key = F.struct(*[F.col(c) for c in order_cols])
    dv = df.withColumn(
        "_qval", value if isinstance(value, Column) else F.col(value)
    )
    kcols = [F.col(c) for c in order_cols]
    ranged = (
        dv.repartitionByRange(num_partitions, *kcols)
        if num_partitions
        else dv.repartitionByRange(*kcols)
    )
    d = ranged.withColumn("_qpid", F.spark_partition_id()).localCheckpoint(
        eager=False
    )
    aggs, drops = [], ["_qpid", "_qval"]
    if out_prev is not None:
        w_prev = (
            Window.partitionBy("_qpid")
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        d = d.withColumn("_qinp", F.last("_qval", ignorenulls=True).over(w_prev))
        aggs.append(F.max_by("_qinp", key).alias("_qcp"))
        drops += ["_qinp", "_qcp", "_qprevc"]
    if out_next is not None:
        w_next = (
            Window.partitionBy("_qpid")
            .orderBy(*order_cols)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        d = d.withColumn("_qinn", F.first("_qval", ignorenulls=True).over(w_next))
        aggs.append(F.min_by("_qinn", key).alias("_qcn"))
        drops += ["_qinn", "_qcn", "_qnextc"]
    carry = d.groupBy("_qpid").agg(*aggs)
    sel = [F.col("_qpid")]
    if out_prev is not None:
        w_c = Window.orderBy("_qpid").rowsBetween(Window.unboundedPreceding, -1)
        sel.append(F.last("_qcp", ignorenulls=True).over(w_c).alias("_qprevc"))
    if out_next is not None:
        w_n = Window.orderBy("_qpid").rowsBetween(1, Window.unboundedFollowing)
        sel.append(F.first("_qcn", ignorenulls=True).over(w_n).alias("_qnextc"))
    coff = carry.select(*sel)
    d = d.join(F.broadcast(coff), "_qpid")
    if out_prev is not None:
        d = d.withColumn(out_prev, F.coalesce("_qinp", "_qprevc"))
    if out_next is not None:
        d = d.withColumn(out_next, F.coalesce("_qinn", "_qnextc"))
    return d.drop(*[c for c in drops if c in d.columns])


def distributed_range_sum(
    df: DataFrame,
    order_col: str,
    delta,
    sums: dict[str, Column | str],
    count_out: str | None = None,
) -> DataFrame:
    """Distributed ``SUM(v) OVER (ORDER BY k RANGE BETWEEN delta PRECEDING
    AND CURRENT ROW)`` — the value-defined sliding frame, without the
    single-task global sort (round-6 verdict ask #3; replaces the last
    base-relation unpartitioned window, ``win_range_frame``).

    A RANGE frame depends only on the ORDER BY *value* (peers share
    results), so the window collapses to per-distinct-key arithmetic:

    1. groupBy(k) — map-side partial agg; one hash shuffle; output is one
       row per distinct key (d rows ≪ n).
    2. Band the keys: bucket = floor(k / delta). A frame [k−delta, k]
       spans at most two ADJACENT buckets in real arithmetic, so candidate
       pairs come from an EQUI-join on bucket id (each target probes
       buckets b−2..b via a 3-element explode — the extra probe absorbs
       the one-ulp floor shift a fractional k/delta can take when the
       quotient rounds across an integer) with the exact frame bound as
       the post-filter — the same banded-join shape as
       ``join_interval_overlap_banded``, never a cartesian and never a
       global sort.
    3. Re-aggregate per target key, then equi-join the d-row frame table
       back onto the base rows on k (AQE broadcasts it when small).

    Skew note: work per bucket is O(|bucket|²) in DISTINCT keys (not
    rows), bounded by the key density within one delta-wide band — the
    right cost model for a value-defined frame, since those are exactly
    the rows the frame must touch. Degenerate bound: if all d distinct
    keys land inside ONE delta-wide band (delta ≥ key range), the
    candidate join emits ~d²/2 pairs through one hash-join task pair —
    ~5×10⁷ pairs for d=10⁴, which completes locally in seconds (stress
    test: tests/test_quantiles.py::test_distributed_range_sum_single_
    band_skew) but grows quadratically. Escape hatch if a real workload
    hits it: salt the candidate side into S sub-bands (bucket*S + k%S),
    probe all S sub-buckets per target, and merge with the SAME
    post-filter + re-aggregate — spreads the d² work across S·P tasks
    without changing results; at that point also reconsider delta,
    because a frame covering ALL keys means every target sums the whole
    relation and a running-total formulation (distributed_running_sum
    over per-key aggregates) is O(d log d) instead.

    ``sums`` maps output column name -> value expression to SUM (summed
    exactly; pass integer-scaled values for float data, per the repo
    convention). ``count_out`` adds the frame's COUNT(*). Returns ``df``
    with the new columns appended.

    NULL order keys get the native window's semantics: NULL rows are one
    peer group whose frame is exactly the NULL rows (Spark sorts NULLS
    FIRST; no non-null key is within any distance of NULL), handled on a
    separate broadcast branch rather than silently dropped by the bucket
    equi-join.

    Exactness: for INTEGRAL keys with an integral ``delta`` the bucket id
    is exact long floor-division at any magnitude; fractional keys/deltas
    go through double floor(k/delta), whose worst-case one-ulp shift is
    absorbed by the extra probe bucket — but keys above ~2^52/delta lose
    integer resolution in the cast and should be rescaled first.
    """
    if not float(delta) > 0:
        raise ValueError(f"distributed_range_sum: delta must be > 0, got {delta}")
    k = F.col(order_col)
    exprs = {
        o: (F.col(v) if isinstance(v, str) else v) for o, v in sums.items()
    }
    key_type = df.select(order_col).schema.fields[0].dataType.typeName()
    integral = key_type in ("byte", "short", "integer", "long")
    g = df.groupBy(order_col).agg(
        *[F.sum(v).alias(f"_qv_{o}") for o, v in exprs.items()],
        F.count(F.lit(1)).alias("_qvc"),
    )
    if integral and float(delta) == int(delta):
        d_int = int(delta)
        # exact long floor-division (div truncates toward zero; adjust
        # negative non-multiples down by one)
        bucket = F.expr(
            f"CAST({order_col} AS BIGINT) div {d_int}"
            f" - CASE WHEN {order_col} % {d_int} != 0"
            f" AND {order_col} < 0 THEN 1 ELSE 0 END"
        ).cast("long")
    else:
        bucket = F.floor(k.cast("double") / F.lit(delta)).cast("long")
    # pin ONE materialization of the per-key aggregate: the probe and
    # candidate branches below both read it, and without the checkpoint
    # Catalyst re-executes the scan+aggregate subtree per branch (no
    # ReusedExchange across the differing projections). Lazy, so bench
    # timings still charge the materialization to the query.
    g = g.withColumn("_qb", bucket).localCheckpoint(eager=False)
    nn = g.filter(k.isNotNull())
    probes = nn.select(
        k.alias("_qtk"),
        F.explode(
            F.array(F.col("_qb") - 2, F.col("_qb") - 1, F.col("_qb"))
        ).alias("_qpb"),
    )
    cand = nn.select(
        k.alias("_qck"),
        F.col("_qb").alias("_qcb"),
        *[F.col(f"_qv_{o}") for o in exprs],
        "_qvc",
    )
    frame = (
        probes.join(
            cand,
            (F.col("_qpb") == F.col("_qcb"))
            & (F.col("_qck") >= F.col("_qtk") - F.lit(delta))
            & (F.col("_qck") <= F.col("_qtk")),
        )
        .groupBy("_qtk")
        .agg(
            *[F.sum(f"_qv_{o}").alias(f"_qs_{o}") for o in exprs],
            F.sum("_qvc").cast("long").alias("_qsc"),
        )
    )
    # NULL peer group: its frame is exactly the NULL rows (no non-null
    # key is within any distance of NULL) — one pre-aggregated row,
    # unioned into the frame table; the join back is null-safe so these
    # base rows are kept, matching the native window
    null_frame = g.filter(k.isNull()).select(
        k.alias("_qtk"),
        *[F.col(f"_qv_{o}").alias(f"_qs_{o}") for o in exprs],
        F.col("_qvc").cast("long").alias("_qsc"),
    )
    frame = frame.unionByName(null_frame)
    out = df.join(frame, k.eqNullSafe(F.col("_qtk")))
    for o in exprs:
        out = out.withColumn(o, F.col(f"_qs_{o}"))
    if count_out is not None:
        out = out.withColumn(count_out, F.col("_qsc"))
    return out.drop("_qtk", "_qsc", *[f"_qs_{o}" for o in exprs])


def distributed_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col,
    out,
    num_partitions: int | None = RANGE_PARTITIONS,
) -> DataFrame:
    """Distributed ``SUM(value) OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING..CURRENT)`` — the exact global prefix sum, without the
    single-task sort: range exchange (pinned), in-partition running sums,
    per-partition totals (P rows) rolled into broadcast offsets.
    ``order_cols`` must be plain ascending column names. ``value_col`` /
    ``out`` may be parallel lists to compute several prefix sums on the
    ONE range exchange (e.g. the two ECDFs of a KS test).

    INTEGRAL INPUTS ONLY (enforced): the cross-partition offset
    arithmetic runs on int64 — the repo-wide integer-scaled-aggregate
    convention (scale floats to cents/micros first). A fractional value
    column would be silently truncated at partition boundaries, so it is
    rejected loudly instead (round-6 verdict ask #5)."""
    vals = [value_col] if isinstance(value_col, str) else list(value_col)
    outs = [out] if isinstance(out, str) else list(out)
    assert len(vals) == len(outs)
    for f in df.select(*vals).schema.fields:
        if f.dataType.typeName() not in ("byte", "short", "integer", "long"):
            raise TypeError(
                f"distributed_running_sum: value column {f.name!r} has "
                f"non-integral type {f.dataType.simpleString()}; the "
                "prefix-sum offsets are exact int64 arithmetic — scale "
                "floats to integers first (repo convention, e.g. cents)"
            )
    cols = [F.col(c) for c in order_cols]
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else df.repartitionByRange(*cols)
    )
    d = (
        ranged
        .withColumn("_qpid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_in = (
        Window.partitionBy("_qpid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for i, v in enumerate(vals):
        d = d.withColumn(f"_qrs{i}", F.sum(v).over(w_in))
    totals = d.groupBy("_qpid").agg(
        *[F.sum(v).cast("long").alias(f"_qbt{i}") for i, v in enumerate(vals)]
    )
    w_off = Window.orderBy("_qpid").rowsBetween(Window.unboundedPreceding, -1)
    offs = totals.select(
        "_qpid",
        *[
            F.coalesce(F.sum(f"_qbt{i}").over(w_off), F.lit(0))
            .cast("long")
            .alias(f"_qoff{i}")
            for i in range(len(vals))
        ],
    )
    d = d.join(F.broadcast(offs), "_qpid")
    for i, o in enumerate(outs):
        d = d.withColumn(
            o, (F.col(f"_qoff{i}") + F.col(f"_qrs{i}")).cast("long")
        )
    return d.drop(
        "_qpid",
        *[f"_qrs{i}" for i in range(len(vals))],
        *[f"_qoff{i}" for i in range(len(vals))],
    )
