"""Window functions (SURVEY §2B "Window functions").

Each window shuffles once on its partition key then sorts within partitions
— at 100 TB the partition key's cardinality must exceed executor count and
no single partition may exceed executor memory (skewed keys → pre-aggregate
or salt). Frame aggregates over doubles use integer-scaled values so the
result is identical whether the engine evaluates frames incrementally
(Spark) or with a segment tree (DuckDB).

Every ORDER BY carries a unique tie-break column — row_number/lag/lead over
a non-total order would be nondeterministic on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load
from .quantiles import distributed_range_sum


@query(
    "win_row_number",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate ASC NULLS LAST, o_orderkey ASC
           ) AS BIGINT) AS rn
    FROM orders
    """,
)
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking by position within a total per-partition order."""
    w = Window.partitionBy("o_custkey").orderBy(
        # NULLS LAST pinned explicitly on both engines (Family N1):
        # Spark's ASC default is NULLS FIRST, DuckDB's is NULLS LAST
        F.col("o_orderdate").asc_nulls_last(), F.col("o_orderkey").asc()
    )
    return load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.row_number().over(w).cast("long").alias("rn")
    )


@query(
    "win_rank_dense",
    oracle="""
    SELECT p_brand, p_partkey, p_size,
           CAST(rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS BIGINT) AS rk,
           CAST(dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS BIGINT) AS drk
    FROM part
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank — gap vs no-gap tie handling (ties are semantic here,
    so no tie-break needed: equal inputs get equal ranks)."""
    w = Window.partitionBy("p_brand").orderBy(F.col("p_size").desc())
    return load(spark, sf_dir, "part").select(
        "p_brand",
        "p_partkey",
        "p_size",
        F.rank().over(w).cast("long").alias("rk"),
        F.dense_rank().over(w).cast("long").alias("drk"),
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           lag(o_totalprice, 1) OVER w AS prev_price,
           lead(o_totalprice, 1) OVER w AS next_price,
           lag(o_totalprice, 2, -1.0) OVER w AS prev2_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC NULLS LAST, o_orderkey ASC)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic offsets with and without default values."""
    w = Window.partitionBy("o_custkey").orderBy(
        # NULLS LAST pinned explicitly on both engines (Family N1):
        # Spark's ASC default is NULLS FIRST, DuckDB's is NULLS LAST
        F.col("o_orderdate").asc_nulls_last(), F.col("o_orderkey").asc()
    )
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
        F.lag("o_totalprice", 2, -1.0).over(w).alias("prev2_price"),
    )


@query(
    "win_running_sum_rows",
    oracle="""
    SELECT o_custkey, o_orderkey,
           SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate ASC NULLS LAST, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) / 1e2 AS running_spend,
           CAST(count(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate ASC NULLS LAST, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS running_n
    FROM orders
    """,
)
def win_running_sum_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS-frame running total (integer-scaled so frame evaluation order
    can't perturb float bits)."""
    w = (
        Window.partitionBy("o_custkey")
        # NULLS LAST pinned on both engines (Family N1)
        .orderBy(F.col("o_orderdate").asc_nulls_last(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        (F.sum(cents).over(w) / F.lit(100.0)).alias("running_spend"),
        F.count(F.lit(1)).over(w).cast("long").alias("running_n"),
    )


@query(
    "win_range_frame",
    oracle="""
    SELECT p_partkey, p_size,
           SUM(CAST(round(p_retailprice * 100) AS BIGINT)) OVER (
             ORDER BY p_size RANGE BETWEEN 5 PRECEDING AND CURRENT ROW
           ) / 1e2 AS nearby_price,
           CAST(count(*) OVER (
             ORDER BY p_size RANGE BETWEEN 5 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS nearby_n
    FROM part
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric order key — the frame is value-defined,
    so peers (equal p_size) share results and no tie-break is needed.

    Round 6: rewritten off the naive ``Window.orderBy("p_size")`` (no
    partitionBy — one task sorts the whole relation at scale; this was
    the inventory's last base-relation global window) onto
    ``distributed_range_sum``: per-size partial aggregates, banded
    bucket equi-join for the [size−5, size] frame, broadcast-joined back
    — same result bit-for-bit, no global sort anywhere in the plan."""
    cents = F.round(F.col("p_retailprice") * 100).cast("long")
    part = load(spark, sf_dir, "part")
    d = distributed_range_sum(
        part.select("p_partkey", "p_size", cents.alias("_cents")),
        "p_size",
        5,
        {"_nearby_cents": "_cents"},
        count_out="nearby_n",
    )
    return d.select(
        "p_partkey",
        "p_size",
        (F.col("_nearby_cents") / F.lit(100.0)).alias("nearby_price"),
        "nearby_n",
    )


@query(
    "win_ntile_first_last",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           first_value(c_custkey) OVER w AS top_cust,
           last_value(c_custkey) OVER (
             PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS bottom_cust
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
)
def win_ntile_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile + first/last value; last_value gets the full-partition frame
    (the default frame ends at CURRENT ROW, which would return each row
    itself — a classic window pitfall both engines share)."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.first("c_custkey").over(w).alias("top_cust"),
        F.last("c_custkey").over(w_full).alias("bottom_cust"),
    )


@query(
    "win_cume_percent",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           round(cume_dist() OVER w, 6) AS cume,
           round(percent_rank() OVER w, 6) AS pct_rank
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal ASC NULLS LAST, c_custkey ASC)
    """,
)
def win_cume_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: cume_dist + percent_rank. Rounded to 6
    decimals — both are ratios of small integers, identical across engines
    except for 1-ulp division differences.

    Ordering pinned NULLS LAST on both engines (LATTICE_AUDIT_r15.md):
    customers with an unknown balance sit at the TOP of the distribution
    on both engines — Spark's bare asc is NULLS FIRST where DuckDB's is
    NULLS LAST, which shifts every cume/pct value in a NULL-bearing
    segment, not just the NULL rows'."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc_nulls_last(), F.col("c_custkey").asc()
    )
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


SESSION_GAP_S = 300


@query(
    "win_session_gaps",
    oracle=f"""
    WITH t AS (
      SELECT user_id, floor(epoch(ts)) AS sec FROM events
    ), marked AS (
      SELECT user_id, sec,
             CASE WHEN sec - lag(sec) OVER w > {SESSION_GAP_S}
                  OR lag(sec) OVER w IS NULL THEN 1 ELSE 0 END AS is_start
      FROM t WINDOW w AS (PARTITION BY user_id ORDER BY sec)
    ), sess AS (
      SELECT user_id, sec,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY sec
                                 ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           CAST(min(sec) AS BIGINT) AS session_start,
           CAST(max(sec) AS BIGINT) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, session_no
    """,
)
def win_session_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a new session starts when
    the gap to the previous event exceeds 5 minutes; session id = running
    count of starts. One hash shuffle on user_id; both window functions
    share the same partitioning, so Catalyst plans a single exchange + sort
    — the batch twin of ``stream_session_window``."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.floor(F.unix_timestamp("ts")).alias("sec")
    )
    w = Window.partitionBy("user_id").orderBy("sec")
    marked = ev.withColumn(
        "is_start",
        F.when(
            (F.col("sec") - F.lag("sec").over(w) > SESSION_GAP_S)
            | F.lag("sec").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_no",
        F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.min("sec").alias("session_start"),
        F.max("sec").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "win_nth_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           nth_value(o_totalprice, 2) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate ASC NULLS LAST, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_price,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS od_epoch
    FROM orders
    """,
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value with an explicit ROWS frame: each order sees the price of
    its customer's 2nd-oldest order so far (NULL until two are visible).
    The frame is spelled out because the engines' default frames differ;
    ROWS UNBOUNDED PRECEDING..CURRENT ROW pins identical semantics. The
    tie-break on o_orderkey makes the 'nth' row unique, hence exact."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        # NULLS LAST pinned on both engines (Family N1)
        .orderBy(F.col("o_orderdate").asc_nulls_last(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.unix_timestamp("o_orderdate").alias("od_epoch"),
    )


@query(
    "win_fill_forward",
    oracle="""
    SELECT user_id, event_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS sec,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
    FROM (
      SELECT user_id, event_id, ts,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      FROM events
    )
    """,
)
def win_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (last observation carried forward): error events have
    no reading, so each row takes the most recent non-null value for its
    user — ``last_value IGNORE NULLS`` over an explicit ROWS frame, the
    canonical time-series gap-fill. One shuffle on user_id; the frame is
    running, so execution is a single pass per partition. Rows before a
    user's first reading stay NULL in both engines."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == "error", None)
        .otherwise(F.col("value"))
        .alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("sec"),
        F.last("v", ignorenulls=True).over(w).alias("filled"),
    )




@query(
    "win_time_range_rolling",
    oracle="""
    SELECT event_id, user_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch,
           SUM(CAST(round(value * 10000) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 600 PRECEDING AND CURRENT ROW
           ) / 1e4 AS rolling_10m
    FROM events WHERE user_id % 50 = 0
    """,
)
def win_time_range_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time rolling aggregate: per-user sum of `value` over a
    trailing 10-minute RANGE frame — the sliding-metric query (rate over
    trailing window) in its batch form. RANGE mode makes same-timestamp
    peers all contribute, so the result is arrival-order-independent; the
    summed values are centi-scaled ints (exact), divided once at the end.
    One window shuffle on user_id; frame bounds are event-time seconds,
    not row counts."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") % 50 == 0)
    ts_epoch = F.unix_timestamp("ts").alias("ts_epoch")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        ts_epoch,
        (
            F.sum(F.round(F.col("value") * 10000).cast("long")).over(w) / F.lit(1e4)
        ).alias("rolling_10m"),
    )


@query(
    "win_gap_islands",
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
      FROM events
    ), g AS (
      SELECT user_id, day,
             day - row_number() OVER (PARTITION BY user_id ORDER BY day)
               AS grp
      FROM d
    )
    SELECT user_id,
           CAST(min(day) AS BIGINT) AS island_start,
           CAST(max(day) AS BIGINT) AS island_end,
           CAST(count(*) AS BIGINT) AS n_days
    FROM g GROUP BY user_id, grp
    """,
)
def win_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's maximal runs of CONSECUTIVE active
    days (day − row_number is constant within a run — the classic trick),
    the data-completeness primitive behind "which shards/days are missing"
    audits and streak features. One distinct + one window + one aggregate,
    all sharing the user_id partitioning — a single exchange at any
    scale."""
    ev = load(spark, sf_dir, "events")
    d = ev.select(
        "user_id", F.expr("unix_micros(ts) DIV 86400000000").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    g = d.withColumn("grp", F.col("day") - F.row_number().over(w))
    return (
        g.groupBy("user_id", "grp")
        .agg(
            F.min("day").alias("island_start"),
            F.max("day").alias("island_end"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .drop("grp")
    )
