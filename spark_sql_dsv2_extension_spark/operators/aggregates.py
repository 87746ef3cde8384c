"""Aggregation operators (SURVEY §2B "Aggregations").

All keys are hash aggregates with map-side partial aggregation (Spark plans
``HashAggregate(partial) → shuffle on keys → HashAggregate(final)``), so the
shuffle carries one row per (partition, group), not per input row — the shape
that survives 100 TB. Double sums use the integer-scaled pattern from
``tables.dsum`` for oracle determinism; at true 100 TB scale the same
aggregates would instead use ``decimal(38, s)`` accumulators (int64 scaled
sums overflow past ~9e18/10^s).

The reference delegates all aggregation to Catalyst (SURVEY §0); its own
aggregate-adjacent machinery is only table-size stats (CatalogUtil.scala:13-48),
covered by the catalog module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .quantiles import distributed_ntile, distributed_row_number
from ..registry import query
from ..tables import davg, dsum, load, sql_davg, sql_dsum


@query(
    "agg_hash_group",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum("l_quantity", 0)} AS sum_qty,
           {sql_dsum("l_extendedprice", 2)} AS sum_base_price,
           {sql_dsum("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
           {sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
           {sql_davg("l_quantity", 0)} AS avg_qty,
           {sql_davg("l_extendedprice", 2)} AS avg_price,
           {sql_davg("l_discount", 2)} AS avg_disc,
           min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_hash_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: grouped sum/avg/min/max/count over the fact table."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", 0).alias("sum_qty"),
        dsum("l_extendedprice", 2).alias("sum_base_price"),
        dsum(disc, 4).alias("sum_disc_price"),
        dsum(disc * (1 + F.col("l_tax")), 6).alias("sum_charge"),
        davg("l_quantity", 0).alias("avg_qty"),
        davg("l_extendedprice", 2).alias("avg_price"),
        davg("l_discount", 2).alias("avg_disc"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "agg_global",
    oracle=f"""
    SELECT {sql_dsum("o_totalprice", 2)} AS total_revenue,
           {sql_davg("o_totalprice", 2)} AS avg_order,
           min(o_totalprice) AS min_order,
           max(o_totalprice) AS max_order,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-group (global) aggregate — one partial row per partition, then a
    single-row final stage."""
    return load(spark, sf_dir, "orders").agg(
        dsum("o_totalprice", 2).alias("total_revenue"),
        davg("o_totalprice", 2).alias("avg_order"),
        F.min("o_totalprice").alias("min_order"),
        F.max("o_totalprice").alias("max_order"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count (Catalyst expands to a two-level aggregate —
    distinct keys are shuffled once, never collected)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "agg_multi_distinct",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
           CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_prios,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Several DISTINCT aggregates in one query (Catalyst plans an Expand —
    one shuffle per distinct set, fan-out bounded by #distinct clauses)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_custs"),
            F.countDistinct("o_orderpriority").alias("n_prios"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "agg_having",
    oracle=f"""
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           {sql_dsum("o_totalprice", 2)} AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 12
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING) — runs after the final aggregate,
    never rescans the input."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", 2).alias("spend"),
        )
        .filter(F.col("n_orders") >= 12)
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum("l_quantity", 0)} AS sum_qty,
           CAST(count(*) AS BIGINT) AS n,
           CAST(grouping(l_returnflag) AS INT) AS g_flag,
           CAST(grouping(l_linestatus) AS INT) AS g_status
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals; ``grouping()`` disambiguates rollup NULLs from
    data NULLs.

    Empty-input ENGINE DIFFERENCE (documented, not fixed —
    EMPTY_AUDIT_r9.md E3): on zero input rows the SQL standard (DuckDB,
    PostgreSQL) emits ONE row for the global () grouping set while Spark
    emits zero rows (SPARK-33229 family). Kept at Spark semantics: a
    union-with-constructed-row branch would contort a clean Expand plan
    to chase a corner the driver's non-empty fixtures can never reach."""
    return (
        load(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", 0).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
        )
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum("l_extendedprice", 2)} AS sum_price,
           CAST(count(*) AS BIGINT) AS n,
           CAST(grouping(l_returnflag) AS INT) AS g_flag,
           CAST(grouping(l_linestatus) AS INT) AS g_status
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All grouping combinations (2^k expansion happens in the Expand node —
    input is read once).

    Empty-input ENGINE DIFFERENCE (documented, not fixed —
    EMPTY_AUDIT_r9.md E3): on zero input rows the SQL standard (DuckDB,
    PostgreSQL) emits ONE row for the global () grouping set while Spark
    emits zero rows (SPARK-33229 family). Kept at Spark semantics: a
    union-with-constructed-row branch would contort a clean Expand plan
    to chase a corner the driver's non-empty fixtures can never reach."""
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_extendedprice", 2).alias("sum_price"),
            F.count(F.lit(1)).alias("n"),
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
        )
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           {sql_dsum("o_totalprice", 2)} AS spend,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via SQL (same Expand-based plan as rollup/cube).

    Empty-input ENGINE DIFFERENCE (documented, not fixed —
    EMPTY_AUDIT_r9.md E3): on zero input rows the SQL standard (DuckDB,
    PostgreSQL) emits ONE row for the global () grouping set while Spark
    emits zero rows (SPARK-33229 family). Kept at Spark semantics: a
    union-with-constructed-row branch would contort a clean Expand plan
    to chase a corner the driver's non-empty fixtures can never reach."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               {sql_dsum("o_totalprice", 2)} AS spend,
               CAST(count(*) AS BIGINT) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "agg_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END", 0)} AS qty_O,
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END", 0)} AS qty_F,
           {sql_dsum("CASE WHEN l_linestatus = 'P' THEN l_quantity END", 0)} AS qty_P
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: one column per l_linestatus value. With the value list given
    explicitly, Spark plans a single-pass conditional aggregation (the same
    CASE-WHEN shape as the oracle) — no extra distinct-values job."""
    li = load(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_quantity")).cast("long")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F", "P"])
        .agg((F.sum(cents) / F.lit(1.0)).alias("q"))
        .select(
            "l_returnflag",
            F.col("O").alias("qty_O"),
            F.col("F").alias("qty_F"),
            F.col("P").alias("qty_P"),
        )
    )


@query(
    "agg_unpivot",
    oracle="""
    SELECT c_custkey, metric, val
    FROM (
      SELECT c_custkey,
             unnest(['acctbal', 'nationkey']) AS metric,
             unnest([c_acctbal, CAST(c_nationkey AS DOUBLE)]) AS val
      FROM customer
    )
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide → long via the unpivot operator (Expand node —
    input scanned once, rows fan out columnar-side)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    ).unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "val")


@query(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_extendedprice, [0.25, 0.75])[1] AS p25_price,
           quantile_cont(l_extendedprice, [0.25, 0.75])[2] AS p75_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines linearly interpolate on
    the sorted values → identical doubles). At 100 TB the exact form
    requires a sort per group — approx_percentile (t-digest sketch, one
    pass, mergeable) is the scale substitute, same call shape."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("median_qty"),
        F.percentile("l_extendedprice", 0.25).alias("p25_price"),
        F.percentile("l_extendedprice", 0.75).alias("p75_price"),
    )


@query(
    "agg_approx_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           true AS approx_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct, checked as a boolean invariant: the
    sketch estimate must land within ±10% of the exact count (rsd=0.02, so
    the margin is generous); the oracle emits literal ``true`` per group.
    This upgrades the former oracle-less weaker check to an exact hash
    comparison without pretending DuckDB's sketch matches Spark's.

    The scale path: a fixed-size sketch per group replaces the exact
    distinct's shuffle of every distinct key — at 100 TB this is the only
    affordable distinct-count.
    """
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_partkey").alias("exact_parts"),
            F.approx_count_distinct("l_partkey", 0.02).alias("approx"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                (F.col("approx") >= F.col("exact_parts") * 0.9)
                & (F.col("approx") <= F.col("exact_parts") * 1.1)
            ).alias("approx_ok"),
        )
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT n_regionkey, string_agg(n_name, '|' ORDER BY n_name) AS names
    FROM nation
    GROUP BY n_regionkey
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List aggregation, sorted for determinism (collect_list order is
    partition-dependent; sort_array makes it canonical). Projected to a
    delimiter-joined string: array-typed output cells are unhashable in
    the driver's pandas canonicalizer, so both sides emit scalars.

    NULL names (Family N1): both collect_list and string_agg skip NULL
    elements, but a group whose every name is NULL aggregates to NULL in
    string_agg and to an EMPTY list (array_join '') here — the explicit
    when-count guard mirrors the aggregate-of-nothing-is-NULL rule."""
    return (
        load(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), "|").alias(
                "_names"
            ),
            F.count("n_name").alias("_nn"),
        )
        .select(
            "n_regionkey",
            F.when(F.col("_nn") > 0, F.col("_names")).alias("names"),
        )
    )


@query(
    "agg_stats_corr",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             SUM(CAST(round(l_quantity) AS BIGINT)) AS sx,
             SUM(CAST(round(l_discount * 1e4) AS BIGINT)) AS sy,
             SUM(CAST(round(l_quantity) AS BIGINT)
                 * CAST(round(l_quantity) AS BIGINT)) AS sxx,
             SUM(CAST(round(l_discount * 1e4) AS BIGINT)
                 * CAST(round(l_discount * 1e4) AS BIGINT)) AS syy,
             SUM(CAST(round(l_quantity) AS BIGINT)
                 * CAST(round(l_discount * 1e4) AS BIGINT)) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           CAST(n * sxy - sx * sy AS DOUBLE) /
             sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                  * CAST(n * syy - sy * sy AS DOUBLE)) AS corr_qty_disc,
           CAST(n * sxy - sx * sy AS DOUBLE) / n / (n - 1) / 1e4
             AS covar_samp_qty_disc,
           sqrt(CAST(n * sxx - sx * sx AS DOUBLE) / n / (n - 1))
             AS stddev_qty
    FROM s
    """,
)
def agg_stats_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (Pearson correlation, sample covariance,
    sample stddev) per group, via explicit scaled-integer moment sums —
    Spark's built-in corr/covar_samp/stddev use order-dependent double
    accumulation, so the moments are taken exactly in int64 (quantity is
    integer-valued; discount is scaled by 1e4) and the identical closed-form
    division chain runs on both engines. Correlation is scale-invariant, so
    the scaling does not change the statistic. One map-side-combined
    aggregation — the same one-shuffle shape as agg_hash_group.

    Zero-variance or single-row groups: the corr denominator is sqrt(0)
    (and the covar/stddev divisor n-1 is 0 at n=1) — ANSI Spark would
    raise DIVIDE_BY_ZERO where DuckDB IEEE-propagates NaN, so every
    division in the chain goes through try_divide; its NULL is equated
    with NaN by the driver-matched canonicalizer (DEGENERATE_AUDIT_r8.md
    Family B; oracle untouched — on the 2-row constant-value fixture
    covar/stddev stay exact 0s on both engines)."""
    li = load(spark, sf_dir, "lineitem")
    x = F.round("l_quantity").cast("long")
    y = F.round(F.col("l_discount") * 1e4).cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    num = (n * sxy - sx * sy).cast("double")
    return s.select(
        "l_returnflag",
        "n",
        F.try_divide(
            num,
            F.sqrt((n * sxx - sx * sx).cast("double")
                   * (n * syy - sy * sy).cast("double")),
        ).alias("corr_qty_disc"),
        # same left-to-right division chain as the oracle (identical
        # double rounding), each step through try_divide
        F.try_divide(
            F.try_divide(F.try_divide(num, n), n - 1), F.lit(1e4)
        ).alias("covar_samp_qty_disc"),
        F.sqrt(
            F.try_divide(
                F.try_divide((n * sxx - sx * sx).cast("double"), n), n - 1
            )
        ).alias("stddev_qty"),
    )


@query(
    "agg_max_by_min_by",
    oracle="""
    SELECT o_orderpriority,
           (max(CASE WHEN o_totalprice IS NOT NULL AND o_orderkey IS NOT NULL
                     THEN {'p': o_totalprice, 'k': o_orderkey} END)).k
             AS biggest_order,
           (min(CASE WHEN o_totalprice IS NOT NULL AND o_orderkey IS NOT NULL
                     THEN {'p': o_totalprice, 'k': o_orderkey} END)).k
             AS smallest_order,
           max(o_totalprice) AS max_price,
           min(o_totalprice) AS min_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_max_by_min_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax/argmin aggregates (max_by/min_by ↔ DuckDB arg_max/arg_min):
    the key of the extreme row, not the extreme value — a one-shuffle
    replacement for the join-back-after-max antipattern.

    TIE-BREAK PINNED (LATTICE_AUDIT_r15 tranche 3): bare max_by/arg_max
    are engine-nondeterministic when two rows share the extreme value —
    the lattice fixtures hit exactly that (two orders at the same price
    in one priority group) and each engine elected a different row. Both
    sides now take the extreme of the (price, key) STRUCT — lexicographic
    on both engines — so ties resolve to the largest key for max and the
    smallest for min. A NULL price yields a NULL struct, which both
    engines' max/min skip (the prior arg_max NULL semantics, preserved);
    an all-NULL group keeps its row with NULL args on both. The guard
    also requires a non-NULL KEY (r15 ADVICE): a NULL key under a
    non-NULL price would build a struct with a NULL field, and Spark and
    DuckDB order NULL struct FIELDS on opposite sides — excluding such
    rows on both engines keeps the tie-break engine-agnostic even if a
    future fixture NULLs the (currently never-NULL) o_orderkey."""
    o = load(spark, sf_dir, "orders")
    p, k = F.col("o_totalprice"), F.col("o_orderkey")
    pk = F.when(p.isNotNull() & k.isNotNull(), F.struct(p.alias("p"), k.alias("k")))
    return o.groupBy("o_orderpriority").agg(
        F.max(pk)["k"].alias("biggest_order"),
        F.min(pk)["k"].alias("smallest_order"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )


@query(
    "agg_filtered",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_all,
           CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_heavy,
           CAST(sum(CASE WHEN l_discount > 0.05
                         THEN CAST(round(l_quantity) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS qty_discounted
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered aggregates (FILTER clause / count_if / conditional sum):
    several differently-filtered measures in ONE pass over the fact table —
    the one-scan replacement for N filtered subqueries. All integer-exact."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count_if(F.col("l_quantity") > 25).alias("n_heavy"),
        F.sum(
            F.when(
                F.col("l_discount") > 0.05, F.round("l_quantity").cast("long")
            ).otherwise(F.lit(0).cast("long"))
        ).alias("qty_discounted"),
    )


@query(
    "agg_histogram",
    oracle="""
    SELECT CAST(floor((c_acctbal + 1000.0) / 1000.0) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           SUM(CAST(round(c_acctbal * 100) AS BIGINT)) / 1e2 AS total_bal
    FROM customer
    GROUP BY 1
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (width_bucket semantics by explicit floor
    arithmetic — identical IEEE ops in both engines, so bucket edges are
    bit-exact). The bucketing expression is a plain projection, so at scale
    this is one map-side-combining hash aggregate over the scan."""
    c = load(spark, sf_dir, "customer")
    return (
        c.groupBy(
            F.floor((F.col("c_acctbal") + 1000.0) / 1000.0)
            .cast("long")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("c_acctbal", 2).alias("total_bal"),
        )
    )


@query(
    "agg_mode",
    oracle="""
    SELECT o_orderstatus, o_orderpriority AS mode_priority,
           CAST(cnt AS BIGINT) AS cnt
    FROM (
      SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
             row_number() OVER (
               PARTITION BY o_orderstatus
               ORDER BY count(*) DESC, o_orderpriority ASC NULLS LAST) AS rk
      FROM orders
      GROUP BY o_orderstatus, o_orderpriority
    )
    WHERE rk = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODE (most frequent value) per group, with a deterministic
    lexicographic tie-break — count-then-rank, the distributed idiom for
    mode (a direct MODE() agg is nondeterministic on ties). Two shuffles:
    the count aggregate, then a tiny ranked window over (status, priority)
    pairs.

    Tie-break NULLS LAST, pinned on BOTH engines (LATTICE_AUDIT_r15.md):
    a NULL priority with the same count as a real value must LOSE the
    tie — Spark's bare asc is NULLS FIRST where DuckDB's is NULLS LAST,
    so an unpinned tie elects a different mode per engine. (A NULL
    priority with a strictly higher count still wins on both — NULL is a
    legitimate modal value in this contract, it just can't win ties.)"""
    o = load(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("cnt").desc(), F.col("o_orderpriority").asc_nulls_last()
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("cnt").cast("long").alias("cnt"),
        )
    )


@query(
    "agg_bool_countif",
    oracle="""
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000.0)   AS all_over_1k,
           bool_or(o_orderstatus = 'F')      AS any_finished,
           CAST(count_if(o_totalprice > 200000.0) AS BIGINT) AS n_big
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_bool_countif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates: bool_and/bool_or (ANSI EVERY/ANY) and count_if
    — the predicates-over-groups idiom used constantly in data-quality
    checks. All three are plain associative aggregates with map-side
    partials."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000.0).alias("all_over_1k"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.count_if(F.col("o_totalprice") > 200000.0).cast("long").alias("n_big"),
    )


@query(
    "agg_percentile_exact",
    oracle="""
    SELECT o_orderstatus,
           round(CAST(median(o_totalprice) AS DOUBLE), 4) AS med_price,
           round(CAST(quantile_cont(o_totalprice, 0.9) AS DOUBLE), 4) AS p90_price,
           round(CAST(quantile_cont(o_totalprice, 0.25) AS DOUBLE), 4)
             AS p25_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile aggregates (median / p90 / p25) per group —
    ``F.percentile`` sorts within the group and interpolates, the
    distributed equivalent of quantile_cont. Outputs rounded to 4 decimals
    because linear interpolation (a + (b−a)·f) can differ by 1 ulp across
    engines. At scale exact percentiles shuffle the group's values;
    approx_percentile (t-digest sketch, map-side mergeable) is the 100 TB
    variant when 1%% error is acceptable — kept exact here for the oracle."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("med_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25_price"),
    )


@query(
    "agg_min_by_max_by",
    oracle="""
    WITH ranked AS (
      -- o_totalprice IS NOT NULL (Family N4 lockstep): an argmax over an
      -- unknown price is undefined — and the two engines would otherwise
      -- rank the NULL-price rows at opposite ends
      SELECT o_orderstatus, o_orderkey, o_custkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice DESC, o_orderkey ASC)
               AS rk_max,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice ASC, o_orderkey ASC)
               AS rk_min
      FROM orders WHERE o_totalprice IS NOT NULL
    )
    SELECT a.o_orderstatus,
           a.o_orderkey AS max_price_order,
           b.o_orderkey AS min_price_order
    FROM (SELECT * FROM ranked WHERE rk_max = 1) a
    JOIN (SELECT * FROM ranked WHERE rk_min = 1) b
      ON a.o_orderstatus IS NOT DISTINCT FROM b.o_orderstatus
    """,
)
def agg_min_by_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAX_BY / MIN_BY — the "argmax" aggregates: which order carries the
    extreme price per status. Price ties are broken by o_orderkey via a
    composite ordering struct, making the result deterministic (a bare
    max_by on a tied column is engine-order-dependent — the struct
    tie-break is the pattern that survives an oracle). One partial-agg
    shuffle; the struct comparison happens map-side.

    NULL prices (Family N4, lockstep): filtered on both engines — an
    argmax over an unknown price is undefined, and a NULL field inside
    the ordering struct would otherwise rank by engine-specific NULL
    placement. The oracle's self-join is NULL-safe (IS NOT DISTINCT
    FROM) because groupBy keeps a NULL o_orderstatus group per SQL
    GROUP BY semantics while USING would silently drop it."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice").isNotNull())
    # struct orders lexicographically: (price, -orderkey) picks the SMALLEST
    # key among max-price ties; (price, orderkey) the smallest among min ties
    return o.groupBy("o_orderstatus").agg(
        F.max_by(
            "o_orderkey", F.struct(F.col("o_totalprice"), -F.col("o_orderkey"))
        ).alias("max_price_order"),
        F.min_by(
            "o_orderkey", F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
        ).alias("min_price_order"),
    )


@query(
    "agg_stats_exact",
    oracle="""
    WITH s AS (
      SELECT o_orderstatus,
             CAST(count(*) AS BIGINT) AS n,
             SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS sx,
             SUM(CAST(round(o_totalprice * 100) AS BIGINT)
                 * CAST(round(o_totalprice * 100) AS BIGINT)) AS sxx
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, n,
           round(CAST(sx AS DOUBLE) / n / 1e2, 4) AS mean_price,
           round(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                      / n / (n - 1)) / 1e2, 4) AS stddev_price,
           round(CAST(n * sxx - sx * sx AS DOUBLE)
                 / n / (n - 1) / 1e4, 4) AS var_price
    FROM s
    """,
)
def agg_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic VARIANCE / STDDEV per group — the statistical
    aggregates, made order-independent: builtin ``stddev`` folds doubles
    in partition order (nondeterministic across runs), so the moments are
    accumulated as EXACT integer sums instead (Σx, Σx² of the
    centi-scaled values, in decimal(38) — Σx² of 15k orders overflows
    int64) and the textbook n·Σx²−(Σx)² formula is applied once at the
    end. Both engines see identical integers, so the doubles agree before
    the 4-decimal presentation rounding. Same single partial-agg shuffle
    as any grouped sum — this is also the 100 TB pattern for reproducible
    metrics across reruns and AQE re-plans.

    Degenerate guard (round-8 audit): a single-row group has no sample
    variance — the n−1 divisor is zero, which ANSI Spark raises on while
    the oracle renders NaN. ``try_divide`` yields NULL there, and the
    driver's canonicalizer treats NULL and NaN as the same cell, so the
    engines agree; real groups (n ≫ 1) are untouched."""
    o = load(spark, sf_dir, "orders")
    xs = F.round(F.col("o_totalprice") * 100).cast("long")
    stats = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xs.cast("decimal(38,0)")).alias("sx"),
        F.sum((xs * xs).cast("decimal(38,0)")).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    var = F.try_divide(num / F.col("n"), F.col("n") - 1)
    return stats.select(
        "o_orderstatus",
        "n",
        F.round(F.col("sx").cast("double") / F.col("n") / F.lit(1e2), 4).alias(
            "mean_price"
        ),
        F.round(F.sqrt(var) / F.lit(1e2), 4).alias("stddev_price"),
        F.round(var / F.lit(1e4), 4).alias("var_price"),
    )


@query(
    "agg_approx_percentile_invariant",
    oracle="""
    SELECT o_orderstatus, true AS within_tol
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_approx_percentile_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile — the 100 TB percentile path (mergeable quantile
    sketch, map-side combinable, no full sort) — verified as a BOOLEAN
    INVARIANT like ``agg_approx_count_distinct``: the sketch's p50 must
    sit within RANK tolerance of the exact median rank (count how many
    group values fall strictly below / at-or-below the sketch's answer
    and compare to 0.5·n ± eps·n, the agg_kll_quantile_invariant shape).
    Rank error — not relative VALUE error — is what the GK/KLL sketch
    actually guarantees (EXTREME_AUDIT_r11.md Family X4): on a
    distribution spanning 0.005 → 1e7 a tiny rank error beside a value
    jump is a huge value error, so the old ±5%-of-value form asserted a
    property the sketch never promised (and divided by an exact median
    that can legitimately be ~0). accuracy 10000 bounds rank error at
    ~1e-4, far inside the 0.02 gate. The oracle asserts the invariant
    (literal true per group), so the check is exact while the operator
    stays approximate. A group with no non-NULL prices has no percentile
    to test — the invariant holds vacuously (Family N1); the rank-check
    join back is eqNullSafe so a NULL-status group keeps its row."""
    o = load(spark, sf_dir, "orders")
    ap = o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10000)).alias("ap")
    )
    ranks = (
        o.join(
            F.broadcast(ap),
            o["o_orderstatus"].eqNullSafe(ap["o_orderstatus"]),
        )
        .drop(o["o_orderstatus"])
        .groupBy("o_orderstatus", "ap")
        .agg(
            F.sum((F.col("o_totalprice") < F.col("ap")).cast("long")).alias(
                "n_lt"
            ),
            F.sum((F.col("o_totalprice") <= F.col("ap")).cast("long")).alias(
                "n_le"
            ),
            F.count("o_totalprice").alias("n"),
        )
    )
    target = F.lit(0.5) * F.col("n")
    eps_n = F.lit(0.02) * F.col("n")
    return ranks.select(
        "o_orderstatus",
        F.when(F.col("ap").isNull(), F.lit(True))
        .otherwise(
            (F.col("n_lt") <= target + eps_n) & (F.col("n_le") >= target - eps_n)
        )
        .alias("within_tol"),
    )


@query(
    "agg_grouping_id",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS BIGINT) AS gid
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping indicators: ``grouping_id`` disambiguates a
    real NULL group value from a rollup-generated subtotal row — required
    the moment a grouping column is nullable. Spark's grouping_id bit
    order equals the GROUP BY column order, mirrored in the oracle as
    GROUPING(a)·2 + GROUPING(b).

    Empty-input ENGINE DIFFERENCE (documented, not fixed —
    EMPTY_AUDIT_r9.md E3): on zero input rows the SQL standard (DuckDB,
    PostgreSQL) emits ONE row for the global () grouping set while Spark
    emits zero rows (SPARK-33229 family). Kept at Spark semantics: a
    union-with-constructed-row branch would contort a clean Expand plan
    to chase a corner the driver's non-empty fixtures can never reach."""
    o = load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.grouping_id().cast("long").alias("gid"),
        )
        .select("o_orderstatus", "o_orderpriority", "n", "gid")
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via roaring-style bitmaps
    (``bitmap_construct_agg`` / ``bitmap_count``): each partition builds a
    fixed-size bitset of the ids it saw, partial bitmaps OR-merge in the
    combine phase — so the shuffle carries one bitmap per (group,
    partition) instead of every distinct id (count(DISTINCT) expands rows
    until the final dedup). Same exact answer, radically cheaper at
    100 TB for dense integer id domains; ids here fit one 32k-bit bucket
    (bitmap_bit_position), the multi-bucket form adds a
    bitmap_bucket_number group key."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.bitmap_count(
            # bit positions are 1-based (position = (id−1) mod 32768), so
            # shift the 0-based fixture ids up by one or id 0 is lost
            F.bitmap_construct_agg(F.bitmap_bit_position(F.col("user_id") + 1))
        )
        .cast("long")
        .alias("n_users"),
    )


@query(
    "ext_join_skew_report",
    oracle="""
    WITH per_key AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS rows_per_key
      FROM orders GROUP BY o_custkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(SUM(rows_per_key) AS BIGINT) AS n_rows,
           CAST(max(rows_per_key) AS BIGINT) AS max_rows,
           round(CAST(quantile_cont(rows_per_key, 0.99) AS DOUBLE), 4)
             AS p99_rows,
           round(max(rows_per_key) * count(*) * 1.0 / SUM(rows_per_key), 4)
             AS skew_ratio
    FROM per_key
    """,
)
def ext_join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight join-key skew report: per-key row counts reduced to the
    numbers that decide a join strategy BEFORE you run it — key count,
    hottest key, p99, and skew ratio (max / mean; ≫1 means one key
    dominates and a plain hash join will straggle → salt it or let AQE
    split it). This is the diagnostic behind `join_skew_salted`'s
    design. Two partial-aggregated passes over (key, count) pairs — the
    fact rows themselves never move; at 100 TB this costs one shuffle of
    key cardinality, which is exactly what you pay to know whether the
    real join is safe."""
    o = load(spark, sf_dir, "orders")
    per_key = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("rows_per_key")
    )
    return per_key.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("rows_per_key").cast("long").alias("n_rows"),
        F.max("rows_per_key").cast("long").alias("max_rows"),
        F.round(
            F.percentile(F.col("rows_per_key"), F.lit(0.99)).cast("double"), 4
        ).alias("p99_rows"),
        F.round(
            F.max("rows_per_key")
            * F.count(F.lit(1))
            * F.lit(1.0)
            / F.sum("rows_per_key"),
            4,
        ).alias("skew_ratio"),
    )


@query(
    "ext_wasserstein_1d",
    oracle="""
    WITH a AS (
      -- value IS NOT NULL (Family N1 lockstep): a NULL has no percentile
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             ntile(100) OVER (ORDER BY value, event_id) AS tile
      FROM events WHERE event_type = 'click' AND value IS NOT NULL
    ), b AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents,
             ntile(100) OVER (ORDER BY value, event_id) AS tile
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    ), qa AS (
      SELECT tile, CAST(SUM(cents) // count(*) AS BIGINT) AS mean_cents
      FROM a GROUP BY tile
    ), qb AS (
      SELECT tile, CAST(SUM(cents) // count(*) AS BIGINT) AS mean_cents
      FROM b GROUP BY tile
    )
    SELECT qa.tile,
           qa.mean_cents AS click_cents,
           qb.mean_cents AS purchase_cents,
           CAST(abs(qa.mean_cents - qb.mean_cents) AS BIGINT) AS absdiff_cents
    FROM qa JOIN qb USING (tile)
    """,
)
def ext_wasserstein_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D optimal transport (Wasserstein-1) profile between two value
    distributions: click vs purchase amounts aligned percentile-by-
    percentile (the quantile-coupling that IS the optimal transport plan
    in one dimension), reporting per-percentile means and their absolute
    gap — summing absdiff_cents/100 gives W1. Unlike KL (ext_distribution_
    drift) this is a metric on the VALUE scale, defined even for disjoint
    supports — the distance distribution-shift monitors actually want for
    numeric features. Percentile means are exact integer division over
    deterministic ntile cuts.

    Scale: two ``distributed_ntile`` passes (range exchange + broadcast
    offsets — no single-task sort over events) and a 100-row join.

    NULL values (Family N1, lockstep): pre-filtered on both engines — a
    NULL has no percentile position, and left in it would tile at
    opposite ends of the value order (Spark NULLS FIRST vs DuckDB
    NULLS LAST) while each engine's mean skipped it differently."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())

    def quantiles(etype: str):
        return (
            distributed_ntile(
                ev.filter(F.col("event_type") == etype)
                .select(
                    F.round(F.col("value") * 100).cast("long").alias("cents"),
                    "value",
                    "event_id",
                ),
                ["value", "event_id"],
                100,
                out="tile",
            )
            .groupBy("tile")
            .agg(F.expr("sum(cents) DIV count(*)").alias("mean_cents"))
        )

    qa = quantiles("click").withColumnRenamed("mean_cents", "click_cents")
    qb = quantiles("purchase").withColumnRenamed("mean_cents", "purchase_cents")
    return qa.join(qb, "tile").select(
        "tile",
        "click_cents",
        "purchase_cents",
        F.abs(F.col("click_cents") - F.col("purchase_cents")).alias(
            "absdiff_cents"
        ),
    )


@query(
    "ext_gini_concentration",
    oracle="""
    WITH per_user AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS x FROM events GROUP BY user_id
    ), ranked AS (
      SELECT x, CAST(row_number() OVER (ORDER BY x, user_id) AS BIGINT) AS i
      FROM per_user
    ), agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(i * x) AS BIGINT) AS six
      FROM ranked
    )
    SELECT n AS n_users, sx AS n_events,
           CAST((2 * six * 1000000) // (n * sx) - ((n + 1) * 1000000) // n
                AS BIGINT) AS gini6
    FROM agg
    """,
)
def ext_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user activity — the concentration metric
    for 'is this corpus/source dominated by a few heavy hitters':
    G = 2·Σi·xᵢ/(n·Σx) − (n+1)/n over rank-ordered counts, computed in
    integer micro-units with deterministic (count, user_id) ranking.
    The same statistic gates training mixes (one domain contributing 90%
    of tokens) and flags bot-heavy event sources.

    Scale: one per-user count, one ``distributed_row_number`` ranking
    (range exchange + broadcast offsets — no single-task sort), one
    scalar aggregate."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("x"))
    ranked = distributed_row_number(
        per_user, ["x", "user_id"], rn="i"
    ).select("x", "i")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("x").alias("n_events"),
        F.expr(
            "(2 * sum(i * x) * 1000000) DIV (count(*) * sum(x))"
            " - ((count(*) + 1) * 1000000) DIV count(*)"
        ).alias("gini6"),
    )


@query(
    "ext_mutual_information",
    oracle="""
    WITH joint AS (
      SELECT e.event_type AS x, n.n_name AS y,
             CAST(count(*) AS BIGINT) AS cxy
      FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
      GROUP BY 1, 2
    ), mx AS (SELECT x, CAST(SUM(cxy) AS BIGINT) AS cx FROM joint GROUP BY x),
    my AS (SELECT y, CAST(SUM(cxy) AS BIGINT) AS cy FROM joint GROUP BY y),
    tot AS (SELECT CAST(SUM(cxy) AS BIGINT) AS n FROM joint),
    terms AS (
      SELECT CAST(round(
               (CAST(cxy AS DOUBLE) / n)
               * ln(CAST(cxy AS DOUBLE) * n
                    / (CAST(cx AS DOUBLE) * cy)) * 1e6) AS BIGINT) AS t6
      FROM joint JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot
    )
    SELECT CAST((SELECT count(*) FROM joint) AS BIGINT) AS n_cells,
           CAST(SUM(t6) AS BIGINT) AS mi6
    FROM terms
    """,
)
def ext_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between two categorical columns (event type x
    user nation): I(X;Y) = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))) — the feature-
    selection statistic that says whether a column carries signal about a
    label before any model is trained (MI ≈ 0 here means the nation
    assignment is independent of behavior, as the synthetic fixture
    implies). Per-cell terms integer-scaled and summed (order-independent);
    the log argument is one exact integer ratio, so both engines take ln
    of the identical double.

    Scale: one joint-count aggregation (the only data-sized shuffle); the
    marginals derive from the joint table, which is |X|x|Y| cells."""
    ev = load(spark, sf_dir, "events")
    nation = load(spark, sf_dir, "nation")
    joint = (
        ev.withColumn("nk", F.pmod("user_id", F.lit(25)))
        .join(F.broadcast(nation), F.col("nk") == F.col("n_nationkey"))
        .groupBy(F.col("event_type").alias("x"), F.col("n_name").alias("y"))
        .agg(F.count(F.lit(1)).alias("cxy"))
    )
    mx = joint.groupBy("x").agg(F.sum("cxy").alias("cx"))
    my = joint.groupBy("y").agg(F.sum("cxy").alias("cy"))
    tot = joint.agg(F.sum("cxy").alias("n"))
    t6 = F.round(
        (F.col("cxy").cast("double") / F.col("n"))
        * F.log(
            F.col("cxy").cast("double")
            * F.col("n")
            / (F.col("cx").cast("double") * F.col("cy"))
        )
        * F.lit(1e6)
    ).cast("long")
    terms = (
        joint.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .join(F.broadcast(tot))
        .select(t6.alias("t6"))
    )
    n_cells = joint.agg(F.count(F.lit(1)).alias("n_cells"))
    return terms.agg(F.sum("t6").alias("mi6")).join(n_cells).select(
        "n_cells", "mi6"
    )


@query(
    "ext_simpson_diversity",
    oracle="""
    WITH c AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS ci FROM documents GROUP BY lang
    ), t AS (SELECT CAST(SUM(ci) AS BIGINT) AS n FROM c)
    SELECT t.n AS n_docs,
           CAST(count(*) AS BIGINT) AS n_langs,
           CAST(SUM(ci * ci) * 1000000 // (t.n * t.n) AS BIGINT)
             AS simpson6,
           CAST(1000000 - SUM(ci * ci) * 1000000 // (t.n * t.n) AS BIGINT)
             AS diversity6
    FROM c, t GROUP BY t.n
    """,
)
def ext_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson concentration / diversity of the language mix: Σpᵢ² (the
    probability two random docs share a language) and its complement —
    the single-number balance check next to ext_gini_concentration's
    rank-based view and ext_temperature_mixture's corrective weights.
    Exact rational arithmetic: Σcᵢ²·10⁶ // n².

    On an EMPTY corpus Spark's global aggregate still emits one row
    (NULL sums over zero groups) while the oracle's GROUP BY t.n yields
    none — the trailing n_docs IS NOT NULL filter drops that row so both
    engines return zero rows (EMPTY_AUDIT_r9.md inverse-shape fix); a
    codegen'd no-op on any non-empty corpus.

    Scale: one tiny grouped count; the corpus is touched once."""
    docs = load(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("ci"))
    return c.agg(
        F.sum("ci").alias("n_docs"),
        F.count(F.lit(1)).alias("n_langs"),
        F.expr(
            "sum(ci * ci) * 1000000 DIV (sum(ci) * sum(ci))"
        ).alias("simpson6"),
        F.expr(
            "1000000 - sum(ci * ci) * 1000000 DIV (sum(ci) * sum(ci))"
        ).alias("diversity6"),
    ).filter(F.col("n_docs").isNotNull())


@query(
    "ext_burstiness_fano",
    oracle="""
    WITH daily AS (
      SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), agg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS days,
             CAST(SUM(n) AS BIGINT) AS sn,
             CAST(SUM(n * n) AS BIGINT) AS snn
      FROM daily GROUP BY event_type
    )
    SELECT event_type, days, sn AS n_events,
           CAST((days * snn - sn * sn) * 1000000
                // (greatest(days - 1, 1) * sn) AS BIGINT) AS fano6
    FROM agg
    """,
)
def ext_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness (Fano factor) of daily event volume per type:
    variance-to-mean ratio of the per-day counts — 1e6 means Poisson-like
    steady arrivals, far above means bursts (bot storms, batch uploads),
    far below means throttled/scheduled traffic. Computed from exact
    integer moments (n·Σx² − (Σx)²), so the ratio is deterministic; the
    same moment trick as agg_stats_exact, specialized to the monitor every
    ingest pipeline should run.

    Scale: one (day, type) rollup then a per-type scalar aggregate."""
    ev = load(spark, sf_dir, "events")
    daily = ev.select(
        F.expr("unix_micros(ts) DIV 86400000000").alias("day"), "event_type"
    ).groupBy("day", "event_type").agg(F.count(F.lit(1)).alias("n"))
    return daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("days"),
        F.sum("n").alias("n_events"),
        F.expr(
            "(count(*) * sum(n * n) - sum(n) * sum(n)) * 1000000"
            " DIV (greatest(count(*) - 1, 1) * sum(n))"
        ).alias("fano6"),
    )


@query(
    "ext_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS days, CAST(SUM(n) AS BIGINT) AS sn
      FROM daily
    ), cus AS (
      SELECT day, n,
             SUM(n * tot.days - tot.sn) OVER (ORDER BY day
               ROWS UNBOUNDED PRECEDING) AS c
      FROM daily, tot
    )
    SELECT day AS changepoint_day, n AS day_count,
           CAST(c AS BIGINT) AS cusum_scaled
    FROM cus
    ORDER BY abs(c) DESC, day LIMIT 1
    """,
)
def ext_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on daily event volume: the cumulative
    sum of deviations from the global mean peaks (in absolute value) at
    the most likely level-shift point — the standard offline changepoint
    estimator, and the alarm that localizes WHEN the drift
    ext_distribution_drift scores actually happened. Deviations are kept
    exactly integer by scaling through the day count (n·days − total)
    instead of subtracting a fractional mean.

    Scale: one daily rollup, one running window over #days rows, one
    top-1."""
    ev = load(spark, sf_dir, "events")
    daily = ev.select(
        F.expr("unix_micros(ts) DIV 86400000000").alias("day")
    ).groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    tot = daily.agg(
        F.count(F.lit(1)).alias("days"), F.sum("n").alias("sn")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cus = daily.join(F.broadcast(tot)).select(
        "day",
        "n",
        F.sum(F.col("n") * F.col("days") - F.col("sn")).over(w).alias("c"),
    )
    return (
        cus.orderBy(F.abs(F.col("c")).desc(), "day")
        .limit(1)
        .select(
            F.col("day").alias("changepoint_day"),
            F.col("n").alias("day_count"),
            F.col("c").cast("long").alias("cusum_scaled"),
        )
    )


@query(
    "ext_lorenz_curve",
    oracle="""
    WITH per_user AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS x FROM events GROUP BY user_id
    ), binned AS (
      SELECT x, ntile(10) OVER (ORDER BY x, user_id) AS decile FROM per_user
    ), d AS (
      SELECT decile, CAST(SUM(x) AS BIGINT) AS dx FROM binned GROUP BY decile
    ), t AS (SELECT CAST(SUM(dx) AS BIGINT) AS sx FROM d)
    SELECT decile,
           dx AS decile_events,
           CAST(SUM(dx) OVER (ORDER BY decile
                              ROWS UNBOUNDED PRECEDING) * 1000000 // t.sx
                AS BIGINT) AS cum_share6
    FROM d, t
    """,
)
def ext_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of user activity: cumulative share of events held by
    each activity decile (poorest first) — the curve whose gap from the
    diagonal IS ext_gini_concentration's number, kept as 10 plottable
    points for dashboards and mix reviews ('the top decile holds 40% of
    traffic'). Deterministic deciles, exact integer cumulative shares.

    Scale: per-user count, one ``distributed_ntile`` decile assignment
    (no single-task sort), a 10-row running sum."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("x"))
    binned = distributed_ntile(
        per_user, ["x", "user_id"], 10, out="decile"
    ).select("x", "decile")
    d = binned.groupBy("decile").agg(F.sum("x").alias("dx"))
    t = d.agg(F.sum("dx").alias("sx"))
    cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return d.join(F.broadcast(t)).select(
        "decile",
        F.col("dx").alias("decile_events"),
        F.expr(
            "sum(dx) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING"
            " AND CURRENT ROW) * 1000000 DIV sx"
        ).alias("cum_share6"),
    )


@query(
    "agg_hll_native_union",
    oracle="""
    SELECT CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS exact_docs,
           true AS union_ok
    FROM documents
    """,
)
def agg_hll_native_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native HLL sketch surface (Spark 3.5+ Datasketches bindings):
    hll_sketch_agg builds one sketch per source partition, hll_union_agg
    merges the per-source sketches, hll_sketch_estimate reads the merged
    estimate — the build→merge→read lifecycle a 100 TB pipeline uses to
    count distincts incrementally (per-shard sketches unioned at close,
    never re-scanning closed shards). Checked as the boolean invariant
    (merged estimate within ±10%% of exact, rsd default lgK=12 gives <2%%)
    like agg_approx_count_distinct; exact count computed side by side.
    Unlike ext_hll_union's hand-rolled 64-register sketch (oracle-exact by
    construction), this key pins the BUILT-IN binary-sketch surface."""
    docs = load(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.hll_sketch_agg("doc_id").alias("sk")
    )
    # count("source") not count(*): the oracle's count(DISTINCT source)
    # skips NULL (Family N4) — the NULL-source group is not a named
    # shard, but its sketch still joins the union so its docs keep
    # counting toward the merged estimate, exactly like exact_docs
    merged = per_source.agg(
        F.count("source").alias("n_sources"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = docs.agg(F.count_distinct("doc_id").alias("exact_docs"))
    return merged.join(F.broadcast(exact)).select(
        "n_sources",
        "exact_docs",
        (
            (F.col("est") >= F.col("exact_docs") * 0.9)
            & (F.col("est") <= F.col("exact_docs") * 1.1)
        ).alias("union_ok"),
    )


@query(
    "agg_listagg_ordered",
    oracle="""
    SELECT l_returnflag,
           CAST(date_part('year', l_shipdate) AS BIGINT) AS yr,
           string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus)
             AS statuses,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY 1, 2
    """,
)
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (SQL:2016 LISTAGG, new in Spark 4.0):
    DISTINCT values concatenated in a DEFINED order — the report-friendly
    sibling of agg_collect_sorted's array form. The explicit WITHIN GROUP
    ordering is the whole point: an unordered listagg is
    partitioning-dependent and would never hash-match across engines.

    Scale: distinct + ordered-agg is a composed shuffle on the group key;
    payload is the small distinct set per group, not the raw rows."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy(
        "l_returnflag", F.year("l_shipdate").cast("long").alias("yr")
    ).agg(
        F.expr(
            "listagg(DISTINCT l_linestatus, ',') WITHIN GROUP (ORDER BY l_linestatus)"
        ).alias("statuses"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# KLL/GK sketch rank-error invariant (round-8 thaw; ROADMAP_r8 candidate)
# ---------------------------------------------------------------------------

_KLL_EPS = 0.02  # rank tolerance; percentile_approx accuracy 10000 => ~1e-4


@query(
    "agg_kll_quantile_invariant",
    oracle="""
    SELECT l_returnflag, q_pct, TRUE AS within_tol
    FROM (SELECT DISTINCT l_returnflag FROM lineitem
          WHERE l_extendedprice IS NOT NULL),
         (SELECT unnest([25, 50, 75]) AS q_pct)
    ORDER BY l_returnflag, q_pct
    """,
)
def agg_kll_quantile_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy INVARIANT for ``percentile_approx`` (Spark's
    GK/KLL-family quantile sketch): for each (group, q) the approximate
    quantile must sit within rank tolerance eps of the exact rank —
    checked by counting, per group, how many values fall strictly below
    / at-or-below the sketch's answer and comparing to q·n ± eps·n. The
    driver-checkable output is the boolean per (group, q_pct), the same
    invariant shape as ``agg_approx_count_distinct``. q_pct is an
    integer column (float group keys hash-flake across engines).

    Scale: the sketch side is one pass with mergeable partials (that is
    the point of KLL); the rank check joins the ≤(groups×3)-row answer
    table back as a BROADCAST and re-aggregates — one extra scan, no
    extra shuffle width. percentile_approx accuracy 10000 bounds rank
    error at ~1e-4, far inside the 0.02 gate, so the invariant is
    robustly TRUE without being vacuous (accuracy 10 would fail it).

    NULL prices (Family N1): a group with no non-NULL prices has no
    quantiles to check — the oracle's group list carries the same
    IS NOT NULL gate the sketch applies implicitly (posexplode of a NULL
    sketch emits nothing), and the rank target counts only non-NULL
    values, matching the comparisons' own NULL-skipping."""
    li = load(spark, sf_dir, "lineitem")
    approx = li.groupBy("l_returnflag").agg(
        F.percentile_approx(
            "l_extendedprice",
            F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)),
            10000,
        ).alias("aps")
    )
    ap = approx.select(
        "l_returnflag", F.posexplode("aps").alias("idx", "ap")
    ).select(
        "l_returnflag",
        (F.col("idx") * 25 + 25).cast("int").alias("q_pct"),
        "ap",
    )
    # NULL-safe equi-join (IS NOT DISTINCT FROM): a NULL-returnflag group
    # that has non-NULL prices still gets its rank check — a plain
    # equi-join would drop it Spark-side while the oracle's DISTINCT
    # group list keeps it (the agg_min_by_max_by / udaf_grouped_map_zscore
    # precedent). Still a broadcast equi-join: eqNullSafe plans as
    # BroadcastHashJoin on the null-safe key.
    ranks = (
        li.join(
            F.broadcast(ap),
            li["l_returnflag"].eqNullSafe(ap["l_returnflag"]),
        )
        .drop(li["l_returnflag"])
        .groupBy("l_returnflag", "q_pct", "ap")
        .agg(
            F.sum(
                (F.col("l_extendedprice") < F.col("ap")).cast("long")
            ).alias("n_lt"),
            F.sum(
                (F.col("l_extendedprice") <= F.col("ap")).cast("long")
            ).alias("n_le"),
            F.count("l_extendedprice").alias("n"),
        )
    )
    target = F.col("q_pct") / F.lit(100.0) * F.col("n")
    return ranks.select(
        "l_returnflag",
        "q_pct",
        (
            (F.col("n_lt") <= target + F.lit(_KLL_EPS) * F.col("n"))
            & (F.col("n_le") >= target - F.lit(_KLL_EPS) * F.col("n"))
        ).alias("within_tol"),
    )
