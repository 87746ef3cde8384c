"""Fixture table loading + deterministic-comparison helpers.

The driver compares every query against a DuckDB oracle by row-count,
schema, and order-insensitive value-hash (``__spark_entry__.py`` docstring).
Floating-point aggregation order differs between engines, so any SUM/AVG of
doubles must be made bit-deterministic. The pattern used engine-wide:

    round(x * 10^s) -> bigint -> exact integer SUM -> / 10.0^s

Both engines compute ``x * 10^s`` on identical IEEE-754 doubles (same bits),
round a value that is never near a .5 boundary (the fixtures carry <= 4
decimal digits), sum exactly in int64, and perform one identical final
division. Helpers below encode that pattern for the Spark side; oracle SQL
mirrors it textually.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table (columnar parquet scan; Catalyst prunes
    columns/filters — the vectorized equivalent of the reference's
    row-at-a-time SerDe reader, HiveFilePartitionReaderFactory.scala:57-64).

    ``events.ts`` normalizes to a µs TIMESTAMP regardless of fixture
    vintage: older driver fixtures store INT64 TIMESTAMP(NANOS) (arrives as
    a ns long under ``nanosAsLong`` and is floored to µs — the same
    truncation DuckDB applies), newer ones store parquet timestamp[us]
    (arrives as TIMESTAMP_NTZ and is reinterpreted as a UTC instant).
    Either way downstream operators and the DuckDB oracle see identical µs
    wall-clock values. Integer division (``DIV``) is deliberate on the ns
    path: ns epochs (~1.7e18) exceed double's exact-integer range.
    """
    # Defensive session confs: the harness may hand us a session built
    # without them. Both are dynamically settable. UTC keeps timestamp
    # rendering/epoch math identical to the (timezone-naive) DuckDB oracle;
    # nanosAsLong is required or Spark 4 refuses INT64 TIMESTAMP(NANOS)
    # parquet columns (PARQUET_TYPE_ILLEGAL) — a no-op on µs fixtures.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        ts_type = df.schema["ts"].dataType.simpleString()
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        elif ts_type == "timestamp_ntz":
            # NTZ→LTZ under the UTC session above: wall clock == instant,
            # matching both the ns path and DuckDB's naive-timestamp view.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition to full parallelism before CPU-heavy per-row
    work (shingling, hashing, vector math).

    Small tables (and any small-file ingest) can arrive as a single parquet
    split, which would serialize everything downstream into one task. The
    shuffle moves only the input rows — cheap relative to the compute it
    parallelizes. At 100 TB the scan already yields thousands of splits, so
    this becomes a rebalance, not a bottleneck; keep it OFF simple
    scan/filter/agg paths where Catalyst's split planning is already right.
    """
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql queries)."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-insensitive-deterministic SUM of a double column.

    Exact int64 arithmetic; value equals SUM(round(x, scale)) as double.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.round(c * F.lit(10**scale)).cast("long")) / F.lit(float(10**scale))


def davg(col: Column | str, scale: int = 2) -> Column:
    """Deterministic AVG: exact integer sum divided by count."""
    c = F.col(col) if isinstance(col, str) else col
    scaled = F.round(c * F.lit(10**scale)).cast("long")
    return F.sum(scaled) / (F.count(scaled) * F.lit(float(10**scale)))


def sql_dsum(expr: str, scale: int = 2) -> str:
    """SQL text mirroring :func:`dsum` — valid in BOTH DuckDB and Spark SQL.

    ``1e{scale}`` is a double literal in both dialects (a plain ``100.0``
    would parse as DECIMAL(4,1) in Spark SQL and change the result type).
    """
    return f"SUM(CAST(round(({expr}) * {10**scale}) AS BIGINT)) / 1e{scale}"


def sql_davg(expr: str, scale: int = 2) -> str:
    """SQL text mirroring :func:`davg` (DuckDB- and Spark-SQL-compatible)."""
    scaled = f"CAST(round(({expr}) * {10**scale}) AS BIGINT)"
    return f"SUM({scaled}) / (COUNT({scaled}) * 1e{scale})"


# Malformed-JSON quarantine for the events.props payload (oracle side;
# RAGGED_AUDIT_r13.md Family J): Spark's get_json_object returns NULL on
# a payload its strict parser rejects (truncated object, bare word), but
# DuckDB's json_extract RAISES — TRY_CAST around the EXTRACTION doesn't
# help because the parse itself throws. Substituting this expression for
# a bare `props` makes every DuckDB extraction NULL-and-keep, matching
# Spark exactly on strict-invalid payloads. (Payloads where the two
# strict parsers themselves disagree — single-quoted keys, NaN literals —
# are out of contract; the fixtures and audits probe strict-invalid
# shapes only.)
SQL_PROPS_JSON = "(CASE WHEN json_valid(props) THEN props END)"
