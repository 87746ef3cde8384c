"""Scalar function families (SURVEY §2B "Scalar functions").

One query key per family, each exercising several functions in one
projection. All are JVM-side, codegen'd expressions (never Python UDFs) —
at 100 TB these run inside WholeStageCodegen at scan speed.

Dialect notes baked into the oracles (verified against DuckDB 1.x):
- DuckDB ``regexp_replace`` needs the ``'g'`` flag to match Spark's
  replace-all; ``log`` is base-10 (Spark's natural log ↔ ``ln``).
- DuckDB double→int CAST rounds, Spark truncates — casts below only go
  through values where both agree (integral doubles) or use floor/round
  explicitly.
- Epoch seconds: Spark ``unix_timestamp`` floors; DuckDB ``epoch`` keeps
  fractions → ``CAST(floor(epoch(ts)) AS BIGINT)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import SQL_PROPS_JSON, load


@query(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           concat_ws('|', c_name, c_mktsegment) AS tagged,
           upper(replace(c_name, 'ß', 'ss')) AS up,
           lower(c_mktsegment) AS lo,
           CAST(length(c_name) AS INT) AS name_len,
           substring(c_name, 1, 8) AS prefix,
           trim('  pad  ') AS trimmed,
           replace(c_mktsegment, 'U', '_') AS replaced,
           lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nat_padded,
           string_split(c_name, '#')[1] AS name_head
    FROM customer
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat/substring/upper/lower/trim/length/replace/lpad/split.

    upper() goes through an explicit ß→ss fold on both sides — see the
    inline X4 note (locale-table divergence pinned, not documented-away).
    """
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat_ws("|", "c_name", "c_mktsegment").alias("tagged"),
        # ß pin (EXTREME_AUDIT_r11.md Family X4): upper('ß') is 'SS' on
        # the JVM but 'ẞ' (capital sharp s) under DuckDB's ICU-style
        # mapping — a genuine locale-table difference. Folding ß→ss BEFORE
        # upper makes both engines compute the JVM's (and German
        # orthography's) result identically; all other fixture codepoints
        # (ü ï é Ö É, CJK, emoji) case-map identically on both engines.
        F.upper(F.replace(F.col("c_name"), F.lit("ß"), F.lit("ss"))).alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.length("c_name").cast("int").alias("name_len"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
        F.replace(F.col("c_mktsegment"), F.lit("U"), F.lit("_")).alias("replaced"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("nat_padded"),
        F.split(F.col("c_name"), "#").getItem(0).alias("name_head"),
    )


@query(
    "fn_regex",
    oracle="""
    SELECT p_partkey, p_brand,
           regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
           regexp_matches(p_type, '^(PROMO|ECONOMY)$') AS is_cheap_tier
    FROM part
    """,
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / regexp_replace (replace-all) / rlike."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        "p_brand",
        F.regexp_extract("p_brand", "#([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
        F.col("p_type").rlike("^(PROMO|ECONOMY)$").alias("is_cheap_tier"),
    )


@query(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT) AS dom,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day, date_add, datediff, date_trunc, formatting, epoch."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_format(F.date_add(F.col("o_orderdate"), 30), "yyyy-MM-dd").alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias("days_since"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_quantity / 7.0, 2) AS qty_sevenths,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(ceil(l_extendedprice / 1000.0) AS BIGINT) AS price_k_ceil,
           CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_k_floor,
           ((CAST(l_orderkey AS INT) % 7) + 7) % 7 AS key_mod,
           power(l_quantity, 2.0) AS qty_sq,
           CASE WHEN l_extendedprice > 0
                THEN sqrt(l_extendedprice) END AS price_root,
           CASE WHEN l_extendedprice > 0
                THEN round(ln(l_extendedprice), 4) END AS price_ln,
           CAST(sign(l_discount - 0.05) AS INT) AS disc_sign
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/pmod/pow/sqrt/log/sign — all bit-deterministic
    per-row (quantity/7 never lands on a representable .5 boundary)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_quantity") / 7.0, 2).alias("qty_sevenths"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_extendedprice") / 1000.0).alias("price_k_ceil"),
        F.floor(F.col("l_extendedprice") / 1000.0).alias("price_k_floor"),
        F.pmod(F.col("l_orderkey").cast("int"), F.lit(7)).alias("key_mod"),
        F.pow(F.col("l_quantity"), 2.0).alias("qty_sq"),
        # domain gate (EXTREME_AUDIT_r11.md Family X4): sqrt(-x) is NaN on
        # the JVM but a RAISE on DuckDB (ln likewise NULL-vs-raise) — a
        # refund-negative price must produce NULL explicitly and
        # identically on both engines, never an engine-convention value
        F.when(
            F.col("l_extendedprice") > 0, F.sqrt("l_extendedprice")
        ).alias("price_root"),
        # libm natural-log differs by ~1 ulp between JVM and DuckDB —
        # rounded to 4 decimals so the comparison is implementation-proof.
        F.when(
            F.col("l_extendedprice") > 0,
            F.round(F.log("l_extendedprice"), 4),
        ).alias("price_ln"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000.0 THEN 'big'
                WHEN o_totalprice > 100000.0 THEN 'mid'
                ELSE 'small' END AS size_tier,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
           greatest(o_totalprice, 150000.0) AS price_floor150k,
           least(o_totalprice, 150000.0) AS price_cap150k
    FROM orders
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif / greatest / least."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000.0, "big")
        .when(F.col("o_totalprice") > 100000.0, "mid")
        .otherwise("small")
        .alias("size_tier"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
        F.greatest(F.col("o_totalprice"), F.lit(150000.0)).alias("price_floor150k"),
        F.least(F.col("o_totalprice"), F.lit(150000.0)).alias("price_cap150k"),
    )


@query(
    "fn_cast",
    oracle="""
    SELECT l_orderkey,
           CAST(trunc(l_quantity) AS INT) AS qty_int,
           CAST(l_linenumber AS DOUBLE) AS line_dbl,
           CAST(l_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec_str,
           CAST(CAST(strftime(l_shipdate, '%Y-%m-%d') AS DATE) AS VARCHAR) AS ship_day
    FROM lineitem
    """,
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts across int/double/string/decimal/date. double→int is pinned
    to TRUNCATION on both sides (EXTREME_AUDIT_r11.md Family X4): Spark's
    CAST truncates toward zero (the SQL-standard behavior) while DuckDB's
    rounds — the oracle casts through trunc() so a 49.999999 quantity is
    49 on both engines. double→string goes through DECIMAL so both
    engines format identically."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_linenumber").cast("double").alias("line_dbl"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_orderkey").cast("string").cast("long").alias("key_roundtrip"),
        F.col("l_extendedprice").cast("decimal(12,2)").cast("string").alias("price_dec_str"),
        F.to_date(F.date_format("l_shipdate", "yyyy-MM-dd")).cast("string").alias("ship_day"),
    )


@query(
    "fn_array",
    oracle="""
    SELECT p_partkey,
           array_to_string([p_brand, p_type], '|') AS tags,
           CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
           list_contains(string_split(p_name, ' '), 'green') AS has_green,
           array_to_string(list_sort(string_split(p_name, ' ')), '|')
             AS sorted_words,
           array_to_string(string_split(p_name, ' ')[1:2], '|') AS first_two
    FROM part
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array literal, size, array_contains, sort_array, slice.

    Array-valued projections are delimiter-joined to strings on both sides:
    the driver's pandas canonicalizer cannot hash list cells."""
    p = load(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        # both engines skip NULL elements when joining, but an all-NULL
        # list renders NULL in array_to_string (string_agg-of-nothing)
        # and '' in array_join — the compact-size guard mirrors the
        # oracle (Family N5)
        F.when(
            F.size(F.array_compact(F.array(F.col("p_brand"), F.col("p_type")))) > 0,
            F.array_join(F.array(F.col("p_brand"), F.col("p_type")), "|"),
        ).alias("tags"),
        F.size(words).cast("int").alias("n_words"),
        F.array_contains(words, "green").alias("has_green"),
        F.array_join(F.sort_array(words), "|").alias("sorted_words"),
        F.array_join(F.slice(words, 1, 2), "|").alias("first_two"),
    )


@query(
    "fn_array_explode",
    oracle="""
    SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
    FROM part
    WHERE p_size <= 5
    """,
)
def fn_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode (lateral array unnest) — the row-generating array op."""
    p = load(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    return p.select("p_partkey", F.explode(F.split("p_name", " ")).alias("word"))


@query(
    "fn_map",
    oracle="""
    SELECT o_orderkey,
           array_to_string(['price', 'status_len'], '|') AS mkeys,
           array_to_string([CAST(round(o_totalprice * 1e2) AS BIGINT),
                            CAST(length(o_orderstatus) * 100 AS BIGINT)],
                           '|') AS mvals_cents,
           o_totalprice AS price_val
    FROM orders
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + access, projected to delimiter-joined key/value
    strings (SURVEY flags DuckDB's map hashing as dialect-divergent, and the
    driver's canonicalizer cannot hash list cells; double values are scaled
    to integer cents before joining so the string render is engine-exact)."""
    o = load(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("price"),
        F.col("o_totalprice"),
        F.lit("status_len"),
        F.length("o_orderstatus").cast("double"),
    )
    return o.select(
        "o_orderkey",
        F.array_join(F.map_keys(m), "|").alias("mkeys"),
        # all-NULL value list renders NULL in the oracle's
        # array_to_string (string_agg-of-nothing) vs '' here — the
        # compact-size guard mirrors it (Family N5)
        F.when(
            F.size(
                F.array_compact(
                    F.transform(
                        F.map_values(m),
                        lambda x: F.round(x * 100).cast("bigint"),
                    )
                )
            )
            > 0,
            F.array_join(
                F.transform(
                    F.map_values(m), lambda x: F.round(x * 100).cast("bigint")
                ),
                "|",
            ),
        ).alias("mvals_cents"),
        F.element_at(m, "price").alias("price_val"),
    )


@query(
    "fn_json",
    oracle=f"""
    SELECT event_id,
           json_extract_string({SQL_PROPS_JSON}, '$.k') AS k_str,
           TRY_CAST(json_extract_string({SQL_PROPS_JSON}, '$.k') AS INT) AS k_int,
           json_extract_string({SQL_PROPS_JSON}, '$.missing') AS missing
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object + typed extraction from the events.props JSON column.

    try_cast ↔ TRY_CAST (EXTREME_AUDIT_r11.md Family X3): a freeform JSON
    payload will eventually carry a non-scalar under a scalar-typed key
    (props.k = [1,2] — routine schema drift at 100 TB); a bare cast raises
    on BOTH engines (differently, so the driver can hash neither), while
    NULL-and-keep is the explicit, engine-agreed semantics."""
    ev = load(spark, sf_dir, "events")
    # json_tuple (r16): one parse of props yields both top-level paths —
    # the previous three get_json_object calls parsed the same document
    # three times per row. json_tuple('k') ≡ get_json_object('$.k') for
    # top-level keys, including the non-scalar (raw JSON text) and
    # invalid-JSON (NULL) edge semantics; k_int is the same try_cast of
    # the single extracted string.
    return ev.select(
        "event_id", F.json_tuple("props", "k", "missing").alias("k_str", "missing")
    ).select(
        "event_id",
        "k_str",
        F.col("k_str").try_cast("int").alias("k_int"),
        "missing",
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT l_orderkey,
           l_orderkey & 255 AS b_and,
           l_orderkey | 16 AS b_or,
           xor(l_orderkey, l_partkey) AS b_xor,
           ~l_orderkey AS b_not,
           l_orderkey << 2 AS b_shl,
           l_orderkey >> 3 AS b_shr,
           CAST(bit_count(l_orderkey) AS INT) AS b_popcnt
    FROM lineitem
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator family (AND/OR/XOR/NOT, shifts, popcount) — used by
    the engine's own sketches (SimHash chunks, LSH band signatures)."""
    li = load(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey")
    return li.select(
        "l_orderkey",
        k.bitwiseAND(F.lit(255)).alias("b_and"),
        k.bitwiseOR(F.lit(16)).alias("b_or"),
        k.bitwiseXOR(F.col("l_partkey")).alias("b_xor"),
        F.bitwise_not(k).alias("b_not"),
        F.shiftleft(k, 2).alias("b_shl"),
        F.shiftright(k, 3).alias("b_shr"),
        F.bit_count(k).alias("b_popcnt"),
    )


@query(
    "fn_hash",
    oracle="""
    SELECT o_orderkey,
           md5(o_orderstatus || CAST(o_orderkey AS VARCHAR)) AS h_md5,
           sha256(o_orderpriority) AS h_sha256,
           length(md5(o_orderstatus)) AS md5_len
    FROM orders
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hash family (md5, sha2-256) — the primitives under
    content-addressed dedup and fingerprinting; hex output is identical
    across engines."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.md5(F.concat(F.col("o_orderstatus"), F.col("o_orderkey").cast("string"))).alias("h_md5"),
        F.sha2("o_orderpriority", 256).alias("h_sha256"),
        F.length(F.md5("o_orderstatus")).alias("md5_len"),
    )


@query(
    "fn_json_nested",
    oracle="""
    SELECT o_orderkey AS id,
           o_orderstatus AS status,
           o_totalprice AS price,
           unnest([o_orderkey % 3, o_orderkey % 5]) AS tag
    FROM orders
    """,
)
def fn_json_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested JSON round trip: build a nested document with
    ``to_json(struct(..., struct(...), array(...)))``, parse it back with
    ``from_json`` under an explicit nested schema, then flatten the inner
    array with ``explode`` — serialize → parse → flatten, the full
    semi-structured lifecycle (reference's JSON provider handles nested
    types per its validator, JsonProviderFileWriteBuilder.scala:47-56).
    The oracle verifies the survived SEMANTICS straight from the base
    table, no JSON needed."""
    o = load(spark, sf_dir, "orders")
    doc = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("id"),
            F.struct(
                F.col("o_orderstatus").alias("st"),
                F.col("o_totalprice").alias("price"),
            ).alias("info"),
            F.array(F.col("o_orderkey") % 3, F.col("o_orderkey") % 5).alias("tags"),
        )
    )
    schema = "id BIGINT, info STRUCT<st: STRING, price: DOUBLE>, tags ARRAY<BIGINT>"
    parsed = o.select(F.from_json(doc, schema).alias("j"))
    return parsed.select(
        F.col("j.id").alias("id"),
        F.col("j.info.st").alias("status"),
        F.col("j.info.price").alias("price"),
        F.explode("j.tags").alias("tag"),
    )


@query(
    "fn_struct",
    oracle="""
    WITH m AS (
      SELECT o_orderstatus,
             min(struct_pack(p := o_totalprice, k := o_orderkey)) AS s,
             max(struct_pack(p := o_totalprice, k := o_orderkey)) AS t
      FROM orders
      -- NOT NULL gates (Family N5 lockstep): the engines disagree on
      -- row-value comparison with NULL fields (Spark's struct >= is
      -- NULL, DuckDB ranks NULL fields high) and on min/max over
      -- structs with NULL members — both sides compare only known rows
      WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
        AND o_totalprice IS NOT NULL
        AND (o_orderstatus, o_orderpriority) >= ('O', '3-MEDIUM')
      GROUP BY o_orderstatus
    )
    SELECT o_orderstatus,
           s.p AS min_price, CAST(s.k AS BIGINT) AS min_key,
           t.p AS max_price, CAST(t.k AS BIGINT) AS max_key
    FROM m
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct values as first-class data: lexicographic struct comparison
    in the filter (row-value semantics — identical in both engines) and
    min/max over struct columns as a deterministic argmin/argmax (the
    (price, key) tuple is unique, so ties are impossible). The structs
    exist only inside the aggregate; the output is projected flat because
    the oracle comparison works on scalar columns.

    NULL fields (Family N5, lockstep): rows with a NULL status, priority,
    or price are gated out on BOTH engines — Spark's struct comparison
    yields NULL on a NULL field (row filtered) where DuckDB's row-value
    comparison ranks NULL fields high (row kept), and struct min/max
    over NULL members diverges the same way."""
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus").isNotNull()
        & F.col("o_orderpriority").isNotNull()
        & F.col("o_totalprice").isNotNull()
    )
    pair = F.struct(
        F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k")
    )
    bound = F.struct(
        F.lit("O").alias("o_orderstatus"), F.lit("3-MEDIUM").alias("o_orderpriority")
    )
    return (
        o.filter(F.struct("o_orderstatus", "o_orderpriority") >= bound)
        .groupBy("o_orderstatus")
        .agg(F.min(pair).alias("s"), F.max(pair).alias("t"))
        .select(
            "o_orderstatus",
            F.col("s.p").alias("min_price"),
            F.col("s.k").cast("long").alias("min_key"),
            F.col("t.p").alias("max_price"),
            F.col("t.k").cast("long").alias("max_key"),
        )
    )


@query(
    "fn_datetime_arith",
    oracle="""
    SELECT o_orderkey,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           strftime(o_orderdate + INTERVAL 1 MONTH, '%Y-%m-%d') AS next_month,
           CAST(date_part('dow', o_orderdate) + 1 AS BIGINT) AS dow,
           CAST(date_part('quarter', o_orderdate) AS BIGINT) AS quarter
    FROM orders WHERE o_orderkey % 25 = 0
    """,
)
def fn_datetime_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic family: month/week truncation, end-of-month,
    add_months (with the end-of-month clamp both engines share:
    Jan 31 + 1 month = Feb 29), day-of-week (Spark 1=Sunday vs DuckDB
    0=Sunday, aligned via +1), quarter. All projected as formatted strings
    / bigints so the comparison is exact. Pure codegen'd projections —
    scan-throughput at any scale."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 25 == 0)
    return o.select(
        "o_orderkey",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.date_format(F.date_trunc("week", "o_orderdate"), "yyyy-MM-dd").alias(
            "week_start"
        ),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.add_months("o_orderdate", 1), "yyyy-MM-dd").alias(
            "next_month"
        ),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
        F.quarter("o_orderdate").cast("long").alias("quarter"),
    )


@query(
    "fn_try_arith",
    oracle="""
    SELECT o_orderkey,
           o_totalprice / NULLIF(o_orderkey % 5, 0) AS safe_div,
           TRY_CAST(CASE WHEN o_orderkey % 3 = 0 THEN 'x'
                         ELSE CAST(o_orderkey AS VARCHAR) END AS BIGINT)
             AS safe_cast,
           CASE WHEN o_orderkey >= 2234 THEN NULL
                ELSE 9000000000000000000 + o_orderkey * 100000000000000 END
             AS safe_add
    FROM orders WHERE o_orderkey % 10 = 0
    """,
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic under ANSI semantics: ``try_divide`` (NULL on
    ÷0 instead of an error), ``try_cast`` (NULL on malformed input),
    ``try_add`` (NULL on int64 overflow — the oracle reproduces the exact
    overflow boundary: 9e18 + k·10¹⁴ exceeds int64 max from k=2234). At
    100 TB these are how one bad row degrades to one NULL instead of
    failing a stage under ``spark.sql.ansi.enabled`` — the same
    row-not-job blast-radius principle as the corrupt-file/row scans.

    There are TWO overflow boundaries (round-8 sf0.1 sweep): the SUM
    overflows from k=2234 (try_add's job), but the inner PRODUCT k·10¹⁴
    itself overflows int64 from k>92,233 — keys that exist at sf0.1+ —
    and a raw ``*`` there raises BEFORE try_add ever runs (the oracle's
    CASE short-circuits lazily, so DuckDB never evaluates it). The
    product therefore goes through ``try_multiply``; NULL then flows
    through try_add, matching the oracle's NULL for every k >= 2234."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    return o.select(
        "o_orderkey",
        F.try_divide(
            F.col("o_totalprice"), (F.col("o_orderkey") % 5).cast("double")
        ).alias("safe_div"),
        F.when(F.col("o_orderkey") % 3 == 0, "x")
        .otherwise(F.col("o_orderkey").cast("string"))
        .try_cast("long")
        .alias("safe_cast"),
        F.try_add(
            F.lit(9_000_000_000_000_000_000),
            F.try_multiply(
                F.col("o_orderkey"), F.lit(100_000_000_000_000)
            ),
        ).alias("safe_add"),
    )


@query(
    "fn_printf_format",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice IS NOT NULL AND o_orderstatus IS NOT NULL
                THEN printf('%06d|%.2f|%s',
                            o_orderkey, o_totalprice, o_orderstatus)
           END AS formatted,
           printf('%x', o_orderkey) AS hex_key
    FROM orders WHERE o_orderkey % 20 = 0
    """,
)
def fn_printf_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """printf-style formatting (``format_string``): zero-padded ids, fixed
    2-decimal prices (exact: the prices carry two decimals, so %.2f is a
    representation, not a rounding), hex rendering. The formatted-export
    projection pattern — all codegen'd, no Python.

    NULL arguments guarded in lockstep (LATTICE_AUDIT_r15.md): Spark's
    format_string renders NULL args as Java-Formatter text ("null",
    zero-width %d) where DuckDB's printf propagates NULL through the
    whole result — a row with an unknown field has no well-defined
    rendering, so both engines emit NULL for it (the hex key, built from
    the never-NULL id, stays unconditional)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    return o.select(
        "o_orderkey",
        F.when(
            F.col("o_totalprice").isNotNull()
            & F.col("o_orderstatus").isNotNull(),
            F.format_string(
                "%06d|%.2f|%s", "o_orderkey", "o_totalprice", "o_orderstatus"
            ),
        ).alias("formatted"),
        F.format_string("%x", "o_orderkey").alias("hex_key"),
    )


@query(
    "fn_url_parse",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.org/docs/' || doc_id
               || '?lang=' || lang || '&n=' || n_chars AS url
      FROM documents WHERE doc_id % 10 = 0
    )
    SELECT doc_id, url,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param,
           regexp_extract(url, '^([a-z]+)://', 1) AS protocol
    FROM u
    """,
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing (``parse_url``): host / path / single query parameter /
    protocol extraction — the crawl-pipeline projection that turns a raw
    URL column into joinable dimensions (domain dedup, per-site quotas).
    Spark side uses the dedicated JVM parser; the oracle mirrors it with
    anchored regexes, which the fixture-constructed URLs satisfy exactly.
    Pure codegen'd projection — runs at scan throughput."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/docs/"),
        F.col("doc_id"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&n="),
        F.col("n_chars"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
    )


@query(
    "fn_variant_extract",
    oracle=f"""
    SELECT event_id,
           CAST(json_extract({SQL_PROPS_JSON}, '$.k') AS BIGINT) AS k,
           CAST(json_extract({SQL_PROPS_JSON}, '$.k') AS BIGINT) % 10 AS k_bucket,
           CASE WHEN CAST(json_extract({SQL_PROPS_JSON}, '$.k') AS BIGINT) >= 50
                THEN 'high' ELSE 'low' END AS k_band
    FROM events WHERE event_id % 25 = 0
    """,
)
def fn_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT ingestion (Spark 4): ``parse_json`` turns the JSON props
    column into a binary VARIANT once, then ``variant_get`` extracts
    typed paths without re-parsing per access — the semi-structured
    fast path that replaces repeated get_json_object string parsing
    (each of which re-tokenizes the JSON). Downstream expressions
    (bucketing, banding) run on the extracted long, fully codegen'd."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 25 == 0)
    # try_parse_json, not parse_json: a malformed payload must become a
    # NULL variant (variant_get then yields NULL) to match the oracle's
    # json_valid quarantine — bare parse_json raises on it (Family J).
    v = ev.select("event_id", F.try_parse_json("props").alias("p"))
    k = F.variant_get("p", "$.k", "long")
    return v.select(
        "event_id",
        k.alias("k"),
        (k % 10).alias("k_bucket"),
        F.when(k >= 50, "high").otherwise("low").alias("k_band"),
    )


@query(
    "fn_from_csv",
    oracle="""
    WITH raw AS (
      SELECT o_orderkey,
             o_orderkey || ',' || o_orderstatus || ',' || o_totalprice AS line
      FROM orders WHERE o_orderkey % 50 = 0
        AND o_orderkey IS NOT NULL AND o_orderstatus IS NOT NULL
        AND o_totalprice IS NOT NULL
    )
    SELECT o_orderkey, line,
           CAST(string_split(line, ',')[1] AS BIGINT) AS csv_key,
           string_split(line, ',')[2] AS csv_status,
           CAST(string_split(line, ',')[3] AS DOUBLE) AS csv_price
    FROM raw
    """,
)
def fn_from_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema'd in-row CSV parsing (``from_csv``): embedded delimited
    strings (log lines, legacy exports stuffed in a column) parsed into a
    typed struct by the same CSV parser the file reader uses — types
    asserted by schema, not regex guesswork. The oracle re-splits
    textually; values are fixture-clean so both agree exactly.

    NULL-part lockstep (concat_ws rule, r14/r15 sweep): a NULL field
    would make Spark's concat_ws emit a SHORTENED line (mis-aligning
    from_csv's positional parse) while the oracle's || yields a NULL
    line — a row can only be CSV-round-tripped when all its fields are
    known, so NULL-field rows are filtered on both engines. The
    ``o_orderkey IS NOT NULL`` conjunct is strictly redundant on both
    engines (``o_orderkey % 50 = 0`` already rejects NULL keys) and kept
    DELIBERATELY (r15 ADVICE adjudication): the three explicit
    field-non-NULL conjuncts state the round-trippability contract as a
    unit, so a future edit that swaps the modulo sampler for a
    NULL-passing predicate cannot silently reopen the NULL-line split."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderkey") % 50 == 0)
        & F.col("o_orderkey").isNotNull()
        & F.col("o_orderstatus").isNotNull()
        & F.col("o_totalprice").isNotNull()
    )
    raw = o.select(
        "o_orderkey",
        F.concat_ws(
            ",", "o_orderkey", "o_orderstatus", F.col("o_totalprice").cast("string")
        ).alias("line"),
    )
    parsed = raw.select(
        "o_orderkey",
        "line",
        F.from_csv(
            "line", F.lit("k BIGINT, s STRING, p DOUBLE")
        ).alias("c"),
    )
    return parsed.select(
        "o_orderkey",
        "line",
        F.col("c.k").alias("csv_key"),
        F.col("c.s").alias("csv_status"),
        F.col("c.p").alias("csv_price"),
    )


@query(
    "fn_base_conv",
    oracle="""
    SELECT o_orderkey,
           to_base(o_orderkey, 16) AS hex16,
           to_base(o_orderkey, 2) AS bits,
           to_base(o_orderkey, 36) AS b36
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def fn_base_conv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radix conversion (``conv``): hex / binary / base-36 renderings of
    integer keys — shard names, compact ids, bitmask debugging. Pure
    codegen'd projection; DuckDB's to_base mirrors Spark's conv for
    non-negative inputs (both emit uppercase digits)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return o.select(
        "o_orderkey",
        F.conv(F.col("o_orderkey").cast("string"), 10, 16).alias("hex16"),
        F.conv(F.col("o_orderkey").cast("string"), 10, 2).alias("bits"),
        F.conv(F.col("o_orderkey").cast("string"), 10, 36).alias("b36"),
    )


@query(
    "fn_map_hof",
    oracle="""
    WITH counts AS (
      -- event_type IS NOT NULL (Family N5 lockstep): a NULL cannot be a
      -- map key — Spark raises NULL_MAP_KEY by spec, so the gate is the
      -- documented semantics, not a workaround
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
      FROM events WHERE event_type IS NOT NULL
      GROUP BY user_id, event_type
    ), kept AS (
      SELECT user_id, event_type, c * 10 AS c10
      FROM counts WHERE c * 10 >= 100
    )
    SELECT user_id,
           string_agg(event_type || ':' || c10, ',' ORDER BY event_type)
             AS hot_types
    FROM kept GROUP BY user_id
    """,
)
def fn_map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions: per-user (event_type → count) maps built
    with ``map_from_entries``, rescaled with ``transform_values``, pruned
    with ``map_filter``, and rendered canonically (sorted entries joined
    to a string — map cells themselves hash dialect-divergently, so the
    string render is the comparable form). The map NEVER leaves the JVM:
    all four HOFs run inside codegen. The oracle rebuilds the same render
    relationally — proving the map pipeline equals the flat pipeline.

    NULL event types (Family N5, lockstep): filtered on both engines — a
    NULL cannot be a map key (Spark's NULL_MAP_KEY raise is the engine
    spec), so the gate states the semantics explicitly."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    entries = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "c")))
        ).alias("m")
    )
    hof = entries.select(
        "user_id",
        F.map_filter(
            F.transform_values("m", lambda k, v: v * 10),
            lambda k, v: v >= 100,
        ).alias("m"),
    )
    rendered = hof.select(
        "user_id",
        F.array_join(
            F.transform(
                F.sort_array(F.map_entries("m")),
                lambda e: F.concat_ws(":", e["key"], e["value"]),
            ),
            ",",
        ).alias("hot_types"),
    )
    return rendered.filter(F.col("hot_types") != "")


@query(
    "fn_array_hof",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE doc_id % 20 = 0
    )
    SELECT doc_id,
           CAST(len(list_filter(w, t -> len(t) > 4)) AS BIGINT) AS n_long,
           CAST(list_sum(list_transform(w, t -> len(t))) AS BIGINT)
             AS total_chars,
           len(list_filter(w, t -> t = 'spark')) > 0 AS has_spark,
           CAST(len(w) AS BIGINT) = CAST(len(list_filter(w, t -> len(t) > 0))
             AS BIGINT) AS all_nonempty
    FROM toks
    """,
)
def fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions as the explicit API surface:
    ``filter`` / ``transform`` + ``aggregate`` / ``exists`` / ``forall``
    over the token array — the no-UDF idiom this engine uses everywhere
    internally (shingling, LSH projections), demonstrated standalone.
    Everything is one codegen'd projection at scan throughput."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    w = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(F.filter(w, lambda t: F.length(t) > 4)).cast("long").alias("n_long"),
        F.aggregate(
            F.transform(w, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("total_chars"),
        F.exists(w, lambda t: t == "spark").alias("has_spark"),
        F.forall(w, lambda t: F.length(t) > 0).alias("all_nonempty"),
    )


@query(
    "fn_collation",
    oracle="""
    WITH tok AS (
      SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents
    ), t AS (SELECT lang, w FROM tok WHERE length(w) > 0)
    SELECT lang,
           CAST(count(DISTINCT w) AS BIGINT) AS n_binary_distinct,
           CAST(count(DISTINCT lower(w)) AS BIGINT) AS n_ci_distinct,
           CAST(count(*) FILTER (WHERE lower(w) = 'the') AS BIGINT)
             AS n_the_ci
    FROM t GROUP BY lang
    """,
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware string semantics (Spark 4): ``COLLATE UTF8_LCASE``
    makes equality, DISTINCT, and grouping case-insensitive at the TYPE
    level — the engine compares under the collation instead of callers
    scattering lower() into every predicate. The oracle states the same
    semantics explicitly via lower(), which is exactly the rewrite
    collations subsume. Distinct-vocabulary counts per language under
    binary vs case-insensitive collation, plus a collated equality filter.

    Scale: collation comparisons stay inside codegen (no UDF); a collated
    groupBy shuffles the collation key exactly like any other — no extra
    pass vs the manual lower() idiom it replaces."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.length("w") > 0)
    ci = F.collate(F.col("w"), "UTF8_LCASE")
    return t.groupBy("lang").agg(
        F.countDistinct("w").alias("n_binary_distinct"),
        F.countDistinct(ci).alias("n_ci_distinct"),
        F.count(F.when(ci == F.lit("the"), 1)).alias("n_the_ci"),
    )


@query(
    "fn_xml",
    oracle="""
    WITH x AS (
      SELECT '<o><k>' || CAST(o_orderkey AS VARCHAR) || '</k><s>'
             || o_orderstatus || '</s><c>'
             || CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)
             || '</c></o>' AS xml
      FROM orders WHERE o_orderkey % 50 = 0
    )
    SELECT CAST(regexp_extract(xml, '<k>([0-9]+)</k>', 1) AS BIGINT)
             AS orderkey,
           regexp_extract(xml, '<s>(.*?)</s>', 1) AS status,
           CAST(regexp_extract(xml, '<c>([0-9]+)</c>', 1) AS BIGINT)
             AS cents
    FROM x
    """,
)
def fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion (Spark 4 ``from_xml``): order rows serialized to XML
    and parsed back through a typed schema — the log/feed format the
    pre-JSON world still emits at volume. The oracle states the same
    extraction with regexes (what XML parsing subsumes); Spark gets the
    real parser with a schema, which also handles nesting/escaping the
    regex version cannot.

    Scale: from_xml is a per-row JVM expression inside codegen — scans at
    projection speed, no UDF."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    xml = F.concat(
        F.lit("<o><k>"),
        F.col("o_orderkey").cast("string"),
        F.lit("</k><s>"),
        F.col("o_orderstatus"),
        F.lit("</s><c>"),
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
        F.lit("</c></o>"),
    )
    parsed = o.select(
        F.from_xml(xml, "k BIGINT, s STRING, c BIGINT").alias("p")
    )
    return parsed.select(
        F.col("p.k").alias("orderkey"),
        F.col("p.s").alias("status"),
        F.col("p.c").alias("cents"),
    )


@query(
    "fn_interval_arith",
    oracle="""
    SELECT e.event_id,
           strftime(e.ts + INTERVAL 90 MINUTE, '%Y-%m-%d %H:%M:%S')
             AS plus_90m,
           strftime(e.ts - INTERVAL 36 HOUR, '%Y-%m-%d %H:%M:%S')
             AS minus_36h,
           strftime(e.ts + INTERVAL 2 DAY + INTERVAL 3 HOUR
                    + INTERVAL 45 SECOND, '%Y-%m-%d %H:%M:%S')
             AS plus_mixed,
           CAST(date_diff('minute', e.ts,
                          e.ts + INTERVAL 90 MINUTE) AS BIGINT)
             AS diff_minutes,
           CAST(epoch(e.ts + INTERVAL 1 DAY) - epoch(e.ts) AS BIGINT)
             AS day_in_seconds
    FROM events e WHERE e.event_id % 100 = 0
    """,
)
def fn_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-time INTERVAL arithmetic: make_dt_interval composition,
    interval add/subtract on timestamps, timestamp differencing at minute
    grain, and the seconds-in-a-day identity — the family every
    windowing/SLA/retention computation leans on. Timestamps are compared
    as formatted strings; all under the UTC session, so both engines walk
    the same calendar.

    Scale: pure per-row projections, codegen'd, no shuffle."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 100 == 0)
    fmt = "yyyy-MM-dd HH:mm:ss"
    plus90 = F.col("ts") + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(90))
    return ev.select(
        "event_id",
        F.date_format(plus90, fmt).alias("plus_90m"),
        F.date_format(
            F.col("ts") - F.make_dt_interval(F.lit(0), F.lit(36)), fmt
        ).alias("minus_36h"),
        F.date_format(
            F.col("ts")
            + F.make_dt_interval(F.lit(2), F.lit(3), F.lit(0), F.lit(45)),
            fmt,
        ).alias("plus_mixed"),
        ((F.unix_timestamp(plus90) - F.unix_timestamp("ts")) / 60)
        .cast("long")
        .alias("diff_minutes"),
        (
            F.unix_timestamp(
                F.col("ts") + F.make_dt_interval(F.lit(1))
            )
            - F.unix_timestamp("ts")
        )
        .cast("long")
        .alias("day_in_seconds"),
    )


@query(
    "fn_string_extras",
    oracle="""
    SELECT doc_id,
           -- DuckDB's split_part maps NULL text to '' where Spark's
           -- yields NULL: pin NULL-in -> NULL-out (Family N5 lockstep)
           CASE WHEN text IS NULL THEN NULL
                ELSE split_part(text, ' ', 1) END AS first_tok,
           CASE WHEN text IS NULL THEN NULL
                ELSE split_part(text, ' ', 3) END AS third_tok,
           translate(lang, 'aeiou', 'AEIOU') AS lang_tr,
           reverse(source) AS source_rev,
           left(source, 3) AS source_left3,
           right(source, 2) AS source_right2,
           repeat(lang, 2) AS lang_x2
    FROM documents
    """,
)
def fn_string_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The second tier of the string surface (split_part / translate /
    reverse / left / right / repeat) — the token-surgery builtins ETL
    actually leans on beyond fn_string's basics. All JVM-codegen scalar
    expressions; one narrow projection, zero shuffles.

    Edge-semantic note: split_part past the last field returns '' in BOTH
    engines (Spark split_part follows the PostgreSQL contract DuckDB also
    implements), so short texts stay hash-identical."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr("split_part(text, ' ', 1)").alias("first_tok"),
        F.expr("split_part(text, ' ', 3)").alias("third_tok"),
        F.translate("lang", "aeiou", "AEIOU").alias("lang_tr"),
        F.reverse("source").alias("source_rev"),
        F.expr("left(source, 3)").alias("source_left3"),
        F.expr("right(source, 2)").alias("source_right2"),
        F.repeat("lang", 2).alias("lang_x2"),
    )
