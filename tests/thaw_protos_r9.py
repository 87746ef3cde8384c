"""Spark-side prototypes for the 12 round-9 thaw candidates (tranche 2).

ROUND-9 STATUS: 5 of the 12 were registered (one commit each, per the
thaw rule, capped at the window's 5 spare slots by the r8 verdict ask
#3) — ext_weighted_median, ext_dbscan_core_points,
ext_l_diversity_audit, ext_energy_distance, ext_bloom_size_planner.
The registered copies in the extension modules are now the source of
truth; the prototypes here are retained as the validation record.

ROUND-10 STATUS: 6 of the 7 deferred candidates were registered (only
``ext_hits_bounded`` registered in round 11 — see
tests/thaw_oracles_r9.py's header; the tranche is fully on-registry).

Run: ``python tests/thaw_protos_r9.py [key ...]`` (not
pytest-collected); house-style implementations compared against the
tranche-2 oracles (tests/thaw_oracles_r9.py) under a vanilla session.
Status at round-7 end: 12/12 PASS at sf0.001, sf0.01, and sf0.1.
"""
from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_sql_dsv2_extension_spark.tables import load, fan_out

SF = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")

PROTOS = {}


def proto(name):
    def deco(fn):
        PROTOS[name] = fn
        return fn
    return deco


def _dot(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _cosine(ea, eb):
    return _dot(ea, eb) / (F.sqrt(_dot(ea, ea)) * F.sqrt(_dot(eb, eb)))


# 1 ------------------------------------------------------------------------
@proto("stream_stream_full_outer")
def stream_stream_full_outer(spark, sf_dir):
    """Stream-stream FULL OUTER join: stream_stream_left_outer's sentinel
    idiom with both sides' unmatched rows watermark-flushed."""
    import shutil
    import tempfile

    from spark_sql_dsv2_extension_spark.streaming.windows import (
        SENTINEL_USER,
        _normalize_ts,
        _raw_schema,
        _run_to_table,
        _sentinel_ts,
    )
    from spark_sql_dsv2_extension_spark.tables import table_path

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src_dir = tempfile.mkdtemp(prefix="engine_stream_")
    shutil.copy(table_path(sf_dir, "events"), os.path.join(src_dir, "part-0.parquet"))
    for i, off in enumerate((0, 10**15)):
        spark.createDataFrame(
            [
                (-1 - 10 * i, _sentinel_ts(sf_dir, off), SENTINEL_USER, "click", 0.0, "{}"),
                (-2 - 10 * i, _sentinel_ts(sf_dir, off), SENTINEL_USER, "purchase", 0.0, "{}"),
            ],
            _raw_schema(sf_dir),
        ).coalesce(1).write.mode("append").parquet(src_dir)
        time.sleep(1.2)
    raw = _normalize_ts(
        spark.readStream.schema(_raw_schema(sf_dir))
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir),
        sf_dir,
    )
    clicks = (
        raw.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "10 minutes")
    )
    purchases = (
        raw.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "10 minutes")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "c_user = p_user AND p_ts >= click_ts "
            "AND p_ts <= click_ts + INTERVAL 120 MINUTES"
        ),
        "fullOuter",
    )
    out = _run_to_table(joined, "append")
    return (
        out.select(
            F.coalesce("c_user", "p_user").alias("user_id"),
            F.unix_timestamp("click_ts").alias("click_epoch"),
            F.unix_timestamp("p_ts").alias("purchase_epoch"),
        )
        .filter(F.col("user_id") != SENTINEL_USER)
    )


# 2 ------------------------------------------------------------------------
@proto("ext_dbscan_core_points")
def ext_dbscan_core_points(spark, sf_dir):
    emb = fan_out(load(spark, sf_dir, "embeddings")).filter(F.col("vec_id") < 100)
    a = emb.select(F.col("vec_id").alias("u"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("v"), F.col("embedding").alias("eb"))
    sims = a.join(b, F.col("u") != F.col("v")).select(
        "u", _cosine(F.col("ea"), F.col("eb")).alias("sim")
    )
    return sims.groupBy(F.col("u").alias("vec_id")).agg(
        F.sum((F.col("sim") >= 0.25).cast("long")).alias("n_neighbors"),
        (F.sum((F.col("sim") >= 0.25).cast("long")) >= 3).alias("is_core"),
    )


# 3/4 shared: directed top-5 kNN edge list --------------------------------
def _topk_edges(spark, sf_dir):
    emb = fan_out(load(spark, sf_dir, "embeddings")).filter(F.col("vec_id") < 100)
    a = emb.select(F.col("vec_id").alias("u"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("v"), F.col("embedding").alias("eb"))
    sim = a.join(b, F.col("u") != F.col("v")).select(
        "u", "v", _cosine(F.col("ea"), F.col("eb")).alias("sim")
    )
    w = Window.partitionBy("u").orderBy(F.col("sim").desc(), "v")
    return (
        sim.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("u", "v")
    )


@proto("ext_degree_assortativity")
def ext_degree_assortativity(spark, sf_dir):
    topk = _topk_edges(spark, sf_dir)
    t2 = topk.select(F.col("u").alias("v2"), F.col("v").alias("u2"))
    mutual = (
        topk.join(t2, (F.col("u") == F.col("u2")) & (F.col("v") == F.col("v2")))
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
    )
    edges = mutual.unionByName(
        mutual.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = edges.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    de = (
        edges.join(F.broadcast(deg.select(F.col("node").alias("u"), F.col("d").alias("x"))), "u")
        .join(F.broadcast(deg.select(F.col("node").alias("v"), F.col("d").alias("y"))), "v")
        .select("x", "y")
    )
    s = de.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    # degenerate gate (r8 audit): a regular graph (all degrees equal —
    # e.g. identical embeddings) has zero degree variance; Pearson r is
    # 0/0, which ANSI Spark raises on and DuckDB renders NaN. Both
    # engines now emit ZERO rows instead.
    return s.filter(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
        & (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy") > 0)
    ).select(
        F.col("n").alias("n_edges"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("assortativity6"),
    )


@proto("ext_hits_bounded")
def ext_hits_bounded(spark, sf_dir):
    topk = _topk_edges(spark, sf_dir).localCheckpoint(eager=False)
    a1 = topk.groupBy(F.col("v").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("a")
    )
    h1 = (
        topk.join(F.broadcast(a1.select(F.col("node").alias("v"), "a")), "v", "left")
        .groupBy(F.col("u").alias("node"))
        .agg(F.sum(F.coalesce("a", F.lit(0))).cast("long").alias("h"))
    )
    a2 = (
        topk.join(F.broadcast(h1.select(F.col("node").alias("u"), "h")), "u", "left")
        .groupBy(F.col("v").alias("node"))
        .agg(F.sum(F.coalesce("h", F.lit(0))).cast("long").alias("a"))
    )
    h2 = (
        topk.join(F.broadcast(a2.select(F.col("node").alias("v"), "a")), "v", "left")
        .groupBy(F.col("u").alias("node"))
        .agg(F.sum(F.coalesce("a", F.lit(0))).cast("long").alias("h"))
    )
    nodes = (
        topk.select(F.col("u").alias("node"))
        .unionByName(topk.select(F.col("v").alias("node")))
        .distinct()
    )
    return (
        nodes.join(F.broadcast(h2), "node", "left")
        .join(F.broadcast(a2), "node", "left")
        .select(
            "node",
            F.coalesce("h", F.lit(0)).alias("hub2"),
            F.coalesce("a", F.lit(0)).alias("auth2"),
        )
        .orderBy(F.col("hub2").desc(), "node")
        .limit(20)
    )


# 5 ------------------------------------------------------------------------
@proto("ext_l_diversity_audit")
def ext_l_diversity_audit(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    sens = F.floor(F.col("c_acctbal") / 2000).cast("long")
    return cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("group_n"),
        F.countDistinct(sens).cast("long").alias("l_distinct"),
        (F.countDistinct(sens) < 3).alias("at_risk"),
    )


# 6 ------------------------------------------------------------------------
@proto("ext_weighted_median")
def ext_weighted_median(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    pw = li.groupBy("l_returnflag", F.col("l_extendedprice").alias("p")).agg(
        F.sum(F.round("l_quantity").cast("long")).cast("long").alias("wgt")
    )
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("l_returnflag")
    cum = pw.select(
        "l_returnflag",
        "p",
        F.sum("wgt").over(wcum).alias("cw"),
        F.sum("wgt").over(wall).alias("tw"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(F.min("p").alias("weighted_median"))
    )


# 7 ------------------------------------------------------------------------
@proto("ext_energy_distance")
def ext_energy_distance(spark, sf_dir):
    emb = fan_out(load(spark, sf_dir, "embeddings"))
    x = emb.filter(F.col("label") == 0).select(
        F.col("vec_id").alias("xi"), F.col("embedding").alias("ex")
    )
    y = emb.filter(F.col("label") == 1).select(
        F.col("vec_id").alias("yi"), F.col("embedding").alias("ey")
    )

    def d6(ea, eb):
        diff2 = F.aggregate(
            F.zip_with(
                ea, eb, lambda p, q: (p.cast("double") - q.cast("double"))
                * (p.cast("double") - q.cast("double"))
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.round(1000000 * F.sqrt(diff2)).cast("long")

    dxy = x.join(y).select(d6(F.col("ex"), F.col("ey")).alias("d6"))
    x2 = x.select(F.col("xi").alias("xj"), F.col("ex").alias("ex2"))
    dxx = x.join(x2, F.col("xi") < F.col("xj")).select(
        d6(F.col("ex"), F.col("ex2")).alias("d6")
    )
    y2 = y.select(F.col("yi").alias("yj"), F.col("ey").alias("ey2"))
    dyy = y.join(y2, F.col("yi") < F.col("yj")).select(
        d6(F.col("ey"), F.col("ey2")).alias("d6")
    )

    def s(df, sn, nn):
        return df.agg(
            F.sum("d6").cast("long").alias(sn),
            F.count(F.lit(1)).cast("long").alias(nn),
        )

    joined = (
        s(dxy, "sxy", "nxy")
        .join(F.broadcast(s(dxx, "sxx", "nxx")))
        .join(F.broadcast(s(dyy, "syy", "nyy")))
    )
    return joined.select(
        "nxy",
        "nxx",
        "nyy",
        F.round(
            2.0 * F.col("sxy") / F.col("nxy")
            - 1.0 * F.col("sxx") / F.col("nxx")
            - 1.0 * F.col("syy") / F.col("nyy")
        )
        .cast("long")
        .alias("energy6"),
    )


# 8 ------------------------------------------------------------------------
@proto("ext_holt_winters_seasonal")
def ext_holt_winters_seasonal(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.sum(F.round(F.col("value") * 1000000).cast("long")).alias("y")
    )
    bounds = daily.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    cal = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    series = cal.join(daily, "d", "left").select(
        "d", F.coalesce("y", F.lit(0)).cast("long").alias("y")
    )

    import pandas as pd

    def hw(pdf):
        pdf = pdf.sort_values("d").reset_index(drop=True)
        lvl, trend, seas_used, fc = [], [], [], []
        ring = [0] * 7  # ring[0] applies to the CURRENT step
        for k, yv in enumerate(pdf["y"].astype(int)):
            yv = int(yv)
            if k == 0:
                l, b = yv, 0
                su = 0
            else:
                lp, bp = lvl[-1], trend[-1]
                su = ring[0]
                l = (3 * (yv - su) + 7 * (lp + bp)) // 10
                b = (1 * (l - lp) + 9 * bp) // 10
                s_new = (2 * (yv - l) + 8 * su) // 10
                ring = ring[1:] + [s_new]
            lvl.append(l)
            trend.append(b)
            seas_used.append(su)
            fc.append(l + b + ring[0])
        pdf["g"] = 1
        pdf["level_micro"] = pd.Series(lvl, dtype="int64")
        pdf["trend_micro"] = pd.Series(trend, dtype="int64")
        pdf["seasonal_micro"] = pd.Series(seas_used, dtype="int64")
        pdf["forecast_next_micro"] = pd.Series(fc, dtype="int64")
        return pdf

    out = series.groupBy(F.lit(1).alias("g")).applyInPandas(
        hw,
        "g int, d timestamp, y long, level_micro long, trend_micro long, "
        "seasonal_micro long, forecast_next_micro long",
    )
    return out.select(
        "d",
        F.col("y").alias("y_micro"),
        "level_micro",
        "trend_micro",
        "seasonal_micro",
        "forecast_next_micro",
    )


# 9 ------------------------------------------------------------------------
@proto("ext_mips_cosine_reduction")
def ext_mips_cosine_reduction(spark, sf_dir):
    emb = fan_out(load(spark, sf_dir, "embeddings"))
    norms = emb.select(
        "vec_id", "embedding", F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm")
    )
    mx = norms.agg(F.max("nrm").alias("mx"))
    a = norms.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    b = norms.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne")
    )
    ip = (
        a.join(b, F.col("query_id") != F.col("neighbor_id"))
        .join(F.broadcast(mx))
        .select(
            "query_id",
            "neighbor_id",
            _dot(F.col("qe"), F.col("ne")).alias("raw_ip"),
            (_dot(F.col("qe"), F.col("ne")) / (F.col("qn") * F.col("mx"))).alias(
                "aug_cos"
            ),
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(F.col("raw_ip").desc(), "neighbor_id")
    w2 = Window.partitionBy("query_id").orderBy(F.col("aug_cos").desc(), "neighbor_id")
    r1 = ip.withColumn("rk", F.row_number().over(w1)).filter(F.col("rk") <= 5)
    r2 = ip.withColumn("rk", F.row_number().over(w2)).filter(F.col("rk") <= 5)
    return (
        r1.select("query_id", "neighbor_id")
        .join(r2.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_agree"))
    )


# 10 -----------------------------------------------------------------------
@proto("ext_random_projection_jl")
def ext_random_projection_jl(spark, sf_dir):
    emb = fan_out(load(spark, sf_dir, "embeddings"))
    a = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("u"), F.col("embedding").alias("ea")
    )
    b = emb.select(F.col("vec_id").alias("v"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("v") == F.col("u") + 1).select(
        "u",
        "v",
        F.zip_with(
            "ea", "eb", lambda p, q: p.cast("double") - q.cast("double")
        ).alias("diff"),
    )
    orig = F.aggregate(
        F.transform(F.col("diff"), lambda d: d * d), F.lit(0.0), lambda acc, v: acc + v
    )
    # sign(i, j) = LCG parity on the flattened (i, j) index; the fold over
    # i runs in fixed array order on both engines
    pvec = F.transform(
        F.sequence(F.lit(1), F.lit(16)),
        lambda j: F.aggregate(
            F.zip_with(
                F.col("diff"),
                F.sequence(F.lit(1), F.lit(64)),
                lambda d, i: F.when(
                    (F.lit(1103515245) * ((i.cast("long") - 1) * 16 + j.cast("long"))
                     + 12345) % 2 == 0,
                    d,
                ).otherwise(-d),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    proj = pairs.select(
        "u",
        "v",
        orig.alias("orig_d2"),
        F.aggregate(
            F.transform(pvec, lambda p: p * p), F.lit(0.0), lambda acc, v: acc + v
        ).alias("proj_d2"),
    )
    # degenerate gate (r8 audit): an identical adjacent pair has
    # orig_d2 = 0 and no defined distortion ratio (ANSI Spark raises,
    # DuckDB renders NaN) — exclude zero-distance pairs on both engines.
    return proj.filter(F.col("orig_d2") > 0).select(
        "u",
        "v",
        F.round(1000000 * F.col("proj_d2") / (16 * F.col("orig_d2")))
        .cast("long")
        .alias("ratio6"),
        (F.col("proj_d2") / (16 * F.col("orig_d2"))).between(0.2, 3.0).alias(
            "within_jl"
        ),
    )


# 11 -----------------------------------------------------------------------
@proto("ext_sax_symbols")
def ext_sax_symbols(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.sum(F.round(F.col("value") * 1000).cast("long")).alias("y")
    )
    s = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("sxx"),
    )
    # degenerate gate (r8 audit): a constant series has zero variance and
    # no defined z-score (ANSI Spark raises on the 0/0, DuckDB renders
    # NaN) — both engines now emit ZERO rows for it.
    z = daily.join(F.broadcast(s)).filter(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0
    ).select(
        "d",
        "y",
        (
            (F.col("y") - 1.0 * F.col("sx") / F.col("n"))
            / F.sqrt(
                (1.0 * F.col("n") * F.col("sxx") - 1.0 * F.col("sx") * F.col("sx"))
                / (1.0 * F.col("n") * F.col("n"))
            )
        ).alias("zv"),
    )
    bp = 0.6744897501960817
    return z.select(
        "d",
        F.col("y").alias("y_milli"),
        F.round(1000000 * F.col("zv")).cast("long").alias("z6"),
        F.when(F.col("zv") < -bp, "a")
        .when(F.col("zv") < 0.0, "b")
        .when(F.col("zv") < bp, "c")
        .otherwise("d")
        .alias("sax_letter"),
    )


# 12 -----------------------------------------------------------------------
@proto("ext_bloom_size_planner")
def ext_bloom_size_planner(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    n = docs.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    fpp = spark.createDataFrame(
        [("p_1pct", 9585058), ("p_0_1pct", 14377588)], "fpp_label string, c_micro long"
    )
    m = n.join(F.broadcast(fpp)).select(
        "source",
        "n_docs",
        "fpp_label",
        F.expr("(n_docs * c_micro + 999999) div 1000000").alias("m_bits"),
    )
    return m.select(
        "source",
        "n_docs",
        "fpp_label",
        F.col("m_bits").cast("long"),
        F.expr(
            "CAST((2 * m_bits * 693147 + n_docs * 1000000)"
            " div (2 * n_docs * 1000000) AS BIGINT)"
        ).alias("k_hashes"),
    )


def main():
    import duckdb

    from tests import thaw_oracles_r9 as oracles_mod

    from tests.parity import compare
    from spark_sql_dsv2_extension_spark.tables import TABLE_NAMES, table_path

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("thaw2-protos")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{table_path(SF, name)}')"
        )

    keys = sys.argv[1:] or list(PROTOS)
    failed = []
    for i, key in enumerate(keys):
        try:
            t0 = time.monotonic()
            sdf = PROTOS[key](spark, SF).toPandas()
            dt = time.monotonic() - t0
            odf = con.sql(oracles_mod.ORACLES[key]).df()
            compare(sdf, odf, key)
            print(f"[{i+1}/{len(keys)}] PASS {key} spark_wall={dt:.2f}s", flush=True)
        except Exception:
            failed.append(key)
            print(f"[{i+1}/{len(keys)}] FAIL {key}", flush=True)
            traceback.print_exc()
    print(f"\n{len(keys) - len(failed)}/{len(keys)} pass; failed={failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
