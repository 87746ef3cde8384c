"""Spark-side prototypes for the 6 round-10 thaw candidates (tranche 3).

ROUND-10 STATUS: ALL 6 REGISTERED (one commit each under the thaw
rule; window slots 40-45). The registered copies in the extension
modules are the source of truth; these prototypes are retained as the
validation record. Same harness as tests/thaw_protos_r{8,9}.py:
house-style implementations compared against the tranche-3 oracles
(tests/thaw_oracles_r10.py) under a vanilla session. Run:
``python tests/thaw_protos_r10.py [key ...]`` (not pytest-collected).
Status at round-7 end: 6/6 PASS at sf0.001, sf0.01, and sf0.1.
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


def _mutual_edges(spark, sf_dir):
    emb = fan_out(load(spark, sf_dir, "embeddings")).filter(F.col("vec_id") < 100)
    a = emb.select(F.col("vec_id").alias("u"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("v"), F.col("embedding").alias("eb"))
    sim = a.join(b, F.col("u") != F.col("v")).select(
        "u", "v", _cosine(F.col("ea"), F.col("eb")).alias("sim")
    )
    w = Window.partitionBy("u").orderBy(F.col("sim").desc(), "v")
    topk = (
        sim.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("u", "v")
    )
    t2 = topk.select(F.col("u").alias("v2"), F.col("v").alias("u2"))
    mutual = (
        topk.join(t2, (F.col("u") == F.col("u2")) & (F.col("v") == F.col("v2")))
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
    )
    return mutual.unionByName(
        mutual.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )


def _labeled_edges(spark, sf_dir):
    edges = _mutual_edges(spark, sf_dir)
    lab = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 100)
        .select("vec_id", "label")
    )
    return (
        edges.join(
            F.broadcast(lab.select(F.col("vec_id").alias("u"), F.col("label").alias("cu"))),
            "u",
        )
        .join(
            F.broadcast(lab.select(F.col("vec_id").alias("v"), F.col("label").alias("cv"))),
            "v",
        )
        .localCheckpoint(eager=False)
    )


# 1 ------------------------------------------------------------------------
@proto("ext_graph_modularity")
def ext_graph_modularity(spark, sf_dir):
    el = _labeled_edges(spark, sf_dir)
    m2 = el.agg(F.count(F.lit(1)).cast("long").alias("m2"))
    within = (
        el.filter(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("e_in"))
    )
    degs = el.groupBy(F.col("cu").alias("community")).agg(
        F.count(F.lit(1)).cast("long").alias("deg_sum")
    )
    nodes = (
        el.select(F.col("u").alias("vec_id"), F.col("cu").alias("community"))
        .distinct()
        .groupBy("community")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    )
    return (
        degs.join(F.broadcast(within), "community", "left")
        .join(F.broadcast(nodes), "community")
        .join(F.broadcast(m2))
        .select(
            "community",
            "n_nodes",
            F.coalesce("e_in", F.lit(0)).alias("e_in_directed"),
            "deg_sum",
            F.round(
                1000000.0
                * (F.coalesce("e_in", F.lit(0)) * F.col("m2")
                   - F.col("deg_sum") * F.col("deg_sum"))
                / (F.col("m2") * F.col("m2"))
            )
            .cast("long")
            .alias("contribution6"),
        )
    )


# 2 ------------------------------------------------------------------------
@proto("ext_conductance_communities")
def ext_conductance_communities(spark, sf_dir):
    el = _labeled_edges(spark, sf_dir)
    m2 = el.agg(F.count(F.lit(1)).cast("long").alias("m2"))
    agg = el.groupBy(F.col("cu").alias("community")).agg(
        F.sum((F.col("cu") != F.col("cv")).cast("long")).alias("cut"),
        F.count(F.lit(1)).cast("long").alias("vol"),
    )
    return (
        agg.join(F.broadcast(m2))
        .filter(F.least("vol", F.col("m2") - F.col("vol")) > 0)
        .select(
            "community",
            "cut",
            "vol",
            F.round(
                1000000.0 * F.col("cut")
                / F.least("vol", F.col("m2") - F.col("vol"))
            )
            .cast("long")
            .alias("conductance6"),
        )
    )


# 3 ------------------------------------------------------------------------
def _daily_milli(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.sum(F.round(F.col("value") * 1000).cast("long")).alias("y")
    )


@proto("ext_matrix_profile_daily")
def ext_matrix_profile_daily(spark, sf_dir):
    from spark_sql_dsv2_extension_spark.operators.quantiles import (
        distributed_row_number,
    )

    daily = _daily_milli(spark, sf_dir)
    idx = distributed_row_number(daily.select("d", "y"), ["d"], rn="i").select(
        "i", "y"
    ).localCheckpoint(eager=False)
    ns = idx.agg((F.max("i") - 6).cast("long").alias("ns"))
    subs = idx.join(F.broadcast(ns)).filter(F.col("i") <= F.col("ns")).select(
        F.col("i").alias("si")
    )
    pairs = subs.join(
        F.broadcast(subs.select(F.col("si").alias("sj"))),
        F.abs(F.col("si") - F.col("sj")) >= 4,
    )
    expanded = pairs.select(
        "si", "sj", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("t")
    )
    d2 = (
        expanded.join(
            F.broadcast(idx.select(F.col("i").alias("ia"), F.col("y").alias("ya"))),
            F.col("ia") == F.col("si") + F.col("t"),
        )
        .join(
            F.broadcast(idx.select(F.col("i").alias("ib"), F.col("y").alias("yb"))),
            F.col("ib") == F.col("sj") + F.col("t"),
        )
        .groupBy("si", "sj")
        .agg(
            F.sum((F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb")))
            .cast("long")
            .alias("d2")
        )
    )
    w = Window.partitionBy("si").orderBy("d2", "sj")
    return (
        d2.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("si").alias("subseq"),
            F.col("d2").alias("mp_d2"),
            F.col("sj").alias("nn_subseq"),
        )
    )


# 4 ------------------------------------------------------------------------
@proto("ext_dtw_bounded")
def ext_dtw_bounded(spark, sf_dir):
    daily = _daily_milli(spark, sf_dir)
    wk = daily.select(
        "d",
        "y",
        (F.weekday("d") + 1).cast("long").alias("dow"),
        F.date_trunc("week", "d").alias("w"),
    )
    full_weeks = wk.groupBy("w").agg(F.count(F.lit(1)).alias("c")).filter(
        F.col("c") == 7
    )
    bounds = full_weeks.agg(
        F.min("w").alias("w0"), F.max("w").alias("w1"),
        F.count(F.lit(1)).cast("long").alias("n_full_weeks"),
    )
    # degenerate-series gate (r8 prep; mirrors the oracle's WHERE): with
    # fewer than 2 full ISO weeks there is no (first, last) profile pair —
    # the ungated pandas DP raised an IndexError on the missing "b" side
    # when exactly one full week existed. Both engines now emit ZERO rows.
    prof = wk.join(F.broadcast(bounds)).filter(
        (F.col("n_full_weeks") >= 2)
        & ((F.col("w") == F.col("w0")) | (F.col("w") == F.col("w1")))
    ).select(
        F.when(F.col("w") == F.col("w0"), F.lit("a")).otherwise(F.lit("b")).alias(
            "side"
        ),
        "dow",
        "y",
        "n_full_weeks",
    )

    # 7x7 integer DP on the two calendar-bounded profiles: one
    # applyInPandas group, same rationale as the Holt-Winters recurrence.
    import pandas as pd

    def dtw(pdf):
        a = pdf[pdf.side == "a"].sort_values("dow")["y"].astype(int).tolist()
        b = pdf[pdf.side == "b"].sort_values("dow")["y"].astype(int).tolist()
        n = len(a)
        INF = float("inf")
        D = [[0] * n for _ in range(n)]
        for i in range(n):
            for j in range(n):
                c = (a[i] - b[j]) ** 2
                if i == 0 and j == 0:
                    D[i][j] = c
                elif i == 0:
                    D[i][j] = c + D[i][j - 1]
                elif j == 0:
                    D[i][j] = c + D[i - 1][j]
                else:
                    D[i][j] = c + min(D[i - 1][j], D[i][j - 1], D[i - 1][j - 1])
        euclid = sum((x - y) ** 2 for x, y in zip(a, b))
        return pd.DataFrame(
            {
                "g": [1],
                "n_full_weeks": [int(pdf["n_full_weeks"].iloc[0])],
                "dtw_d2": [D[n - 1][n - 1]],
                "euclid_d2": [euclid],
            }
        )

    return (
        prof.groupBy(F.lit(1).alias("g"))
        .applyInPandas(dtw, "g int, n_full_weeks long, dtw_d2 long, euclid_d2 long")
        .select("n_full_weeks", "dtw_d2", "euclid_d2")
    )


# 5 ------------------------------------------------------------------------
@proto("ext_embedding_centroid_drift")
def ext_embedding_centroid_drift(spark, sf_dir):
    emb = fan_out(load(spark, sf_dir, "embeddings")).filter(F.col("label") < 5)
    dims = emb.select(
        "label", F.posexplode("embedding").alias("dim0", "x")
    ).select(
        "label",
        (F.col("dim0") + 1).alias("dim"),
        F.round(F.col("x").cast("double") * 1000000).cast("long").alias("x6"),
    )
    cent = dims.groupBy("label", "dim").agg(
        F.sum("x6").cast("long").alias("s6"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    a = cent.select(
        F.col("label").alias("l1"), "dim",
        F.col("s6").alias("sa"), F.col("n").alias("na"),
    )
    b = cent.select(
        F.col("label").alias("l2"), F.col("dim").alias("dimb"),
        F.col("s6").alias("sb"), F.col("n").alias("nb"),
    )
    pairs = a.join(
        b, (F.col("dim") == F.col("dimb")) & (F.col("l1") < F.col("l2"))
    ).select(
        "l1",
        "l2",
        (1.0 * F.col("sa") / F.col("na") - 1.0 * F.col("sb") / F.col("nb")).alias(
            "diff"
        ),
    )
    return pairs.groupBy("l1", "l2").agg(
        F.round(F.sqrt(F.sum(F.col("diff") * F.col("diff"))))
        .cast("long")
        .alias("centroid_dist6")
    )


# 6 ------------------------------------------------------------------------
@proto("ext_t_closeness_audit")
def ext_t_closeness_audit(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    s = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 2000).cast("long").alias("b"),
    )
    buckets = s.select("b").distinct()
    m = buckets.agg(F.count(F.lit(1)).cast("long").alias("m"))
    groups = s.select("c_nationkey", "c_mktsegment").distinct()
    cnt = s.groupBy("c_nationkey", "c_mktsegment", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    gb = (
        groups.join(F.broadcast(buckets))
        .join(cnt, ["c_nationkey", "c_mktsegment", "b"], "left")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "b",
            F.coalesce("c", F.lit(0)).alias("c"),
        )
    )
    wcum = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("c_nationkey", "c_mktsegment")
    gcum = gb.select(
        "c_nationkey",
        "c_mktsegment",
        "b",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    # global cumulative over the BOUNDED bucket domain: triangular
    # broadcast self-join instead of an unpartitioned window
    bc = s.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("cb"))
    allcum = (
        bc.join(
            F.broadcast(bc.select(F.col("b").alias("b2"), F.col("cb").alias("cb2"))),
            F.col("b2") <= F.col("b"),
        )
        .groupBy("b")
        .agg(F.sum("cb2").cast("long").alias("cum_all"))
    )
    n_all = s.agg(F.count(F.lit(1)).cast("long").alias("n_all"))
    emd = (
        gcum.join(F.broadcast(allcum), "b")
        .join(F.broadcast(n_all))
        .join(F.broadcast(m))
        .groupBy("c_nationkey", "c_mktsegment", "m")
        .agg(
            F.max("n").cast("long").alias("group_n"),
            F.sum(
                F.abs(
                    1.0 * F.col("cum") / F.col("n")
                    - 1.0 * F.col("cum_all") / F.col("n_all")
                )
            ).alias("sabs"),
        )
    )
    emd6 = F.round(1000000.0 / (F.col("m") - 1) * F.col("sabs")).cast("long")
    # degenerate gate (r8 audit): one distinct sensitive bucket (m = 1)
    # makes the EMD normalizer 1/(m-1) a 0/0 — ANSI Spark raises, DuckDB
    # renders NaN. With a single bucket every group trivially matches the
    # global distribution; both engines now emit ZERO rows.
    return emd.filter(F.col("m") >= 2).select(
        "c_nationkey",
        "c_mktsegment",
        "group_n",
        emd6.alias("emd6"),
        (emd6 > 200000).alias("at_risk"),
    )


def main():
    import duckdb

    from tests import thaw_oracles_r10 as oracles_mod

    from tests.parity import compare
    from spark_sql_dsv2_extension_spark.tables import TABLE_NAMES, table_path

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("thaw3-protos")
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
