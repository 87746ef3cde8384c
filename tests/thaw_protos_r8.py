"""Spark-side prototypes for the 12 round-8 thaw candidates (round-7 prep).

ROUND-8 STATUS: 10 of the 12 were registered (one commit each, per the
thaw rule) — the registered copies in the extension modules are now the
source of truth for those keys; the prototypes here are retained as the
validation record. The two DEFERRED candidates remain vetted here for a
later tranche: ``ext_bpe_train_k_rounds`` (REGISTERED round 11 in
extensions/text.py with empty-round EXISTS gates, validated across all
four audit fixture modes) and ``ext_graph_degeneracy_core`` (still
deferred — it needs the zero-norm-vector gate the round-12 X1 batch
introduces, so it registers alongside it).

Each ROADMAP_r8.md candidate gets a (spark, sf_dir) -> DataFrame
implementation in the house style (tables.load / fan_out, built-in
functions, partitioned windows only, broadcast small sides) and is
compared against its vetted DuckDB oracle (tests/thaw_oracles_r8.py)
under a VANILLA session — the same harness as tests/driver_sim.py.
Status at round-7 end: 12/12 PASS at sf0.01.

Run: ``python tests/thaw_protos_r8.py [key ...]`` (not pytest-collected).
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
@proto("ext_bpe_train_k_rounds")
def ext_bpe_train_k_rounds(spark, sf_dir):
    docs = fan_out(load(spark, sf_dir, "documents"))
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    out = None
    for r in (1, 2, 3):
        freq = freq.localCheckpoint(eager=False)
        pairs = freq.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("w") - 1),
                    lambda i: F.col("w").substr(i, F.lit(2)),
                )
            ).alias("pair"),
            "f",
        )
        winner = (
            pairs.groupBy("pair")
            .agg(F.sum("f").cast("long").alias("n"))
            .orderBy(F.col("n").desc(), "pair")
            .limit(1)
        )
        freq = freq.join(F.broadcast(winner)).select(
            F.replace(F.col("w"), F.col("pair"), F.lit(chr(r))).alias("w"),
            "f",
        )
        stats = freq.agg(
            F.sum(F.length("w") * F.col("f")).cast("long").alias("vocab_symbols")
        )
        row = (
            winner.select(
                F.lit(r).alias("round"),
                F.col("pair").alias("merged_pair"),
                F.col("n").alias("pair_count"),
            )
            .join(F.broadcast(stats))
        )
        out = row if out is None else out.unionByName(row)
    return out


# 2 ------------------------------------------------------------------------
@proto("ext_dedup_cascade_report")
def ext_dedup_cascade_report(spark, sf_dir):
    from spark_sql_dsv2_extension_spark.extensions.dedup import (
        ext_exact_dedup,
        ext_near_dedup_minhash,
    )

    docs = load(spark, sf_dir, "documents")
    s0 = docs.agg(F.count(F.lit(1)).cast("long").alias("n")).select(
        F.lit(0).alias("stage"), "n"
    )
    s1 = ext_exact_dedup(spark, sf_dir).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).select(F.lit(1).alias("stage"), "n")
    s2 = ext_near_dedup_minhash(spark, sf_dir).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).select(F.lit(2).alias("stage"), "n")
    return s0.unionByName(s1).unionByName(s2)


# 3 ------------------------------------------------------------------------
@proto("ext_paragraph_dedup")
def ext_paragraph_dedup(spark, sf_dir):
    docs = fan_out(load(spark, sf_dir, "documents"))
    ws = docs.select("doc_id", F.split("text", " ").alias("ws"))
    chunks = ws.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0), F.ceil(F.size("ws") / F.lit(16.0)).cast("long") - 1
            )
        ).alias("i"),
        "ws",
    ).select(
        "doc_id",
        F.array_join(
            F.slice(F.col("ws"), F.col("i") * 16 + 1, F.lit(16)), " "
        ).alias("chunk"),
    )
    return (
        chunks.groupBy(F.md5(F.encode("chunk", "utf-8")).alias("chunk_hash"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("keeper_doc"),
        )
        .filter(F.col("n_occurrences") > 1)
        .orderBy(F.col("n_occurrences").desc(), "chunk_hash")
        .limit(50)
    )


# 4 ------------------------------------------------------------------------
@proto("join_asof_tolerance")
def join_asof_tolerance(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    u = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "click", F.col("event_id")).alias("click_id"),
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
        F.when(F.col("event_type") == "click", F.lit(0)).otherwise(F.lit(1)).alias("tag"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = u.withColumn(
        "asof_click_id", F.last("click_id", ignorenulls=True).over(w)
    ).withColumn("asof_click_ts", F.last("click_ts", ignorenulls=True).over(w))
    tol_us = 3600 * 1000000
    return m.filter(F.col("tag") == 1).select(
        "event_id",
        F.when(
            F.col("asof_click_ts").isNotNull()
            & (
                F.unix_micros("ts") - F.unix_micros("asof_click_ts")
                <= F.lit(tol_us)
            ),
            F.col("asof_click_id"),
        ).alias("asof_click_id_tol"),
    )


# 5 ------------------------------------------------------------------------
@proto("join_interval_point_containment")
def join_interval_point_containment(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    ivals = ev.select(
        F.date_trunc("week", "ts").alias("w_start"),
        (F.date_trunc("week", "ts") + F.expr("INTERVAL 3 DAY")).alias("w_end"),
    ).distinct()
    # band on the calendar week: a 3-day interval never crosses its own
    # week boundary, so point week == interval w_start is the equi-key;
    # the exact BETWEEN predicate verifies.
    pts = ev.select(
        "user_id",
        "ts",
        F.round(F.col("value") * 1000000).cast("long").alias("v_micro"),
        F.date_trunc("week", "ts").alias("wk"),
    )
    joined = pts.join(
        F.broadcast(ivals), pts.wk == ivals.w_start
    ).filter((F.col("ts") >= F.col("w_start")) & (F.col("ts") <= F.col("w_end")))
    return joined.groupBy(F.col("w_start").alias("campaign_start")).agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum("v_micro").cast("long").alias("sum_value_micro"),
    )


# 6 ------------------------------------------------------------------------
@proto("agg_kll_quantile_invariant")
def agg_kll_quantile_invariant(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    approx = li.groupBy("l_returnflag").agg(
        F.percentile_approx(
            "l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), 10000
        ).alias("aps")
    )
    ap = approx.select(
        "l_returnflag",
        F.posexplode("aps").alias("idx", "ap"),
    ).select(
        "l_returnflag",
        (F.col("idx") * 25 + 25).cast("int").alias("q_pct"),
        "ap",
    )
    ranks = (
        li.join(F.broadcast(ap), "l_returnflag")
        .groupBy("l_returnflag", "q_pct", "ap")
        .agg(
            F.sum((F.col("l_extendedprice") < F.col("ap")).cast("long")).alias("n_lt"),
            F.sum((F.col("l_extendedprice") <= F.col("ap")).cast("long")).alias("n_le"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    eps = 0.02
    target = F.col("q_pct") / F.lit(100.0) * F.col("n")
    return ranks.select(
        "l_returnflag",
        "q_pct",
        (
            (F.col("n_lt") <= target + F.lit(eps) * F.col("n"))
            & (F.col("n_le") >= target - F.lit(eps) * F.col("n"))
        ).alias("within_tol"),
    )


# 7/8 shared edge list ------------------------------------------------------
def _mutual_edges(spark, sf_dir):
    from spark_sql_dsv2_extension_spark.extensions.similarity import (
        ext_mutual_knn_pairs,
    )

    mutual = ext_mutual_knn_pairs(spark, sf_dir).select("d1", "d2")
    return mutual.select(
        F.col("d1").alias("u"), F.col("d2").alias("v")
    ).unionByName(mutual.select(F.col("d2").alias("u"), F.col("d1").alias("v")))


@proto("ext_label_propagation_bounded")
def ext_label_propagation_bounded(spark, sf_dir):
    edges = _mutual_edges(spark, sf_dir).localCheckpoint(eager=False)
    labels = edges.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").cast("long").alias("lbl")
    )
    for _ in range(3):
        nbr = (
            edges.join(labels.select(F.col("node").alias("v"),
                                     F.col("lbl").alias("v_lbl")), "v")
            .groupBy("u")
            .agg(F.min("v_lbl").alias("nbr_min"))
        )
        labels = (
            labels.join(nbr, labels.node == nbr.u, "left")
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nbr_min"), F.col("lbl"))
                ).alias("lbl"),
            )
        )
    return labels.select("node", F.col("lbl").alias("label_r3"))


@proto("ext_graph_degeneracy_core")
def ext_graph_degeneracy_core(spark, sf_dir):
    e = _mutual_edges(spark, sf_dir).localCheckpoint(eager=False)
    for _ in range(3):
        alive = (
            e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= 2)
            .select("u")
        )
        e = (
            e.join(F.broadcast(alive), "u")
            .join(
                F.broadcast(alive.select(F.col("u").alias("v"))), "v"
            )
            .select("u", "v")
        )
    return (
        e.groupBy(F.col("u").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("core_deg"))
    )


# 9 ------------------------------------------------------------------------
def _daily_micro(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.sum(F.round(F.col("value") * 1000000).cast("long")).alias("y")
    )


@proto("ext_holt_winters_additive")
def ext_holt_winters_additive(spark, sf_dir):
    daily = _daily_micro(spark, sf_dir)
    bounds = daily.agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    cal = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    series = cal.join(daily, "d", "left").select(
        "d", F.coalesce("y", F.lit(0)).cast("long").alias("y")
    )

    # The smoothed series is a sequential recurrence over the CALENDAR-
    # bounded daily aggregate (<=366 rows/year regardless of data scale):
    # one applyInPandas group is the right plan — the heavy reduction
    # (events -> daily) already ran distributed.
    import pandas as pd

    def hw(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("d").reset_index(drop=True)
        lvl, trend = [], []
        for k, y in enumerate(pdf["y"].astype(int)):
            if k == 0:
                l, b = int(y), 0
            else:
                lp, bp = lvl[-1], trend[-1]
                l = (3 * int(y) + 7 * (lp + bp)) // 10
                b = (1 * (l - lp) + 9 * bp) // 10
            lvl.append(l)
            trend.append(b)
        pdf["g"] = 1
        pdf["level_micro"] = pd.Series(lvl, dtype="int64")
        pdf["trend_micro"] = pd.Series(trend, dtype="int64")
        return pdf

    out = series.groupBy(F.lit(1).alias("g")).applyInPandas(
        hw, "g int, d timestamp, y long, level_micro long, trend_micro long"
    )
    return out.select(
        "d",
        F.col("y").alias("y_micro"),
        "level_micro",
        "trend_micro",
        (F.col("level_micro") + F.col("trend_micro")).alias("forecast_next_micro"),
    )


# 10 -----------------------------------------------------------------------
@proto("ext_anomaly_mad_rolling")
def ext_anomaly_mad_rolling(spark, sf_dir):
    from spark_sql_dsv2_extension_spark.operators.quantiles import (
        distributed_row_number,
    )

    daily = _daily_micro(spark, sf_dir)
    idx = distributed_row_number(daily, ["d"], rn="i")
    # trailing-7 banded self-join: each full frame explodes to its 7
    # offsets and equi-joins on the frame-member index — no window node.
    a = idx.filter(F.col("i") >= 7).select(
        F.col("i").alias("ai"), F.col("d").alias("d"), F.col("y").alias("y")
    )
    frames = a.select(
        "ai", "d", "y", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off")
    ).withColumn("bi", F.col("ai") - F.col("off"))
    joined = frames.join(
        idx.select(F.col("i").alias("bi"), F.col("y").alias("yb")), "bi"
    )
    med = joined.groupBy("ai", "d", "y").agg(
        (2 * F.expr("percentile(yb, 0.5)")).cast("long").alias("med2"),
        F.collect_list("yb").alias("frame"),
    )
    mad = med.select(
        "ai",
        "d",
        "y",
        "med2",
        F.explode("frame").alias("yb"),
    ).groupBy("ai", "d", "y", "med2").agg(
        (2 * F.expr("percentile(abs(2 * yb - med2), 0.5)"))
        .cast("long")
        .alias("mad4"),
    )
    return mad.select(
        "d",
        F.col("y").alias("y_micro"),
        "med2",
        "mad4",
        (2 * F.abs(2 * F.col("y") - F.col("med2")) > 3 * F.col("mad4")).alias(
            "is_anomaly"
        ),
    )


# 11 -----------------------------------------------------------------------
@proto("ext_shard_skew_rebalance")
def ext_shard_skew_rebalance(spark, sf_dir):
    from spark_sql_dsv2_extension_spark.extensions.multimodal import (
        ext_multimodal_shard_pack,
    )

    pack = ext_multimodal_shard_pack(spark, sf_dir).select(
        "shard", "doc_id", "n_bytes"
    )
    tot = pack.groupBy("shard").agg(F.sum("n_bytes").alias("tot"))
    target = tot.agg(
        F.floor(F.avg("tot")).cast("long").alias("tgt")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = pack.withColumn("cum_in_shard", F.sum("n_bytes").over(w))
    return (
        within.join(F.broadcast(target))
        .filter(F.col("cum_in_shard") > F.expr("(tgt * 11) div 10"))
        .select("shard", "doc_id", "n_bytes")
    )


# 12 -----------------------------------------------------------------------
@proto("ext_ann_ivf_nprobe_curve")
def ext_ann_ivf_nprobe_curve(spark, sf_dir):
    emb = fan_out(load(spark, sf_dir, "embeddings"))
    cent = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_emb")
    )
    q2c = (
        emb.join(F.broadcast(cent))
        .select(
            "vec_id",
            "centroid_id",
            _cosine(F.col("embedding"), F.col("c_emb")).alias("sim"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.col("sim").desc(), F.col("centroid_id")
                )
            ),
        )
    )
    assign = q2c.filter(F.col("rn") == 1).select("vec_id", "centroid_id")
    qs = emb.filter(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    exact = (
        qs.join(emb, F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _cosine(F.col("q_emb"), F.col("embedding")).alias("sim"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("sim").desc(), F.col("neighbor_id")
                )
            ),
        )
    )
    truth = exact.filter(F.col("rk") <= 5).select("query_id", "neighbor_id")
    nprobes = spark.createDataFrame([(1,), (2,), (4,)], "nprobe INT")
    probe = (
        q2c.filter(F.col("vec_id") < 32)
        .join(F.broadcast(nprobes), F.col("rn") <= F.col("nprobe"))
        .select("nprobe", F.col("vec_id").alias("query_id"), "centroid_id")
    )
    cand = (
        probe.join(
            assign.select(
                F.col("centroid_id"), F.col("vec_id").alias("neighbor_id")
            ),
            "centroid_id",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("nprobe", "query_id", "neighbor_id")
        .distinct()
    )
    hits = (
        truth.crossJoin(F.broadcast(nprobes))
        .join(
            cand.withColumn("hit", F.lit(1)),
            ["nprobe", "query_id", "neighbor_id"],
            "left",
        )
        .groupBy("query_id", "nprobe")
        .agg(F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_hits"))
    )
    return hits.groupBy("nprobe").agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum("n_hits").cast("long").alias("total_hits"),
        F.expr("CAST((sum(n_hits) * 1000000) div (count(1) * 5) AS BIGINT)").alias(
            "recall6"
        ),
    )


def main():
    import duckdb

    from tests import thaw_oracles_r8 as oracles_mod
    from spark_sql_dsv2_extension_spark import registry

    registry.load_all()
    # materialize the composed cascade oracle exactly like the validator
    minhash = registry.REGISTRY["ext_near_dedup_minhash"].oracle
    exact = registry.REGISTRY["ext_exact_dedup"].oracle
    oracles = dict(oracles_mod.ORACLES)
    oracles["ext_dedup_cascade_report"] = f"""
    WITH exact_stage AS ({exact}),
    minhash_stage AS ({minhash})
    SELECT stage, n FROM (
      SELECT 0 AS stage, CAST(count(*) AS BIGINT) AS n FROM documents
      UNION ALL
      SELECT 1, CAST(count(*) AS BIGINT) FROM exact_stage
      UNION ALL
      SELECT 2, CAST(count(*) AS BIGINT) FROM minhash_stage
    ) ORDER BY stage
    """

    from tests.parity import compare

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("thaw-protos")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    from spark_sql_dsv2_extension_spark.tables import TABLE_NAMES, table_path

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
            odf = con.sql(oracles[key]).df()
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
