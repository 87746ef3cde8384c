"""Spark-side prototypes for the 2 round-12 thaw candidates (tranche 5).

ROUND-12 STATUS: BOTH REGISTERED at round-12 close (one commit each
under the thaw rule; rotation slots 51-52 front the round-13 window).
The registered copies in extensions/similarity.py are the source of
truth; these prototypes are retained as the validation record. Both fill genuine gaps in the embedding-retrieval family that
the registry's 456 keys do not cover:

- ``ext_mrl_truncation_curve`` — Matryoshka-representation evaluation:
  recall@k of TRUNCATED-dimension cosine retrieval (first d of 64 dims,
  d ∈ {8, 16, 32}) against the full-dimension exact top-k. The modern
  "can I serve 16-dim vectors?" serving decision, exactly checkable
  because both rankings are deterministic (sim desc, neighbor asc).
- ``ext_knn_binary_hamming`` — the binary-quantization retrieval
  cascade: 1-bit sign quantization packed into two 32-bit words,
  Hamming-distance candidate generation (top-C by popcount of XOR),
  exact-cosine rerank to top-k. 64× vector compression with an exact
  oracle (sign bits and popcounts are integer arithmetic both engines
  reproduce bit-identically); the shape BQ/RaBitQ-style systems serve.

Both consume the round-12 scorable-embedding gate (non-NULL, norm > 0,
max|component| < 1e9) so they are X1/X2-safe from day one; the MRL key
additionally gates zero-norm PREFIXES (a vector can be scorable at 64
dims yet zero in its first 8) identically on both sides.

Same harness as tests/thaw_protos_r{8,9,10}.py: run
``python tests/thaw_protos_r12.py [key ...]`` (not pytest-collected)
against tests/thaw_oracles_r12.py under a vanilla session.
"""
from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from spark_sql_dsv2_extension_spark.tables import fan_out, load

SF = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")

PROTOS = {}


def proto(name):
    def deco(fn):
        PROTOS[name] = fn
        return fn

    return deco


def _emb_scorable(spark, sf_dir):
    abs_max = F.array_max(
        F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    )
    return load(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull() & (abs_max > 0) & (abs_max < 1e9)
    )


def _dot(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


MRL_DIMS = (8, 16, 32)
MRL_K = 5
MRL_QUERIES = 10


@proto("ext_mrl_truncation_curve")
def ext_mrl_truncation_curve(spark, sf_dir):
    """Per truncation dim d: how many of the full-64-dim exact top-k
    survive in the d-dim top-k, per query, summed — recall@k as an
    integer micro-ratio. Prefix-norm-0 vectors are unscorable at that
    dim and drop from that dim's ranking on BOTH sides."""
    emb = fan_out(_emb_scorable(spark, sf_dir))

    def topk(df, dim):
        e = df.select(
            "vec_id",
            (F.slice("embedding", 1, dim) if dim else F.col("embedding")).alias(
                "v"
            ),
        ).filter(_dot(F.col("v"), F.col("v")) > 0)
        q = e.filter(F.col("vec_id") < MRL_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        sims = e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                _dot(F.col("qv"), F.col("v"))
                / (
                    F.sqrt(_dot(F.col("qv"), F.col("qv")))
                    * F.sqrt(_dot(F.col("v"), F.col("v")))
                )
            ).alias("sim"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("neighbor_id").asc()
        )
        return (
            sims.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= MRL_K)
            .select("query_id", "neighbor_id")
        )

    full = topk(emb, None)
    out = None
    for d in MRL_DIMS:
        t = topk(emb, d).withColumnRenamed("neighbor_id", "t_nid")
        hits = (
            full.join(
                t,
                (full["query_id"] == t["query_id"])
                & (full["neighbor_id"] == t["t_nid"]),
                "left",
            )
            .drop(t["query_id"])
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_exact"),
                F.sum(F.when(F.col("t_nid").isNotNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_hits"),
            )
            .select(
                F.lit(d).cast("long").alias("trunc_dim"),
                "n_exact",
                "n_hits",
                F.expr("CAST(n_hits * 1000000 div n_exact AS BIGINT)").alias(
                    "recall6"
                ),
            )
        )
        out = hits if out is None else out.unionByName(hits)
    return out


HAM_K = 5
HAM_C = 20  # hamming candidate pool per query
HAM_QUERIES = 10


@proto("ext_knn_binary_hamming")
def ext_knn_binary_hamming(spark, sf_dir):
    """1-bit sign quantization (x > 0) packed into two 32-bit words;
    candidates = top-C by Hamming distance (popcount of XOR, tie:
    neighbor asc); exact-cosine rerank to top-k with the standard
    deterministic tie-break."""
    emb = fan_out(_emb_scorable(spark, sf_dir))

    def pack(lo):
        # 32 precomputed bit literals summed: constant-folded, codegen'd,
        # no shift-by-column (F.shiftleft takes a Python int only)
        terms = [
            F.when(
                F.element_at(F.col("embedding"), lo + j + 1).cast("double") > 0,
                F.lit(1 << j).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            for j in range(32)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out

    coded = emb.select(
        "vec_id", "embedding", pack(0).alias("b0"), pack(32).alias("b1")
    )
    q = coded.filter(F.col("vec_id") < HAM_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("b0").alias("q0"),
        F.col("b1").alias("q1"),
    )
    ham = coded.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        "q_emb",
        "embedding",
        (
            F.bit_count(F.col("b0").bitwiseXOR(F.col("q0")))
            + F.bit_count(F.col("b1").bitwiseXOR(F.col("q1")))
        ).alias("hamming"),
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id").asc()
    )
    cand = ham.withColumn("crk", F.row_number().over(wc)).filter(
        F.col("crk") <= HAM_C
    )
    rer = cand.select(
        "query_id",
        "neighbor_id",
        "hamming",
        (
            _dot(F.col("q_emb"), F.col("embedding"))
            / (
                F.sqrt(_dot(F.col("q_emb"), F.col("q_emb")))
                * F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
            )
        ).alias("sim"),
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        rer.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= HAM_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("hamming").cast("long").alias("hamming"),
            F.round("sim", 6).alias("cosine6"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import tests.thaw_oracles_r12 as oracles_mod
    from spark_sql_dsv2_extension_spark.tables import TABLE_NAMES, table_path
    from tests.parity import compare

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("thaw-r12")
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
