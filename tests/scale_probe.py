"""Multi-SF scale probe for the dedup / ANN / connected-components family.

The 100 TB design claims rest on plan shape + pinned exchange budgets
(tests/test_plans.py); this probe adds the MEASURED scaling point the
r12/r13 verdicts asked for (ask #5): per-stage wall-time for
``ext_near_dedup_minhash``, ``ext_knn_ivf_trained`` and
``ext_dedup_clusters`` at three corpus sizes spanning one order of
magnitude, with fitted log-log slopes and candidate-count scaling for
the LSH stage.

The driver fixture tops out at sf0.1 (5,000 documents / 2,000
embeddings — /root/testdata is read-only), so the probe generates its
own fixtures at sf-equivalents 0.1 / 0.3 / 1.0 with distributions
matched to the measured driver generator:

- text: word count ~ Uniform[10, 100] over the same 30-word vocabulary;
  5% of documents are near-duplicates (copy of a random earlier
  original with ONE word position replaced by the token "dup"),
  reproducing the driver fixture's clean J >= 0.8 dup band (measured:
  250/5000 dup docs, 256 J>=0.8 pairs, no pairs in (0.1, 0.8));
- lang ~ categorical(en .412, zh .151, es .149, fr .148, de .140),
  source ~ uniform over src0..src19 (measured at sf0.1);
- embeddings: 64-dim float32 N(0, 0.125^2) (passes the scorable gate:
  full width, norm > 0, bounded components), label ~ uniform 0..9,
  n_emb = 0.4 * n_docs (the sf0.1 ratio).

A same-size calibration run on the DRIVER sf0.1 fixture is reported so
synthetic-vs-driver generator drift is visible rather than assumed away.

Usage:
    python tests/scale_probe.py [--sfs 0.1,0.3,1.0] [--out SCALE_PROBE_r14]

Writes <out>.json (raw numbers) and prints a per-stage table; the
round's SCALE_PROBE_r14.md narrates the results.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from spark_sql_dsv2_extension_spark.extensions.dedup import (
    JACCARD_THRESHOLD,
    N_BANDS,
    N_HASHES,
    _cc_large_small_star,
    _shingles,
    ext_near_dedup_minhash,
)
from spark_sql_dsv2_extension_spark.extensions.similarity import (
    N_QUERIES,
    TOP_K,
    _emb_scorable,
    cosine,
    ext_knn_ivf_trained,
    fan_out,
    sqdist,
    train_kmeans,
)
from spark_sql_dsv2_extension_spark.session import get_spark
from spark_sql_dsv2_extension_spark.tables import load

VOCAB = (
    "spark window merge table column vector stream value data small join "
    "filter big group hash customer sort order slow line part fast the row "
    "agg key query a scan batch"
).split()
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.412, 0.151, 0.149, 0.148, 0.140]
DUP_RATE = 0.05
BASE_DOCS = 50_000  # sf 1.0
BASE_EMB = 20_000


def gen_fixture(out_dir: str, sf: float, seed: int = 42) -> tuple[int, int]:
    """Deterministic documents+embeddings fixture at an sf-equivalent."""
    rng = np.random.default_rng(seed)
    n_docs = int(round(BASE_DOCS * sf))
    n_emb = int(round(BASE_EMB * sf))
    os.makedirs(out_dir, exist_ok=True)

    texts: list[str] = []
    originals: list[int] = []
    for i in range(n_docs):
        if originals and rng.random() < DUP_RATE:
            src = originals[int(rng.integers(len(originals)))]
            words = texts[src].split()
            words[int(rng.integers(len(words)))] = "dup"
            texts.append(" ".join(words))
        else:
            n_words = int(rng.integers(10, 101))
            idx = rng.integers(0, len(VOCAB), n_words)
            texts.append(" ".join(VOCAB[j] for j in idx))
            originals.append(i)
    langs = rng.choice(LANGS, n_docs, p=LANG_P)
    sources = [f"src{int(s)}" for s in rng.integers(0, 20, n_docs)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs.tolist(), pa.string()),
                "source": pa.array(sources, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(out_dir, "documents.parquet"),
    )

    emb = (rng.standard_normal((n_emb, 64)) * 0.125).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n_emb), pa.int64()),
                "embedding": pa.array(emb.tolist(), pa.list_(pa.float32())),
                "label": pa.array(
                    rng.integers(0, 10, n_emb).tolist(), pa.int32()
                ),
            }
        ),
        os.path.join(out_dir, "embeddings.parquet"),
    )
    return n_docs, n_emb


def timed(fn):
    t0 = time.monotonic()
    out = fn()
    return time.monotonic() - t0, out


def probe_minhash(spark, sf_dir: str) -> dict:
    """Per-stage timings mirroring ext_near_dedup_minhash's composition:
    shingles -> 96-min signature + 24x4 banding -> band-bucket candidate
    join -> exact-Jaccard verify. Stage timings are incremental (each
    stage's inputs are cached by the previous one, as in the operator)."""
    docs = load(spark, sf_dir, "documents")
    sh = _shingles(docs).cache()
    t_shingle, n_shingles = timed(sh.count)

    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
            for i in range(N_HASHES)
        ]
    )
    rows_per_band = N_HASHES // N_BANDS
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[
                            F.col(f"h{b * rows_per_band + j}")
                            for j in range(rows_per_band)
                        ]
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band", "band_sig"),
    ).cache()
    t_sig, _ = timed(bands.count)

    left, right = bands.alias("l"), bands.alias("r")
    candidates = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_sig") == F.col("r.band_sig"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("d1"), F.col("r.doc_id").alias("d2"))
        .distinct()
        .cache()
    )
    t_cand, n_candidates = timed(candidates.count)

    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    s1, s2 = sh.alias("s1"), sh.alias("s2")
    inter = (
        candidates.join(s1, F.col("d1") == F.col("s1.doc_id"))
        .join(
            s2,
            (F.col("d2") == F.col("s2.doc_id"))
            & (F.col("s1.shingle") == F.col("s2.shingle")),
        )
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    n1, n2 = sizes.alias("n1"), sizes.alias("n2")
    jac = (
        inter.join(n1, F.col("d1") == F.col("n1.doc_id"))
        .join(n2, F.col("d2") == F.col("n2.doc_id"))
        .select(
            "d1",
            "d2",
            (
                F.col("i") * 1.0 / (F.col("n1.n") + F.col("n2.n") - F.col("i"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    t_verify, n_pairs = timed(jac.count)
    return {
        "stages": {
            "shingle": round(t_shingle, 3),
            "signature_banding": round(t_sig, 3),
            "lsh_candidates": round(t_cand, 3),
            "exact_verify": round(t_verify, 3),
        },
        "n_shingles": n_shingles,
        "n_candidates": n_candidates,
        "n_pairs_ge_threshold": n_pairs,
    }


def probe_ivf(spark, sf_dir: str) -> dict:
    """Per-stage timings mirroring ext_knn_ivf_trained: k-means codebook
    train -> nearest-centroid assignment -> cell-restricted cosine
    search."""
    emb = fan_out(_emb_scorable(spark, sf_dir))
    t_train, (_, cent) = timed(lambda: _materialized_train(emb))

    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("sqd").asc(), F.col("cid").asc()
    )
    clustered = (
        emb.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "embedding",
            "cid",
            sqdist(F.col("embedding"), F.col("c")).alias("sqd"),
        )
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .drop("rn", "sqd")
    ).cache()
    t_assign, n_assigned = timed(clustered.count)

    q = clustered.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("cid").alias("q_cid"),
    )
    sims = clustered.join(
        F.broadcast(q),
        (F.col("cid") == F.col("q_cid"))
        & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("q_emb"), F.col("embedding")).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    top = sims.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= TOP_K
    )
    t_search, n_results = timed(top.count)
    return {
        "stages": {
            "kmeans_train": round(t_train, 3),
            "assignment": round(t_assign, 3),
            "cell_search": round(t_search, 3),
        },
        "n_assigned": n_assigned,
        "n_results": n_results,
    }


def _materialized_train(emb):
    comp, cent = train_kmeans(emb)
    cent = cent.cache()
    cent.count()  # force the 2 Lloyd iterations
    return comp, cent


def probe_cc(spark, sf_dir: str) -> dict:
    """ext_dedup_clusters split: LSH pair generation vs the
    large-star/small-star connected-components rounds."""
    pairs = (
        ext_near_dedup_minhash(spark, sf_dir).select("d1", "d2").cache()
    )
    t_pairs, n_edges = timed(pairs.count)
    cc = _cc_large_small_star(pairs)
    t_cc, n_nodes = timed(cc.count)
    return {
        "stages": {
            "lsh_pairs": round(t_pairs, 3),
            "cc_large_small_star": round(t_cc, 3),
        },
        "n_edges": n_edges,
        "n_clustered_nodes": n_nodes,
    }


def probe_end_to_end(spark, sf_dir: str) -> dict:
    """End-to-end wall-time for the production-shaped composition
    (ext_corpus_pipeline: normalize -> quality gate -> exact dedup ->
    hash split in ONE plan) and the exact-dedup baseline — no staging,
    these measure the composed-plan scaling the per-stage probes can't."""
    from spark_sql_dsv2_extension_spark.extensions.dedup import (
        ext_exact_dedup,
    )
    from spark_sql_dsv2_extension_spark.extensions.text import (
        ext_corpus_pipeline,
    )

    out = {}
    t, n = timed(ext_exact_dedup(spark, sf_dir).count)
    out["exact_dedup"] = {"sec": round(t, 3), "rows": n}
    spark.catalog.clearCache()
    t, n = timed(ext_corpus_pipeline(spark, sf_dir).count)
    out["corpus_pipeline"] = {"sec": round(t, 3), "rows": n}
    spark.catalog.clearCache()
    return out


def fit_slope(ns: list[int], ts: list[float]) -> float:
    """Least-squares slope of log(t) vs log(n): t ~ n^slope."""
    xs = [math.log(n) for n in ns]
    ys = [math.log(max(t, 1e-4)) for t in ts]
    return round(float(np.polyfit(xs, ys, 1)[0]), 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sfs", default="0.1,0.3,1.0")
    ap.add_argument("--out", default="SCALE_PROBE_r14")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 16)))
    args = ap.parse_args()
    sfs = [float(s) for s in args.sfs.split(",")]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = os.path.join(repo, ".scaleprobe")

    spark = get_spark("scale_probe", cpus=args.cpus)
    results: dict = {"sfs": sfs, "points": [], "calibration": {}, "slopes": {}}

    # fixtures
    dirs = {}
    for sf in sfs:
        d = os.path.join(base, f"sf{sf}")
        if not (
            os.path.exists(os.path.join(d, "documents.parquet"))
            and os.path.exists(os.path.join(d, "embeddings.parquet"))
        ):
            n_docs, n_emb = gen_fixture(d, sf)
            print(f"generated sf{sf}: {n_docs} docs, {n_emb} embeddings")
        dirs[sf] = d

    # session warmup: run all three keys once at the smallest SF so JVM/
    # codegen warmup is not attributed to the first measured point
    wd = dirs[sfs[0]]
    ext_near_dedup_minhash(spark, wd).count()
    ext_knn_ivf_trained(spark, wd).count()
    spark.catalog.clearCache()

    # calibration: driver sf0.1 vs synthetic sf0.1-equivalent, end-to-end
    for tag, d in [("driver_sf0.1", "/root/testdata/sf0.1"), ("synthetic_sf0.1", dirs[sfs[0]])]:
        cal = {}
        t, n = timed(ext_near_dedup_minhash(spark, d).count)
        cal["ext_near_dedup_minhash"] = {"sec": round(t, 3), "rows": n}
        spark.catalog.clearCache()
        t, n = timed(ext_knn_ivf_trained(spark, d).count)
        cal["ext_knn_ivf_trained"] = {"sec": round(t, 3), "rows": n}
        spark.catalog.clearCache()
        t, n = timed(
            lambda d=d: _cc_large_small_star(
                ext_near_dedup_minhash(spark, d).select("d1", "d2").cache()
            ).count()
        )
        cal["ext_dedup_clusters"] = {"sec": round(t, 3), "rows": n}
        spark.catalog.clearCache()
        results["calibration"][tag] = cal
        print(f"calibration {tag}: {json.dumps(cal)}")

    # measured points
    for sf in sfs:
        d = dirs[sf]
        n_docs = int(round(BASE_DOCS * sf))
        n_emb = int(round(BASE_EMB * sf))
        point = {"sf": sf, "n_docs": n_docs, "n_emb": n_emb}
        point["minhash"] = probe_minhash(spark, d)
        spark.catalog.clearCache()
        point["ivf"] = probe_ivf(spark, d)
        spark.catalog.clearCache()
        point["cc"] = probe_cc(spark, d)
        spark.catalog.clearCache()
        point["e2e"] = probe_end_to_end(spark, d)
        results["points"].append(point)
        print(f"sf{sf}: {json.dumps(point)}")

    # slopes (log-log, across all points)
    pts = results["points"]
    docs_ns = [p["n_docs"] for p in pts]
    emb_ns = [p["n_emb"] for p in pts]
    slopes: dict = {}
    for stage in pts[0]["minhash"]["stages"]:
        slopes[f"minhash.{stage}"] = fit_slope(
            docs_ns, [p["minhash"]["stages"][stage] for p in pts]
        )
    slopes["minhash.n_candidates"] = fit_slope(
        docs_ns, [p["minhash"]["n_candidates"] for p in pts]
    )
    for stage in pts[0]["ivf"]["stages"]:
        slopes[f"ivf.{stage}"] = fit_slope(
            emb_ns, [p["ivf"]["stages"][stage] for p in pts]
        )
    for stage in pts[0]["cc"]["stages"]:
        slopes[f"cc.{stage}"] = fit_slope(
            docs_ns, [p["cc"]["stages"][stage] for p in pts]
        )
    for key in pts[0].get("e2e", {}):
        slopes[f"e2e.{key}"] = fit_slope(
            docs_ns, [p["e2e"][key]["sec"] for p in pts]
        )
    results["slopes"] = slopes
    print("slopes:", json.dumps(slopes, indent=2))

    out_path = os.path.join(repo, args.out + ".json")
    json.dump(results, open(out_path, "w"), indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
