"""Spark-side prototype for the round-12 tranche-6 thaw candidate.

ROUND-12 STATUS: REGISTERED at round-12 close (extensions/dedup.py is
the source of truth; this prototype is retained as the validation
record; rotation slot 53 fronts the round-13 window).

- ``ext_minhash_jaccard_estimate`` — the sketch-accuracy invariant the
  MinHash family itself deserves (the ``agg_approx_count_distinct``
  shape): for every exact near-duplicate pair (Jaccard ≥ 0.8, the
  registered ``ext_near_dedup_minhash`` ground truth), the
  SIGNATURE-based estimate Ĵ = (#agreeing minhash positions)/96 must sit
  within eps of the exact Jaccard. With n = 96 hashes the binomial std
  of Ĵ is ≤ √(0.25/96) ≈ 0.051, so eps = 0.25 (~5σ) is robust without
  being vacuous — a broken signature pipeline (wrong hash seed mixing,
  band transposition, a stale cache) gives Ĵ ≈ 0 on a J ≈ 0.8 pair and
  fails immediately. The oracle cannot reproduce xxhash64, and does not
  need to: it asserts the invariant (the exact-Jaccard pair list with
  literal TRUE), so the check is exact while the estimator stays
  sketch-based.

Validated before registration at sf0.001/0.01/0.1 and across all five
audit fixture modes (same harness as tests/thaw_protos_r{8,9,10,12}.py):
``python tests/thaw_protos_r13.py`` (not pytest-collected).
"""
from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")

PROTOS = {}


def proto(name):
    def deco(fn):
        PROTOS[name] = fn
        return fn

    return deco


_EST_EPS = 0.25
_N_HASHES = 96


@proto("ext_minhash_jaccard_estimate")
def ext_minhash_jaccard_estimate(spark, sf_dir):
    from spark_sql_dsv2_extension_spark.extensions.dedup import (
        _shingles,
        ext_near_dedup_minhash,
    )
    from spark_sql_dsv2_extension_spark.tables import load

    pairs = ext_near_dedup_minhash(spark, sf_dir).select("d1", "d2", "jaccard")
    sig = (
        _shingles(load(spark, sf_dir, "documents"))
        .groupBy("doc_id")
        .agg(
            *[
                F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
                for i in range(_N_HASHES)
            ]
        )
    )
    s1 = sig.select(
        F.col("doc_id").alias("d1"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(_N_HASHES)],
    )
    s2 = sig.select(
        F.col("doc_id").alias("d2"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(_N_HASHES)],
    )
    agree = None
    for i in range(_N_HASHES):
        term = (F.col(f"a{i}") == F.col(f"b{i}")).cast("int")
        agree = term if agree is None else agree + term
    return (
        pairs.join(s1, "d1")
        .join(s2, "d2")
        .select(
            "d1",
            "d2",
            (
                F.abs(agree.cast("double") / _N_HASHES - F.col("jaccard"))
                <= F.lit(_EST_EPS)
            ).alias("within_tol"),
        )
    )


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import tests.thaw_oracles_r13 as oracles_mod
    from spark_sql_dsv2_extension_spark.tables import TABLE_NAMES, table_path
    from tests.parity import compare

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("thaw-r13")
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
