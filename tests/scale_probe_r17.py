"""Round-17 scale probe: the dedup family's broadcast inversion at sf1.

The r16 broadcast-inversion fix (candidates are the broadcast build
side; the corpus-sized shingle/bigram streams are semi-join-PRUNED, not
broadcast) was argued from plan shape at sf0.1. The r16 verdict (ask #7)
wants the argument demonstrated at 10× the corpus: one run of
``ext_near_dedup_minhash`` / ``ext_dup_pair_bleu`` /
``ext_dedup_survivorship`` end-to-end at sf-equivalent 1.0 (50,000
docs), with

- wall time + the data-sized cardinalities (shingles, LSH candidates,
  verified pairs) at sf 0.1 vs 1.0 — candidates/pairs must stay LINEAR
  in corpus size (the r14 probe's headline invariant) so the broadcast
  build side grows like the dup rate, not the corpus;
- the sf1 physical plan of the minhash verifier, dumped to
  plans/r17/ext_near_dedup_minhash_sf1.txt, in which every
  BroadcastExchange must hash a candidate-derived relation (the
  /*+ BROADCAST */ hints are size-independent pins), and the corpus
  stream enters only via the LEFT SEMI pruning join's probe side.

Fixtures: ``tests/scale_probe.gen_fixture`` (the r14 generator,
distribution-matched to the driver fixture and calibrated against it in
SCALE_PROBE_r14.md), written under the gitignored ``.scaleprobe/``.

Usage:  python tests/scale_probe_r17.py [--out SCALE_PROBE_r17]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_sql_dsv2_extension_spark.extensions.dedup import (
    _shingles,
    ext_dedup_survivorship,
    ext_dup_pair_bleu,
    ext_near_dedup_minhash,
)
from spark_sql_dsv2_extension_spark.session import get_spark
from spark_sql_dsv2_extension_spark.tables import load
from tests.scale_probe import gen_fixture

KEYS = {
    "ext_near_dedup_minhash": ext_near_dedup_minhash,
    "ext_dup_pair_bleu": ext_dup_pair_bleu,
    "ext_dedup_survivorship": ext_dedup_survivorship,
}


def run_key(spark, fn, sf_dir: str, runs: int = 2) -> dict:
    times = []
    for _ in range(runs):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(round(time.monotonic() - t0, 3))
    return {"runs": times, "min": min(times)}


def cardinalities(spark, sf_dir: str) -> dict:
    docs = load(spark, sf_dir, "documents")
    sh = _shingles(docs)
    pairs = ext_near_dedup_minhash(spark, sf_dir)
    # candidate count = pre-verification LSH bucket collisions; re-derive
    # the candidate relation exactly as the operator does (bounded by the
    # pair graph either way at these dup rates)
    n_pairs = pairs.count()
    return {
        "n_docs": docs.count(),
        "n_shingles": sh.count(),
        "n_verified_pairs": n_pairs,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALE_PROBE_r17")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = os.path.join(repo, ".scaleprobe")
    spark = get_spark("scale_probe_r17")
    spark.range(1).count()

    payload: dict = {"sfs": {}, "calibration_driver_sf0.1": {}}

    # calibration on the real driver fixture (same keys, same harness)
    drv = "/root/testdata/sf0.1"
    for key, fn in KEYS.items():
        payload["calibration_driver_sf0.1"][key] = run_key(spark, fn, drv)

    for sf in (0.1, 1.0):
        sf_dir = os.path.join(base, f"sf{sf}")
        if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
            gen_fixture(sf_dir, sf)
        entry: dict = {"cards": cardinalities(spark, sf_dir)}
        for key, fn in KEYS.items():
            entry[key] = run_key(spark, fn, sf_dir)
        payload["sfs"][str(sf)] = entry
        print(f"sf{sf}: {json.dumps(entry)}", file=sys.stderr)

    # sf1 plan dumps of the verifier: (a) the production plan — every
    # BroadcastExchange feeds a checkpoint LEAF (candidate-derived; the
    # corpus never broadcasts), and (b) an UNROLLED plan with
    # localCheckpoint bypassed (identity — semantics-neutral) so the
    # LEFT SEMI pruning join and its build side are visible end-to-end.
    sf1 = os.path.join(base, "sf1.0")

    def dump(df, name: str) -> str:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        with open(os.path.join(repo, "plans", "r17", name), "w") as f:
            f.write(plan)
        return plan

    plan = dump(
        ext_near_dedup_minhash(spark, sf1), "ext_near_dedup_minhash_sf1.txt"
    )
    from pyspark.sql.classic.dataframe import DataFrame as _DF

    orig_ckpt = _DF.localCheckpoint
    try:
        _DF.localCheckpoint = lambda self, eager=True: self  # type: ignore
        full = dump(
            ext_near_dedup_minhash(spark, sf1),
            "ext_near_dedup_minhash_sf1_unrolled.txt",
        )
    finally:
        _DF.localCheckpoint = orig_ckpt
    payload["sf1_plan"] = {
        "n_broadcast_exchange": plan.count("BroadcastExchange"),
        "n_parquet_scans": plan.count("Scan parquet"),
        "unrolled_has_left_semi_prune": "LeftSemi" in full,
        "unrolled_n_broadcast_exchange": full.count("BroadcastExchange"),
    }

    with open(os.path.join(repo, f"{args.out}.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload["sf1_plan"]))


if __name__ == "__main__":
    main()
