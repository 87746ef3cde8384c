"""Determinism self-check: Spark vs ITSELF under different physical configs.

Every other audit compares Spark against DuckDB on ONE physical
configuration; none checks that a key's RESULT is invariant to the
physical knobs the driver does not control — shuffle partition count,
AQE, core count. An order-dependent result (a double aggregated in
partition order without the integer-scaling discipline, a tie broken by
arrival, a limit without a total order) can pass oracle parity by luck
on one layout and flake on another. This sweep runs every registered key
under two deliberately different configurations and compares the
driver-canonicalized results:

  config A — the driver's vanilla session: default shuffle partitions
             (200), default AQE, local[8]
  config B — adversarial layout: shuffle.partitions=7, AQE off,
             local[3], smaller maxPartitionBytes (more input splits)

Same contract as tests/degenerate_audit.py: equal under the
driver-matched canonicalizer (tests/parity.canon) = OK, else DIVERGE;
an exception under either config = DIVERGE. Runs at sf0.001 by default
(PARITY_SF_DIR overrides) — determinism is a plan property, not a data-
volume property, but the fixture must be big enough to span partitions.

Usage:
    python tests/selfcheck.py [key1 key2 ...]     # default: all keys
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")

_CONFIGS = {
    "A": {"master": "local[8]", "conf": {}},
    "B": {
        "master": "local[3]",
        "conf": {
            "spark.sql.shuffle.partitions": "7",
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.files.maxPartitionBytes": "1m",
            "spark.default.parallelism": "3",
        },
    },
}


def _canon(df) -> list[tuple]:
    """Driver-matched canonical form: columns sorted by name, rows
    order-insensitive, NaN == NULL (mirrors tests/parity.compare)."""
    import math

    pdf = df.toPandas()
    cols = sorted(pdf.columns)

    def norm(x):
        if x is None:
            return "NULL"
        if isinstance(x, float):
            if math.isnan(x):
                return "NULL"
            return repr(x)
        return str(x)

    return sorted(
        tuple(norm(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )


def _run_config(name: str, keys: list[str]) -> dict[str, object]:
    """One session per config; returns key -> canonical rows or ('ERR', msg)."""
    from pyspark.sql import SparkSession

    from spark_sql_dsv2_extension_spark.registry import load_all

    cfg = _CONFIGS[name]
    b = (
        SparkSession.builder.master(cfg["master"])
        .appName(f"selfcheck-{name}")
        .config("spark.ui.enabled", "false")
    )
    for k, v in cfg["conf"].items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    out: dict[str, object] = {}
    for i, key in enumerate(keys):
        try:
            out[key] = _canon(specs[key].fn(spark, SF_DIR))
        except Exception as exc:  # noqa: BLE001 - audit collects, not raises
            out[key] = ("ERR", f"{type(exc).__name__}: {exc}"[:200])
        if (i + 1) % 50 == 0:
            print(f"  [{name}] {i + 1}/{len(keys)}", flush=True)
    spark.stop()
    return out


def main() -> int:
    from spark_sql_dsv2_extension_spark.registry import load_all

    keys = sys.argv[1:] or list(load_all())
    print(f"selfcheck: {len(keys)} keys at {SF_DIR}")
    # two child processes would be cleaner, but one JVM per config in
    # sequence is enough: SparkSession.stop() + fresh builder applies the
    # new master/conf (verified: the second session reports the new
    # shuffle partition count)
    res_a = _run_config("A", keys)
    res_b = _run_config("B", keys)
    diverged = []
    for key in keys:
        a, b = res_a[key], res_b[key]
        if a == b and not (isinstance(a, tuple) and a and a[0] == "ERR"):
            print(f"OK   {key}")
        else:
            diverged.append(key)
            print(f"DIVERGE {key}: A={str(a)[:160]} B={str(b)[:160]}")
    print(f"\n{len(keys) - len(diverged)} ok, {len(diverged)} diverged: {diverged}")
    return 1 if diverged else 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception:
        traceback.print_exc()
        sys.exit(2)
