"""Regenerate the `_EXCHANGE_BUDGETS` census (tests/test_plans.py).

One-command re-census for the procedure documented above
``_EXCHANGE_BUDGETS``: replays the exact cache-cleared sweep the original
census used (vanilla local session, ``spark.catalog.clearCache()`` before
every key so each plan reflects only its own fn-internal caches) and
prints one JSON object ``{key: observed_exchange_width}`` covering every
batch key in the registry.  Adjudicate the diff against the committed
table per the policy comment (decrease = accept + tighten; increase =
investigate before raising), then update the table in one commit.

Usage:  python tests/recensus_budgets.py [key ...] > /tmp/census.json
        (no args = all keys; streaming/fixture keys that cannot build a
        batch plan are skipped, same as ``_all_plans``.)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    from pyspark.sql import SparkSession

    from spark_sql_dsv2_extension_spark.plans.explain import physical_plan
    from spark_sql_dsv2_extension_spark.registry import load_all

    specs = load_all()
    keys = sys.argv[1:] or list(specs)

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .appName("recensus-budgets")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    census: dict[str, int] = {}
    for key in keys:
        spark.catalog.clearCache()
        try:
            plan = physical_plan(specs[key].fn(spark, SF_DIR))
        except Exception as exc:  # streaming fixtures etc. — same as CI memo
            print(f"# skip {key}: {type(exc).__name__}", file=sys.stderr)
            continue
        census[key] = plan.count("Exchange hashpartitioning") + plan.count(
            "Exchange rangepartitioning"
        )
    spark.catalog.clearCache()
    json.dump(census, sys.stdout, indent=1, sort_keys=True)
    print()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
