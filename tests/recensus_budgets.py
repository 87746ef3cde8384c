"""Regenerate the `_EXCHANGE_BUDGETS` census (tests/test_plans.py).

One-command re-census for the procedure documented above
``_EXCHANGE_BUDGETS``: replays the exact cache-cleared sweep the budget
test runs — SAME session builder (``session.get_spark``, the conftest
fixture), SAME default scale factor (sf0.001 unless ``PARITY_SF_DIR``
overrides, exactly like conftest), SAME counting formula (imported from
``tests.test_plans.count_budget_exchanges``) — and prints one JSON
object ``{key: observed_exchange_width}``.  Adjudicate the diff against
the committed table per the policy comment (decrease = accept + tighten;
increase = investigate before raising), then update the table in one
commit.

Usage:  python tests/recensus_budgets.py [key ...] > /tmp/census.json
        (no args = all keys; streaming/fixture keys that cannot build a
        batch plan are skipped, same as ``_all_plans``; unknown key names
        are an error, not a skip.)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# conftest's default: sf0.001 keeps the sweep fast and is what CI's
# budget test observes — a census at another SF can legitimately differ
# (broadcast-vs-shuffle flips) and must not be pasted into the table.
SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


def main() -> int:
    from spark_sql_dsv2_extension_spark.plans.explain import physical_plan
    from spark_sql_dsv2_extension_spark.registry import load_all
    from spark_sql_dsv2_extension_spark.session import get_spark
    from tests.test_plans import count_budget_exchanges

    specs = load_all()
    keys = sys.argv[1:] or list(specs)
    unknown = [k for k in keys if k not in specs]
    if unknown:
        print(f"unknown key(s): {unknown}", file=sys.stderr)
        return 2

    # the conftest `spark` fixture's exact builder — shuffle.partitions,
    # AQE, UTC, arrow all match what the budget test planned under
    spark = get_spark(
        "recensus-budgets", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
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
        census[key] = count_budget_exchanges(plan)
    spark.catalog.clearCache()
    json.dump(census, sys.stdout, indent=1, sort_keys=True)
    print()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
