"""The main correctness gate: every registered query vs its DuckDB oracle.

One parametrized test per inventory key — exactly what the driver's t2 does
at sf0.01 (here at sf0.001 by default for speed; PARITY_SF_DIR overrides).
Every registered key must carry an exact DuckDB oracle (enforced below).
"""

from __future__ import annotations

import pytest

from spark_sql_dsv2_extension_spark.registry import load_all

from .parity import compare

SPECS = load_all()


@pytest.mark.parametrize("key", sorted(SPECS))
def test_query_parity(key, spark, duck, sf_dir):
    spec = SPECS[key]
    # every registered key carries an exact DuckDB oracle (the rows-only
    # weaker path died in round 3; keep registration honest)
    assert spec.oracle is not None, f"{key} registered without an oracle"
    sdf = spec.fn(spark, sf_dir).toPandas()
    odf = duck.sql(spec.oracle).df()
    compare(sdf, odf, key)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    # the driver's t1 gate is rows > 0 — mirror it exactly (the old >= 0
    # could never fail)
    assert len(rows) > 0 and len(df.columns) >= 4


def test_oracle_keys_subset():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0


def test_driver_priority_exactly_covers_registry():
    """Rotation-list integrity: a typo'd or stale name in _DRIVER_PRIORITY
    would silently fall out of the driver's bounded correctness window and
    a missing name would get nondeterministic (registration-order) slots.
    The list must be a permutation of the registry keys."""
    from spark_sql_dsv2_extension_spark.registry import _DRIVER_PRIORITY

    dupes = {k for k in _DRIVER_PRIORITY if _DRIVER_PRIORITY.count(k) > 1}
    assert not dupes, f"duplicate rotation entries: {sorted(dupes)}"
    assert set(_DRIVER_PRIORITY) == set(SPECS), (
        f"stale names: {sorted(set(_DRIVER_PRIORITY) - set(SPECS))}; "
        f"unlisted keys: {sorted(set(SPECS) - set(_DRIVER_PRIORITY))}"
    )


# Deliberate re-fronts this round (keys whose green driver row predates a
# plan-changing rewrite, consciously re-spending a window slot).
#
# Round 9: the backlog (44) was below the window size (50) for the first
# time, so the surplus slots were spent consciously (ROADMAP_r9.md's
# sub-50-backlog protocol): slot 45 is ext_spearman_corr — driver-verified
# in r5 but the committed plan ANSI-overflowed at sf>=0.1 (int32
# rank-difference product, r8 verdict ask #2); the int64 fix landed this
# round and this slot re-verifies it. Slots 46-50 went to the five
# tranche-2 thaw registrations (net-new keys, so no allowlist entry
# needed); the interim placeholders that held those slots between the
# rotation commit and the thaw commits have all been displaced.
_DELIBERATE_REFRONTS: frozenset[str] = frozenset({"ext_spearman_corr"})


def test_driver_window_has_no_silent_refronts():
    """Zero-stale-row discipline, testable: every key in the driver's
    50-key window must be driver-UNVERIFIED (no row in any CORRECTNESS_r*.json
    present in the working tree) unless it is a documented deliberate
    re-front. A verified key appearing here by accident would waste a
    coverage slot; a rewritten-but-not-re-fronted key is caught by the
    inverse review at rotation time.

    INTENTIONAL TRIPWIRE: the glob reads the WORKING TREE, not just
    git-tracked files. At a round boundary the driver drops a fresh
    (initially untracked) CORRECTNESS artifact whose keys are exactly the
    unrotated window — this test then fails by design, forcing the next
    round's first commit to be the rotation. Do not "fix" it by
    restricting the glob to committed files."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    verified: set[str] = set()
    # r* (not r0*): artifact names grow to CORRECTNESS_r10.json and beyond
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        verified |= set(json.load(open(path)))
    if not verified:
        pytest.skip("no committed CORRECTNESS artifacts (fresh checkout)")
    window = list(SPECS)[:50]
    silent = [
        k for k in window if k in verified and k not in _DELIBERATE_REFRONTS
    ]
    assert not silent, (
        "driver-window slots spent on already-verified keys without a "
        f"_DELIBERATE_REFRONTS entry: {silent}"
    )
