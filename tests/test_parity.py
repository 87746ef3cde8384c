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
# Round 10: CORRECTNESS_r09 closed the backlog (cumulative 440/440), so
# the ENTIRE window is conscious spending per ROADMAP_r10.md: slots 1-39
# are the pre-computed fix/perf batches (13 Family-A _shingles-gate
# consumers, 14 Family-B/E4 try_divide keys, the Family-C coordinated
# gate, 9 EMPTY_AUDIT_r9.md keys, 2 measured-positive perf keys); slots
# 40-50 receive the 11 thaw registrations (tranche 3 x6 + tranche-2
# leftovers x5) as they land, interim-held until then by the head of the
# rotated r9-verified block (the INTERIM set below — each name removed by
# the thaw commit that displaces it out of the window).
_R10_FIX_BATCH = frozenset({
    # Family A (DEGENERATE_AUDIT_r8.md: the _shingles size>=3 gate)
    "ext_near_dedup_minhash", "ext_dedup_cascade_report",
    "ext_dedup_survivorship", "ext_dedup_threshold_curve",
    "ext_dedup_clusters", "ext_dup_transitivity_audit",
    "ext_dup_pair_bleu", "ext_minhash_fidelity", "ext_minhash_band_tuning",
    "ext_ngram_jaccard", "ext_near_dup_containment",
    "ext_cross_source_dup_rate", "ext_split_leakage",
    # Family B + E4 riders (uniform try_divide, oracles untouched)
    "agg_stats_corr", "ext_jackknife_blocks", "ext_embedding_whitening",
    "ext_retrieval_auc", "ext_cross_correlation_lags", "ext_chi2_terms",
    "ext_acf_daily", "ext_poisson_bootstrap_ci", "ext_cramers_v",
    "ext_cohens_kappa", "ext_cuped_adjustment", "ext_design_effect_icc",
    "ext_consistent_hash_ring", "ext_functional_dependency",
    # Family C (coordinated UDF + oracle gate)
    "udaf_grouped_map_zscore",
    # EMPTY_AUDIT_r9.md: E1 round-trips, E2 datasource guards, simpson
    "scan_partition_prune", "sink_overwrite_dynamic", "sink_merge_upsert",
    "sink_compaction", "sink_python_datasource", "join_dpp_partition_prune",
    "scan_python_datasource", "scan_python_datasource_pushdown",
    "ext_simpson_diversity",
    # perf agenda (ROADMAP_r10.md; the fuzzy-levenshtein candidate
    # measured not actionable — its slot went to a 6th tranche-2 thaw)
    "ext_equidepth_histogram",
})
# All 11 interim occupants were displaced by the 12 thaw registrations
# (tranche 3 x6 + tranche-2 leftovers x6 after the fuzzy-slot
# reallocation); the window closes at exactly 50 with zero interims.
_DELIBERATE_REFRONTS: frozenset[str] = _R10_FIX_BATCH


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
