"""Round-12 tranche-6 thaw-candidate oracle validation.

ROUND-12 STATUS: REGISTERED at round-12 close (extensions/dedup.py is
the source of truth; this oracle retained as the validation record).

Run: ``python tests/thaw_protos_r13.py`` (not pytest-collected). One
candidate: the MinHash sketch-accuracy invariant. The oracle asserts the
invariant — the exact-Jaccard near-dup pair list (J ≥ 0.8, identical to
the registered ``ext_near_dedup_minhash`` ground truth) with literal
TRUE — so the check is exact while the estimator stays sketch-based
(DuckDB cannot and need not reproduce xxhash64 signatures).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_sql_dsv2_extension_spark.extensions.dedup import (  # noqa: E402
    _EXACT_JACCARD_SQL,
    JACCARD_THRESHOLD,
)

ORACLES = {}

ORACLES["ext_minhash_jaccard_estimate"] = (
    "SELECT d1, d2, TRUE AS within_tol FROM ("
    + _EXACT_JACCARD_SQL.format(thr=JACCARD_THRESHOLD)
    + ")"
)
