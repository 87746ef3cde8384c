"""In-suite regression lock for the SHAPE hardening rounds.

The RAGGED_AUDIT_r13.md fixes (45 diverging keys, families W/W2/J/T)
and the RAGGED_CHAOS_AUDIT_r14.md fixes (3 keys, NULL-neighbor
interactions) are enforced out-of-band by ``tests/degenerate_audit.py
--ragged`` / ``--ragged-chaos``; this module pins ONE representative
key per family INSIDE the pytest loop — the same discipline as
``test_null_hardening.py`` and ``test_extreme_hardening.py`` for the
earlier frontiers.

Ragged (shape-only) representatives:
- W  (shared scorable width gate):  ext_knn_binary_hamming (the key the
                                    r12 ADVICE first flagged: pack()
                                    reads positions 1..64 under ANSI)
- J  (malformed-JSON quarantine):   fn_json (SQL_PROPS_JSON oracle side,
                                    lenient extraction plan side)
- T  (slice-zip bigram pairing):    ext_kneser_ney_bigrams (size-1 token
                                    lists must yield zero bigrams, not
                                    an OOB probe)

Ragged-chaos (shape x NULL) representatives — all three r14 fixes:
- NULL slopes vs rank-based median: ext_theil_sen_slope
- unknown-date versions in as-of:   ext_point_in_time_join
- concat_ws NULL-skipping:          ext_behavior_similarity

Contract identical to the audit: both engines equal under the
driver-matched canonicalizer on the composed fixtures.
"""

from __future__ import annotations

import duckdb
import pytest

from spark_sql_dsv2_extension_spark.registry import load_all
from spark_sql_dsv2_extension_spark.tables import TABLE_NAMES

from .parity import compare

_RAGGED_REPS = [
    "ext_knn_binary_hamming",
    "fn_json",
    "ext_kneser_ney_bigrams",
]

_RAGGED_CHAOS_REPS = [
    "ext_theil_sen_slope",
    "ext_point_in_time_join",
    "ext_behavior_similarity",
]


@pytest.fixture(scope="module")
def ragged_sf_dir(tmp_path_factory) -> str:
    from .degenerate_audit import build_ragged_fixtures

    d = str(tmp_path_factory.mktemp("ragged_fixtures"))
    build_ragged_fixtures(d)
    return d


@pytest.fixture(scope="module")
def ragged_duck(ragged_sf_dir):
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{ragged_sf_dir}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", _RAGGED_REPS)
def test_ragged_family_representative(key, spark, ragged_duck, ragged_sf_dir):
    spec = load_all()[key]
    sdf = spec.fn(spark, ragged_sf_dir).toPandas()
    odf = ragged_duck.sql(spec.oracle).df()
    compare(sdf, odf, key)


@pytest.fixture(scope="module")
def ragged_chaos_sf_dir(tmp_path_factory) -> str:
    from .degenerate_audit import build_ragged_chaos_fixtures

    d = str(tmp_path_factory.mktemp("ragged_chaos_fixtures"))
    build_ragged_chaos_fixtures(d)
    return d


@pytest.fixture(scope="module")
def ragged_chaos_duck(ragged_chaos_sf_dir):
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{ragged_chaos_sf_dir}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", _RAGGED_CHAOS_REPS)
def test_ragged_chaos_family_representative(
    key, spark, ragged_chaos_duck, ragged_chaos_sf_dir
):
    spec = load_all()[key]
    sdf = spec.fn(spark, ragged_chaos_sf_dir).toPandas()
    odf = ragged_chaos_duck.sql(spec.oracle).df()
    compare(sdf, odf, key)
