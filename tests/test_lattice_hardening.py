"""In-suite regression lock for the LATTICE hardening round.

The LATTICE_AUDIT_r15.md fixes (7 diverging keys) are enforced
out-of-band by ``tests/degenerate_audit.py --lattice``; this module
pins every fixed key INSIDE the pytest loop — the same discipline as
``test_shape_hardening.py`` for the r13/r14 frontiers.

Families and representatives (all seven fixes — the families are
disjoint, so no dedup to one-per-family):
- ordering pin (tie-break):          agg_mode
- ordering pin (distribution fn):    win_cume_percent
- NULL-partition keep branch:        sink_merge_upsert
- concat_ws over a NULL ARRAY:       ext_span_corruption
- weighted order statistic NULLs:    ext_weighted_median
- format_string vs printf on NULL:   fn_printf_format
- id-sorted fixture-file contract:   scan_file_metadata
- rank-statistic NULL step (t2):     ext_mann_whitney_u
- argmax/argmin tie-break (t3):      agg_max_by_min_by
- missing scorable gate (t4):        ext_hybrid_retrieval
- NULL daily point in DP (t5):       ext_dtw_bounded

Contract identical to the audit: both engines equal under the
driver-matched canonicalizer on the lattice fixtures.
"""

from __future__ import annotations

import duckdb
import pytest

from spark_sql_dsv2_extension_spark.registry import load_all
from spark_sql_dsv2_extension_spark.tables import TABLE_NAMES

from .parity import compare

_LATTICE_REPS = [
    "agg_mode",
    "win_cume_percent",
    "sink_merge_upsert",
    "ext_span_corruption",
    "ext_weighted_median",
    "fn_printf_format",
    "scan_file_metadata",
    "ext_mann_whitney_u",
    "agg_max_by_min_by",
    "ext_hybrid_retrieval",
    "ext_dtw_bounded",
]


@pytest.fixture(scope="module")
def lattice_sf_dir(tmp_path_factory) -> str:
    from .degenerate_audit import build_lattice_fixtures

    d = str(tmp_path_factory.mktemp("lattice_fixtures"))
    build_lattice_fixtures(d)
    return d


@pytest.fixture(scope="module")
def lattice_duck(lattice_sf_dir):
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{lattice_sf_dir}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", _LATTICE_REPS)
def test_lattice_family_representative(key, spark, lattice_duck, lattice_sf_dir):
    spec = load_all()[key]
    sdf = spec.fn(spark, lattice_sf_dir).toPandas()
    odf = lattice_duck.sql(spec.oracle).df()
    compare(sdf, odf, key)
