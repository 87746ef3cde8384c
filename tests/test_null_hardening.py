"""In-suite regression lock for the round-11 NULL hardening.

The 52 NULL-input fixes (NULL_AUDIT_r10.md, closed in round 11) are
enforced out-of-band by ``tests/degenerate_audit.py --nulls``; this
module pins ONE representative key per family INSIDE the pytest loop so
a regression in any family's idiom fails CI immediately instead of
waiting for the next full audit sweep. Keys are chosen fast (pure batch
plans, no streaming harness) and load-bearing for their family's shared
fix shape:

- N1 (NULL-ordering pins):        win_row_number (asc_nulls_last)
- N2 (worker None-guards):        udf_python_scalar (guard-to-NULL)
- N3 (embedding NOT-NULL gate):   ext_retrieval_auc (_emb_nonnull +
                                  the MATERIALIZED oracle CTE)
- N4 (multi-arg distinct):        ext_functional_dependency
- N5 (scalar NULL semantics):     fn_map_hof (the NULL_MAP_KEY gate)
- N6 (zero denominators):         ext_spearman_corr (pre-filter +
                                  try_divide)

Contract identical to the audit: both engines equal under the
driver-matched canonicalizer on the NULL-bearing fixtures.
"""

from __future__ import annotations

import duckdb
import pytest

from spark_sql_dsv2_extension_spark.registry import load_all
from spark_sql_dsv2_extension_spark.tables import TABLE_NAMES

from .parity import compare

_FAMILY_REPS = [
    "win_row_number",
    "udf_python_scalar",
    "ext_retrieval_auc",
    "ext_functional_dependency",
    "fn_map_hof",
    "ext_spearman_corr",
]


@pytest.fixture(scope="module")
def null_sf_dir(tmp_path_factory) -> str:
    from .degenerate_audit import build_null_fixtures

    d = str(tmp_path_factory.mktemp("null_fixtures"))
    build_null_fixtures(d)
    return d


@pytest.fixture(scope="module")
def null_duck(null_sf_dir):
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{null_sf_dir}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", _FAMILY_REPS)
def test_null_family_representative(key, spark, null_duck, null_sf_dir):
    spec = load_all()[key]
    sdf = spec.fn(spark, null_sf_dir).toPandas()
    odf = null_duck.sql(spec.oracle).df()
    compare(sdf, odf, key)
