"""In-suite regression lock for the round-12 adversarial-VALUE hardening.

The EXTREME_AUDIT_r11.md fixes (54 diverging keys across families X1-X4,
closed in round 12) are enforced out-of-band by
``tests/degenerate_audit.py --extreme``; this module pins ONE
representative key per family INSIDE the pytest loop — the same
discipline as ``test_null_hardening.py`` for the round-11 NULL families —
plus one bespoke scenario the shared fixtures cannot reach (the BPE
merged-word collapse).

- X1 (zero-norm embedding gate):   ext_knn_cosine (_emb_scorable +
                                   the MATERIALIZED scorable oracle CTE)
- X2 (micro-int scaling bound):    ext_kmeans_train (component-magnitude
                                   gate, the X1 gate's sibling)
- X3 (non-scalar JSON try_cast):   fn_json
- X4 (scalar-convention pins):     udaf_pandas_grouped (SQL
                                   half-away-from-zero in the worker,
                                   not pandas banker's rounding)

Contract identical to the audit: both engines equal under the
driver-matched canonicalizer on the adversarial-value fixtures.
"""

from __future__ import annotations

import duckdb
import pytest

from spark_sql_dsv2_extension_spark.registry import load_all
from spark_sql_dsv2_extension_spark.tables import TABLE_NAMES

from .parity import compare

_FAMILY_REPS = [
    "ext_knn_cosine",
    "ext_kmeans_train",
    "fn_json",
    "udaf_pandas_grouped",
]

# chaos-frontier representatives (round-12 close): one per fix class —
# NULL-rank exclusion from histogram order statistics, and the
# decimal/HUGEINT weighted-moment widening (the streaming epoch-0
# quarantine is covered out-of-band by the --chaos sweep; a streaming
# harness inside this module would dominate its runtime)
_CHAOS_REPS = [
    "agg_salted_twophase",
    "ext_time_weighted_avg",
]


@pytest.fixture(scope="module")
def extreme_sf_dir(tmp_path_factory) -> str:
    from .degenerate_audit import build_extreme_fixtures

    d = str(tmp_path_factory.mktemp("extreme_fixtures"))
    build_extreme_fixtures(d)
    return d


@pytest.fixture(scope="module")
def extreme_duck(extreme_sf_dir):
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{extreme_sf_dir}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", _FAMILY_REPS)
def test_extreme_family_representative(key, spark, extreme_duck, extreme_sf_dir):
    spec = load_all()[key]
    sdf = spec.fn(spark, extreme_sf_dir).toPandas()
    odf = extreme_duck.sql(spec.oracle).df()
    compare(sdf, odf, key)


@pytest.fixture(scope="module")
def chaos_sf_dir(tmp_path_factory) -> str:
    from .degenerate_audit import build_chaos_fixtures

    d = str(tmp_path_factory.mktemp("chaos_fixtures"))
    build_chaos_fixtures(d)
    return d


@pytest.fixture(scope="module")
def chaos_duck(chaos_sf_dir):
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{chaos_sf_dir}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", _CHAOS_REPS)
def test_chaos_family_representative(key, spark, chaos_duck, chaos_sf_dir):
    spec = load_all()[key]
    sdf = spec.fn(spark, chaos_sf_dir).toPandas()
    odf = chaos_duck.sql(spec.oracle).df()
    compare(sdf, odf, key)


def test_bpe_merged_word_collapse(spark, tmp_path):
    """ADVICE-r11 high: a word EQUAL to the winning pair collapses to a
    single chr(n) symbol after the merge; pair extraction must then skip
    it (the oracle's range(1, length) is empty for length-1 words) instead
    of Spark's sequence(1, 0) stepping DESCENDING and emitting two
    spurious 1-char pairs. Corpus crafted so the round-1 winner 'in' is
    also a frequent standalone 2-char word — the exact divergence trigger
    the shared fixtures never reach."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [
        "in in in training",
        "inin in winning",
        "in begin",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["t"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    spec = load_all()["ext_bpe_train_k_rounds"]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path / 'documents.parquet'}')"
        )
        sdf = spec.fn(spark, str(tmp_path)).toPandas()
        odf = con.sql(spec.oracle).df()
    finally:
        con.close()
    compare(sdf, odf, "ext_bpe_train_k_rounds[collapse]")
    # the crafted corpus must actually exercise the collapse: round 1
    # merges 'in' (which IS a standalone word), so a length-1 word exists
    # when round 2 extracts pairs
    assert odf.sort_values("round").iloc[0]["merged_pair"] == "in"
