"""Edge-case and invariant tests for the 5 round-9 tranche-2 registrations.

The oracle inventory (tests/test_parity.py) proves each key hash-matches
DuckDB on the shared fixtures; these tests pin behavior the fixtures
cannot reach — weighted-median tie/boundary weights, one-point DBSCAN
clusters, single-valued sensitive attributes, identical embedding
clouds — on CRAFTED parquet fixtures, plus fixture-independent
invariants (bloom sizing vs a float recomputation, energy distance of a
cloud against itself). All test-only: no key's plan or registration
changes here.
"""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp, name, table):
    pq.write_table(table, f"{tmp}/{name}.parquet")


def _lineitem(tmp, rows):
    """rows: (flag, quantity, extendedprice)"""
    n = len(rows)
    _write(
        tmp,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(range(n), pa.int64()),
                "l_partkey": pa.array([0] * n, pa.int64()),
                "l_suppkey": pa.array([0] * n, pa.int64()),
                "l_linenumber": pa.array([1] * n, pa.int32()),
                "l_quantity": pa.array([r[1] for r in rows], pa.float64()),
                "l_extendedprice": pa.array([r[2] for r in rows], pa.float64()),
                "l_discount": pa.array([0.0] * n, pa.float64()),
                "l_tax": pa.array([0.0] * n, pa.float64()),
                "l_returnflag": pa.array([r[0] for r in rows], pa.string()),
                "l_linestatus": pa.array(["O"] * n, pa.string()),
                "l_shipdate": pa.array([0] * n, pa.timestamp("us")),
            }
        ),
    )


def _customer(tmp, rows):
    """rows: (custkey, nationkey, acctbal, mktsegment)"""
    _write(
        tmp,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
                "c_name": pa.array([f"c{r[0]}" for r in rows], pa.string()),
                "c_nationkey": pa.array([r[1] for r in rows], pa.int32()),
                "c_acctbal": pa.array([r[2] for r in rows], pa.float64()),
                "c_mktsegment": pa.array([r[3] for r in rows], pa.string()),
            }
        ),
    )


def _padded(vec):
    """Zero-pad a toy vector to the declared width 64; an OVERSIZED
    vector must fail loudly here (r13 ADVICE: the negative list-repeat
    would silently no-op and the Family-W gate would then quarantine the
    row, surfacing as a confusing empty result instead of this error)."""
    assert len(vec) <= 64, f"toy embedding wider than EMB_DIM=64: {len(vec)}"
    return vec + [0.0] * (64 - len(vec))


def _embeddings(tmp, rows):
    """rows: (vec_id, [floats], label).

    Vectors are zero-padded to the engine's declared width (EMB_DIM = 64,
    the round-13 Family-W gate — RAGGED_AUDIT_r13.md): an off-width vector
    is quarantined as a broken encode, and these tests pin GEOMETRY, which
    zero components leave untouched (dot products, norms, and Euclidean
    distances are all invariant under trailing zeros)."""
    _write(
        tmp,
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array(
                    [_padded(r[1]) for r in rows],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([r[2] for r in rows], pa.int32()),
            }
        ),
    )


def _documents(tmp, rows):
    """rows: (doc_id, source)"""
    _write(
        tmp,
        "documents",
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array(["x"] * len(rows), pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array([r[1] for r in rows], pa.string()),
                "n_chars": pa.array([1] * len(rows), pa.int64()),
            }
        ),
    )


# ---------------------------------------------------------------------------
# ext_weighted_median
# ---------------------------------------------------------------------------


def test_weighted_median_boundary_and_unit_weights(spark, tmp_path):
    """With unit weights the weighted median is the lower classic median
    (first price where 2*cum >= total); a heavy single row drags the
    median onto itself; the exact 2*cw == tw tie picks the LOWER price
    (the <= convention both engines share)."""
    from spark_sql_dsv2_extension_spark.extensions.evaluation import (
        ext_weighted_median,
    )

    _lineitem(
        str(tmp_path),
        # flag A: unit weights over 10/20/30/40 -> 2*cw==tw exactly at 20
        [("A", 1.0, 10.0), ("A", 1.0, 20.0), ("A", 1.0, 30.0), ("A", 1.0, 40.0)]
        # flag B: weight 9 at price 99 dominates two unit rows
        + [("B", 9.0, 99.0), ("B", 1.0, 1.0), ("B", 1.0, 2.0)]
        # flag C: single row -> its own median
        + [("C", 5.0, 7.0)],
    )
    out = {
        r["l_returnflag"]: r["weighted_median"]
        for r in ext_weighted_median(spark, str(tmp_path)).collect()
    }
    assert out == {"A": 20.0, "B": 99.0, "C": 7.0}


def test_weighted_median_duplicate_prices_collapse(spark, tmp_path):
    """Duplicate (flag, price) rows must collapse into ONE weighted point
    before the cumulative sum — 3 rows of weight 1 at price 5 behave
    exactly like one row of weight 3."""
    from spark_sql_dsv2_extension_spark.extensions.evaluation import (
        ext_weighted_median,
    )

    _lineitem(
        str(tmp_path),
        [("A", 1.0, 5.0), ("A", 1.0, 5.0), ("A", 1.0, 5.0), ("A", 2.0, 9.0)],
    )
    (row,) = ext_weighted_median(spark, str(tmp_path)).collect()
    # total weight 5, half = 2.5 -> cumulative 3 at price 5 already passes
    assert row["weighted_median"] == 5.0


# ---------------------------------------------------------------------------
# ext_dbscan_core_points
# ---------------------------------------------------------------------------


def test_dbscan_identical_cloud_all_core(spark, tmp_path):
    """Identical embeddings: every pair has cosine 1, so with n=5 > minPts
    every point is core with exactly n-1 neighbors (the degenerate-audit
    case — saturates identically on both engines, no gate)."""
    from spark_sql_dsv2_extension_spark.extensions.similarity import (
        ext_dbscan_core_points,
    )

    _embeddings(str(tmp_path), [(i, [1.0, 0.0, 0.0], 0) for i in range(5)])
    rows = ext_dbscan_core_points(spark, str(tmp_path)).collect()
    assert len(rows) == 5
    assert all(r["n_neighbors"] == 4 and r["is_core"] for r in rows)


def test_dbscan_noise_point_not_core(spark, tmp_path):
    """A 4-point tight cluster plus one orthogonal outlier: cluster
    members are core (3 neighbors each at cosine 1 >= 0.25), the
    orthogonal point has zero neighbors and is noise."""
    from spark_sql_dsv2_extension_spark.extensions.similarity import (
        ext_dbscan_core_points,
    )

    _embeddings(
        str(tmp_path),
        [(i, [1.0, 0.0, 0.0], 0) for i in range(4)]
        + [(4, [0.0, 1.0, 0.0], 0)],
    )
    out = {
        r["vec_id"]: r for r in ext_dbscan_core_points(spark, str(tmp_path)).collect()
    }
    assert all(out[i]["is_core"] for i in range(4))
    assert out[4]["n_neighbors"] == 0 and not out[4]["is_core"]


# ---------------------------------------------------------------------------
# ext_l_diversity_audit
# ---------------------------------------------------------------------------


def test_l_diversity_homogeneous_group_at_risk(spark, tmp_path):
    """A LARGE group with one sensitive bucket is exactly what k-anonymity
    passes and l-diversity must flag: 10 members, all acctbal in the
    same floor(x/2000) bucket -> l_distinct=1, at_risk. A small group
    spanning 3 buckets is safe."""
    from spark_sql_dsv2_extension_spark.extensions.curation import (
        ext_l_diversity_audit,
    )

    _customer(
        str(tmp_path),
        # nation 1 / AUTO: 10 customers, balances 0..1999 (one bucket)
        [(i, 1, 100.0 + i, "AUTO") for i in range(10)]
        # nation 2 / AUTO: 3 customers in buckets 0, 1, 2
        + [(100, 2, 100.0, "AUTO"), (101, 2, 2100.0, "AUTO"), (102, 2, 4100.0, "AUTO")],
    )
    out = {
        (r["c_nationkey"], r["c_mktsegment"]): r
        for r in ext_l_diversity_audit(spark, str(tmp_path)).collect()
    }
    g1 = out[(1, "AUTO")]
    assert g1["group_n"] == 10 and g1["l_distinct"] == 1 and g1["at_risk"]
    g2 = out[(2, "AUTO")]
    assert g2["group_n"] == 3 and g2["l_distinct"] == 3 and not g2["at_risk"]
    # invariant: l_distinct never exceeds group size
    assert all(r["l_distinct"] <= r["group_n"] for r in out.values())


def test_l_diversity_negative_balance_bucket(spark, tmp_path):
    """floor() on negatives must bucket consistently: -1.0 -> bucket -1,
    not 0 — so a group holding {-1.0, 1.0, 2100.0} spans 3 buckets."""
    from spark_sql_dsv2_extension_spark.extensions.curation import (
        ext_l_diversity_audit,
    )

    _customer(
        str(tmp_path),
        [(1, 1, -1.0, "AUTO"), (2, 1, 1.0, "AUTO"), (3, 1, 2100.0, "AUTO")],
    )
    (row,) = ext_l_diversity_audit(spark, str(tmp_path)).collect()
    assert row["l_distinct"] == 3 and not row["at_risk"]


# ---------------------------------------------------------------------------
# ext_energy_distance
# ---------------------------------------------------------------------------


def test_energy_distance_identical_clouds_exact_algebra(spark, tmp_path):
    """Two identical 2-point clouds pin the estimator's exact algebra:
    the between term averages ALL n² pairs (including the four
    matching-point zeros), the within terms average i<j pairs only, so
    identical clouds read 2·(2d/4) − d − d = −d — the small negative
    bias this V/U-statistic mix carries by construction, identically on
    both engines (the oracle encodes the same pair sets)."""
    from spark_sql_dsv2_extension_spark.extensions.evaluation import (
        ext_energy_distance,
    )

    # clouds: X = Y = {(0,0), (3,4)}  ->  |X−Y| pairs: 0,5,5,0 ; within: 5
    _embeddings(
        str(tmp_path),
        [(0, [0.0, 0.0], 0), (1, [3.0, 4.0], 0), (2, [0.0, 0.0], 1), (3, [3.0, 4.0], 1)],
    )
    (row,) = ext_energy_distance(spark, str(tmp_path)).collect()
    d = 5_000_000  # micro-units for distance 5
    assert row["energy6"] == round(2 * (2 * d / 4) - d / 1 - d / 1) == -d
    assert (row["nxy"], row["nxx"], row["nyy"]) == (4, 1, 1)


def test_energy_distance_shifted_cloud_positive(spark, tmp_path):
    """Shift one cloud far away: energy distance must be large positive
    (≈ 2·shift once the clouds are tight relative to the shift)."""
    from spark_sql_dsv2_extension_spark.extensions.evaluation import (
        ext_energy_distance,
    )

    _embeddings(
        str(tmp_path),
        [(0, [0.0, 0.0], 0), (1, [0.0, 1.0], 0), (2, [100.0, 0.0], 1), (3, [100.0, 1.0], 1)],
    )
    (row,) = ext_energy_distance(spark, str(tmp_path)).collect()
    # within-cloud mean distance = 1, between ≈ 100 -> E ≈ 2·100 − 1 − 1
    assert 190_000_000 < row["energy6"] < 210_000_000


# ---------------------------------------------------------------------------
# ext_bloom_size_planner
# ---------------------------------------------------------------------------


def test_bloom_size_planner_matches_float_formula(spark, tmp_path):
    """The integer-only plan must track ceil(n·ln(1/p)/ln²2) and
    round(m/n·ln2) computed in floats to within 1 bit / 0 hashes —
    the micro-unit literals were chosen for exactly that."""
    from spark_sql_dsv2_extension_spark.extensions.sketches import (
        ext_bloom_size_planner,
    )

    _documents(
        str(tmp_path),
        [(i, "big") for i in range(1000)] + [(10_000 + i, "tiny") for i in range(7)],
    )
    rows = ext_bloom_size_planner(spark, str(tmp_path)).collect()
    assert len(rows) == 4  # 2 sources × 2 FPP targets
    p_of = {"p_1pct": 0.01, "p_0_1pct": 0.001}
    for r in rows:
        p = p_of[r["fpp_label"]]
        n = r["n_docs"]
        m_float = math.ceil(n * math.log(1 / p) / (math.log(2) ** 2))
        k_float = round(r["m_bits"] / n * math.log(2))
        assert abs(r["m_bits"] - m_float) <= 1, (r, m_float)
        assert r["k_hashes"] == k_float >= 1, (r, k_float)
    # more docs at the same FPP -> strictly more bits
    by = {(r["source"], r["fpp_label"]): r["m_bits"] for r in rows}
    assert by[("big", "p_1pct")] > by[("tiny", "p_1pct")]
