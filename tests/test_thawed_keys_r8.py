"""Edge-case and invariant tests for the 10 round-8 thaw registrations.

The oracle inventory (tests/test_parity.py) proves each key hash-matches
DuckDB on the shared fixtures; these tests pin behavior the fixtures
cannot reach — empty frames, boundary timestamps, degenerate series —
on CRAFTED parquet fixtures, plus fixture-independent invariants
(monotone recall curve, BFS-differential label propagation). All
test-only: no key's plan or registration changes here.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

TS0 = dt.datetime(2024, 1, 1, 0, 0, 0)  # a Monday (ISO), week-truncation anchor


def _write(tmp, name, table):
    pq.write_table(table, f"{tmp}/{name}.parquet")


def _docs(tmp, rows):
    _write(
        tmp,
        "documents",
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array(["t"] * len(rows), pa.string()),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
    )


def _events(tmp, rows):
    """rows: (event_id, ts, user_id, event_type, value)"""
    _write(
        tmp,
        "events",
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
    )


# ---------------------------------------------------------------------------
# ext_paragraph_dedup
# ---------------------------------------------------------------------------


def test_paragraph_dedup_short_doc_and_chunk_boundary(spark, tmp_path):
    from spark_sql_dsv2_extension_spark.extensions.dedup import (
        ext_paragraph_dedup,
    )

    shared16 = " ".join(f"w{i}" for i in range(16))  # exactly one chunk
    _docs(
        str(tmp_path),
        [
            (1, shared16),              # 16 words -> exactly 1 chunk
            (2, shared16),              # duplicate chunk, other doc
            (3, "short doc"),           # 2 words -> still 1 chunk
            (4, shared16 + " tail"),    # 17 words -> 2 chunks; chunk0 shared
        ],
    )
    out = {
        r["chunk_hash"]: r
        for r in ext_paragraph_dedup(spark, str(tmp_path)).collect()
    }
    assert len(out) == 1  # only the shared 16-word chunk recurs
    (row,) = out.values()
    assert row["n_occurrences"] == 3 and row["n_docs"] == 3
    assert row["keeper_doc"] == 1


def test_paragraph_dedup_all_unique_is_empty(spark, tmp_path):
    from spark_sql_dsv2_extension_spark.extensions.dedup import (
        ext_paragraph_dedup,
    )

    _docs(str(tmp_path), [(1, "alpha beta"), (2, "gamma delta")])
    assert ext_paragraph_dedup(spark, str(tmp_path)).count() == 0


# ---------------------------------------------------------------------------
# join_asof_tolerance
# ---------------------------------------------------------------------------


def test_asof_tolerance_boundaries_and_no_prior_click(spark, tmp_path):
    from spark_sql_dsv2_extension_spark.operators.joins import (
        join_asof_tolerance,
    )

    h = dt.timedelta(hours=1)
    _events(
        str(tmp_path),
        [
            (1, TS0, 7, "view", 0.0),               # before any click -> NULL
            (2, TS0 + h, 7, "click", 0.0),
            (3, TS0 + 2 * h, 7, "view", 0.0),       # exactly 1h after -> kept
            (4, TS0 + 2 * h + dt.timedelta(microseconds=1), 7, "view", 0.0),
            (5, TS0 + 9 * h, 7, "view", 0.0),       # stale -> NULL
            (6, TS0, 8, "view", 0.0),               # other user, no clicks
        ],
    )
    out = {
        r["event_id"]: r["asof_click_id_tol"]
        for r in join_asof_tolerance(spark, str(tmp_path)).collect()
    }
    assert out[1] is None
    assert out[3] == 2          # diff == tolerance: inclusive
    assert out[4] is None       # one microsecond beyond: dropped
    assert out[5] is None
    assert out[6] is None
    assert 2 not in out         # clicks themselves are not emitted


# ---------------------------------------------------------------------------
# join_interval_point_containment
# ---------------------------------------------------------------------------


def test_interval_containment_week_boundaries(spark, tmp_path):
    from spark_sql_dsv2_extension_spark.operators.joins import (
        join_interval_point_containment,
    )

    d = dt.timedelta
    _events(
        str(tmp_path),
        [
            (1, TS0, 1, "view", 1.0),                 # Monday = w_start
            (2, TS0 + d(days=3), 2, "view", 1.0),     # exactly w_end: kept
            (3, TS0 + d(days=3, microseconds=1), 3, "view", 1.0),  # out
            (4, TS0 + d(days=6), 4, "view", 1.0),     # Sunday: out
        ],
    )
    rows = join_interval_point_containment(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    (row,) = rows
    assert row["n_points"] == 2 and row["n_users"] == 2
    assert row["sum_value_micro"] == 2_000_000


# ---------------------------------------------------------------------------
# ext_holt_winters_additive
# ---------------------------------------------------------------------------


def test_holt_winters_single_day_and_gap_fill(spark, tmp_path):
    from spark_sql_dsv2_extension_spark.extensions.evaluation import (
        ext_holt_winters_additive,
    )

    _events(str(tmp_path), [(1, TS0, 1, "view", 2.5)])
    (row,) = ext_holt_winters_additive(spark, str(tmp_path)).collect()
    assert row["y_micro"] == 2_500_000
    assert row["level_micro"] == 2_500_000  # day 0: level = y
    assert row["trend_micro"] == 0
    assert row["forecast_next_micro"] == 2_500_000

    # a 2-day gap must appear as explicit zero days in the smoothed series
    _events(
        str(tmp_path),
        [(1, TS0, 1, "view", 1.0), (2, TS0 + dt.timedelta(days=3), 1, "view", 1.0)],
    )
    rows = ext_holt_winters_additive(spark, str(tmp_path)).orderBy("d").collect()
    assert [r["y_micro"] for r in rows] == [1_000_000, 0, 0, 1_000_000]
    # replay the integer recurrence in-test (alpha=.3, beta=.1)
    lvl, trend = rows[0]["level_micro"], rows[0]["trend_micro"]
    for r in rows[1:]:
        lp, bp = lvl, trend
        lvl = (3 * r["y_micro"] + 7 * (lp + bp)) // 10
        trend = (1 * (lvl - lp) + 9 * bp) // 10
        assert (r["level_micro"], r["trend_micro"]) == (lvl, trend)


# ---------------------------------------------------------------------------
# ext_anomaly_mad_rolling
# ---------------------------------------------------------------------------


def test_anomaly_mad_needs_seven_days_and_flags_spike(spark, tmp_path):
    from spark_sql_dsv2_extension_spark.extensions.evaluation import (
        ext_anomaly_mad_rolling,
    )

    day = dt.timedelta(days=1)
    # 6 days: no full trailing frame exists -> empty output
    _events(
        str(tmp_path),
        [(i, TS0 + i * day, 1, "view", 1.0) for i in range(6)],
    )
    assert ext_anomaly_mad_rolling(spark, str(tmp_path)).count() == 0

    # constant series: MAD = 0 and deviation = 0 -> never anomalous
    _events(
        str(tmp_path),
        [(i, TS0 + i * day, 1, "view", 1.0) for i in range(10)],
    )
    rows = ext_anomaly_mad_rolling(spark, str(tmp_path)).collect()
    assert len(rows) == 4  # days 7..10 have full frames
    assert not any(r["is_anomaly"] for r in rows)

    # one 100x spike on the last day is flagged
    _events(
        str(tmp_path),
        [(i, TS0 + i * day, 1, "view", 1.0) for i in range(9)]
        + [(9, TS0 + 9 * day, 1, "view", 100.0)],
    )
    rows = {
        r["d"].day: r for r in ext_anomaly_mad_rolling(spark, str(tmp_path)).collect()
    }
    assert rows[10]["is_anomaly"] is True
    assert not rows[8]["is_anomaly"]


# ---------------------------------------------------------------------------
# ext_shard_skew_rebalance
# ---------------------------------------------------------------------------


def test_shard_rebalance_uniform_shards_move_nothing(spark, tmp_path):
    from spark_sql_dsv2_extension_spark.extensions.multimodal import (
        ext_shard_skew_rebalance,
    )

    # 8 docs x 2048 bytes = exactly 2 docs per 4096-byte shard, all shards
    # equal to the average -> no doc's prefix exceeds 110% of the target
    _docs(str(tmp_path), [(i, "x" * 2048) for i in range(8)])
    assert ext_shard_skew_rebalance(spark, str(tmp_path)).count() == 0


# ---------------------------------------------------------------------------
# fixture-independent invariants (sf0.001 session fixtures)
# ---------------------------------------------------------------------------


def test_nprobe_recall_curve_is_monotone(spark, sf_dir):
    from spark_sql_dsv2_extension_spark.extensions.similarity import (
        ext_ann_ivf_nprobe_curve,
    )

    rows = ext_ann_ivf_nprobe_curve(spark, sf_dir).orderBy("nprobe").collect()
    assert [r["nprobe"] for r in rows] == [1, 2, 4]
    recalls = [r["recall6"] for r in rows]
    assert recalls == sorted(recalls)  # more probes never lose neighbors
    assert all(r["n_queries"] > 0 for r in rows)


def test_cascade_report_counts_are_sane(spark, sf_dir):
    from spark_sql_dsv2_extension_spark.extensions.dedup import (
        ext_dedup_cascade_report,
    )

    out = {
        r["stage"]: r["n"]
        for r in ext_dedup_cascade_report(spark, sf_dir).collect()
    }
    assert set(out) == {0, 1, 2}
    assert out[0] >= out[1] >= 0  # exact dedup never grows the corpus
    assert out[2] >= 0


def test_kll_invariant_true_on_crafted_uniform(spark, tmp_path):
    from spark_sql_dsv2_extension_spark.operators.aggregates import (
        agg_kll_quantile_invariant,
    )

    _write(
        str(tmp_path),
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(range(1000), pa.int64()),
                "l_partkey": pa.array([0] * 1000, pa.int64()),
                "l_suppkey": pa.array([0] * 1000, pa.int64()),
                "l_linenumber": pa.array([1] * 1000, pa.int32()),
                "l_quantity": pa.array([1.0] * 1000, pa.float64()),
                "l_extendedprice": pa.array(
                    [float(i) for i in range(1000)], pa.float64()
                ),
                "l_discount": pa.array([0.0] * 1000, pa.float64()),
                "l_tax": pa.array([0.0] * 1000, pa.float64()),
                "l_returnflag": pa.array(["A"] * 1000, pa.string()),
                "l_linestatus": pa.array(["O"] * 1000, pa.string()),
                "l_shipdate": pa.array([TS0] * 1000, pa.timestamp("us")),
            }
        ),
    )
    rows = agg_kll_quantile_invariant(spark, str(tmp_path)).collect()
    assert len(rows) == 3 and all(r["within_tol"] for r in rows)


def test_label_propagation_matches_bfs_min_label(spark, sf_dir):
    """Differential check AGAINST AN INDEPENDENT ALGORITHM (not the SQL
    oracle): after k synchronous min-label rounds every node must carry
    exactly min(node ∪ k-hop neighborhood) — recomputed here by plain
    BFS over the collected edge list."""
    from spark_sql_dsv2_extension_spark.extensions.similarity import (
        _mutual_edges,
        _LP_ROUNDS,
        ext_label_propagation_bounded,
    )

    edges = [
        (r["u"], r["v"]) for r in _mutual_edges(spark, sf_dir).collect()
    ]
    # symmetry: the union-of-both-directions construction
    eset = set(edges)
    assert all((v, u) in eset for u, v in eset)

    adj: dict[int, set[int]] = {}
    for u, v in eset:
        adj.setdefault(u, set()).add(v)
    expected = {}
    for node in adj:
        frontier, seen = {node}, {node}
        for _ in range(_LP_ROUNDS):
            frontier = {
                w for x in frontier for w in adj.get(x, ()) if w not in seen
            }
            seen |= frontier
        expected[node] = min(seen)

    got = {
        r["node"]: r[f"label_r{_LP_ROUNDS}"]
        for r in ext_label_propagation_bounded(spark, sf_dir).collect()
    }
    assert got == expected
