"""Round-9 thaw-candidate oracle validation (second tranche, drafted round 7).

ROUND-9 STATUS: 5 of the 12 were registered (one commit each, per the
thaw rule; the cap is the r8 verdict ask #3 — the round-9 driver window
had exactly 5 spare slots after the 44-key queue and the deliberate
ext_spearman_corr re-front): ``ext_weighted_median``,
``ext_dbscan_core_points``, ``ext_l_diversity_audit``,
``ext_energy_distance``, ``ext_bloom_size_planner``. The registered
copies in the extension modules are now the source of truth for those
keys; the prototypes/oracles here are retained as the validation
record.

ROUND-10 STATUS: 6 of the 7 deferred candidates were registered (one
commit each — ``stream_stream_full_outer``, ``ext_degree_assortativity``,
``ext_holt_winters_seasonal``, ``ext_mips_cosine_reduction``,
``ext_random_projection_jl``, ``ext_sax_symbols``; the sixth slot came
from the reallocated fuzzy-levenshtein perf re-front). ROUND-11 STATUS: ``ext_hits_bounded`` — the last candidate — was
registered (extensions/similarity.py) with the Family-N3
NULL-embedding gate added to both sides; the tranche is now fully
on-registry and this file is retained purely as the validation
record.

Run: ``python tests/thaw_oracles_r9.py`` (not pytest-collected). Same
harness as tests/thaw_oracles_r8.py: each candidate oracle runs twice
against sf0.01 DuckDB, checking execution, determinism, and sane rows.
These 12 candidates extend families the registry already covers (graph,
clustering QA, privacy, order statistics, time series, ANN theory,
streaming joins, sketch planning) and target ROUND-9 registration, after
the r8 thaw tranche; the freeze discipline and the one-commit thaw rule in
registry.py apply unchanged. Results + design notes: ROADMAP_r9.md.
"""
import duckdb, hashlib, os, sys

SF = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def connect():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


COS = """list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
         (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
          sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))"""

# directed top-5 kNN edges over the first 100 vectors (the mutual-kNN
# oracle's topk CTE, kept directed)
TOPK_EDGES = f"""
    pairs AS (
      SELECT a.vec_id AS u, b.vec_id AS v, {COS} AS sim
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
      WHERE a.vec_id < 100 AND b.vec_id < 100
    ), ranked AS (
      SELECT u, v, sim,
             row_number() OVER (PARTITION BY u ORDER BY sim DESC, v) AS rk
      FROM pairs
    ), topk AS (
      SELECT u, v FROM ranked WHERE rk <= 5
    )
"""

MUTUAL_EDGES = TOPK_EDGES + """
    , mutual AS (
      SELECT a.u AS d1, a.v AS d2
      FROM topk a JOIN topk b ON a.u = b.v AND a.v = b.u
      WHERE a.u < a.v
    ), edges AS (
      SELECT d1 AS u, d2 AS v FROM mutual
      UNION ALL
      SELECT d2 AS u, d1 AS v FROM mutual
    )
"""

ORACLES = {}

# 1. stream_stream_full_outer — batch FULL JOIN equivalent of the
#    watermarked stream-stream join (sentinel-flush idiom on both sides).
ORACLES["stream_stream_full_outer"] = """
    SELECT coalesce(c.user_id, p.user_id) AS user_id,
           CAST(floor(epoch(c.ts)) AS BIGINT) AS click_epoch,
           CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_epoch
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 120 MINUTE
"""

# 2. ext_dbscan_core_points — eps-neighborhood counts at cosine >= 0.25,
#    core = >= 3 neighbors (first 100 vectors; scale path = LSH buckets).
ORACLES["ext_dbscan_core_points"] = f"""
    WITH sims AS (
      SELECT a.vec_id AS u, {COS} AS sim
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
      WHERE a.vec_id < 100 AND b.vec_id < 100
    )
    SELECT u AS vec_id,
           CAST(count(CASE WHEN sim >= 0.25 THEN 1 END) AS BIGINT) AS n_neighbors,
           count(CASE WHEN sim >= 0.25 THEN 1 END) >= 3 AS is_core
    FROM sims GROUP BY u
"""

# 3. ext_degree_assortativity — Pearson r of (deg u, deg v) over directed
#    mutual edges; integer sums, one final rounded division.
ORACLES["ext_degree_assortativity"] = (
    "WITH " + MUTUAL_EDGES + """
    , deg AS (
      SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY u
    ), de AS (
      SELECT du.d AS x, dv.d AS y
      FROM edges e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node
    ), s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM de
    )
    SELECT n AS n_edges,
           round((n * sxy - sx * sy) /
                 (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
             AS assortativity6
    FROM s
    -- degenerate gate (r8 audit): zero degree variance -> zero rows
    WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """
)

# 4. ext_hits_bounded — 2 unnormalized integer HITS rounds on the DIRECTED
#    top-5 kNN graph; hub/auth stay exact int64.
ORACLES["ext_hits_bounded"] = (
    "WITH " + TOPK_EDGES + """
    , a1 AS (
      SELECT v AS node, CAST(count(*) AS BIGINT) AS a FROM topk GROUP BY v
    ), h1 AS (
      SELECT t.u AS node, CAST(SUM(coalesce(a1.a, 0)) AS BIGINT) AS h
      FROM topk t LEFT JOIN a1 ON t.v = a1.node GROUP BY t.u
    ), a2 AS (
      SELECT t.v AS node, CAST(SUM(coalesce(h1.h, 0)) AS BIGINT) AS a
      FROM topk t LEFT JOIN h1 ON t.u = h1.node GROUP BY t.v
    ), h2 AS (
      SELECT t.u AS node, CAST(SUM(coalesce(a2.a, 0)) AS BIGINT) AS h
      FROM topk t LEFT JOIN a2 ON t.v = a2.node GROUP BY t.u
    ), nodes AS (
      SELECT u AS node FROM topk UNION SELECT v FROM topk
    )
    SELECT n.node, coalesce(h2.h, 0) AS hub2, coalesce(a2.a, 0) AS auth2
    FROM nodes n
    LEFT JOIN h2 ON n.node = h2.node
    LEFT JOIN a2 ON n.node = a2.node
    ORDER BY hub2 DESC, n.node LIMIT 20
    """
)

# 5. ext_l_diversity_audit — l-diversity over the k-anonymity key's QI
#    pair with a bucketed sensitive attribute (acctbal / 2000).
ORACLES["ext_l_diversity_audit"] = """
    SELECT c_nationkey, c_mktsegment,
           CAST(count(*) AS BIGINT) AS group_n,
           CAST(count(DISTINCT CAST(floor(c_acctbal / 2000) AS BIGINT))
                AS BIGINT) AS l_distinct,
           count(DISTINCT CAST(floor(c_acctbal / 2000) AS BIGINT)) < 3
             AS at_risk
    FROM customer GROUP BY c_nationkey, c_mktsegment
"""

# 6. ext_weighted_median — per-flag weighted median of extendedprice by
#    integer quantity weight; exact via grouped weights + cumulative sums.
ORACLES["ext_weighted_median"] = """
    WITH pw AS (
      SELECT l_returnflag, l_extendedprice AS p,
             CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS wgt
      FROM lineitem GROUP BY 1, 2
    ), cum AS (
      SELECT l_returnflag, p, wgt,
             SUM(wgt) OVER (PARTITION BY l_returnflag ORDER BY p
                            ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(wgt) OVER (PARTITION BY l_returnflag) AS tw
      FROM pw
    )
    SELECT l_returnflag, min(p) AS weighted_median
    FROM cum WHERE 2 * cw >= tw GROUP BY l_returnflag
"""

# 7. ext_energy_distance — energy distance between label-0 and label-1
#    embedding clouds; per-pair micro-int distances, exact int sums,
#    one final float combination of exact ints.
_ED_D = """CAST(round(1000000 * sqrt(list_sum(list_transform(
             range(1, len(a.embedding) + 1),
             i -> (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))
                  * (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))))))
           AS BIGINT)"""
ORACLES["ext_energy_distance"] = f"""
    WITH x AS (SELECT vec_id, embedding FROM embeddings WHERE label = 0),
         y AS (SELECT vec_id, embedding FROM embeddings WHERE label = 1),
    dxy AS (
      SELECT {_ED_D} AS d6 FROM x a JOIN y b ON true
    ), dxx AS (
      SELECT {_ED_D} AS d6 FROM x a JOIN x b ON a.vec_id < b.vec_id
    ), dyy AS (
      SELECT {_ED_D} AS d6 FROM y a JOIN y b ON a.vec_id < b.vec_id
    ), s AS (
      SELECT (SELECT CAST(SUM(d6) AS BIGINT) FROM dxy) AS sxy,
             (SELECT CAST(count(*) AS BIGINT) FROM dxy) AS nxy,
             (SELECT CAST(SUM(d6) AS BIGINT) FROM dxx) AS sxx,
             (SELECT CAST(count(*) AS BIGINT) FROM dxx) AS nxx,
             (SELECT CAST(SUM(d6) AS BIGINT) FROM dyy) AS syy,
             (SELECT CAST(count(*) AS BIGINT) FROM dyy) AS nyy
    )
    SELECT nxy, nxx, nyy,
           CAST(round(2.0 * sxy / nxy - 1.0 * sxx / nxx - 1.0 * syy / nyy)
                AS BIGINT) AS energy6
    FROM s
"""

# 8. ext_holt_winters_seasonal — additive triple smoothing, weekly season
#    as a 7-slot integer ring carried through the recursive CTE.
#    alpha=0.3 beta=0.1 gamma=0.2, all floor(x/10).
ORACLES["ext_holt_winters_seasonal"] = """
    WITH RECURSIVE daily AS (
      SELECT date_trunc('day', ts) AS d,
             CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1
    ), cal AS (
      SELECT unnest(generate_series(
               (SELECT min(d) FROM daily),
               (SELECT max(d) FROM daily), INTERVAL 1 DAY)) AS d
    ), series AS (
      SELECT cal.d, coalesce(daily.y, 0) AS y,
             CAST(row_number() OVER (ORDER BY cal.d) AS BIGINT) AS i
      FROM cal LEFT JOIN daily ON cal.d = daily.d
    ), hw AS (
      SELECT i, d, y, y AS lvl, CAST(0 AS BIGINT) AS b,
             CAST(0 AS BIGINT) AS seas_used,
             CAST(0 AS BIGINT) AS s1, CAST(0 AS BIGINT) AS s2,
             CAST(0 AS BIGINT) AS s3, CAST(0 AS BIGINT) AS s4,
             CAST(0 AS BIGINT) AS s5, CAST(0 AS BIGINT) AS s6,
             CAST(0 AS BIGINT) AS s7
      FROM series WHERE i = 1
      UNION ALL
      SELECT s.i, s.d, s.y,
             CAST(floor((3 * (s.y - hw.s1) + 7 * (hw.lvl + hw.b)) / 10.0)
                  AS BIGINT) AS lvl,
             CAST(floor((1 * (CAST(floor((3 * (s.y - hw.s1)
                                           + 7 * (hw.lvl + hw.b)) / 10.0)
                              AS BIGINT) - hw.lvl) + 9 * hw.b) / 10.0)
                  AS BIGINT) AS b,
             hw.s1 AS seas_used,
             hw.s2, hw.s3, hw.s4, hw.s5, hw.s6, hw.s7,
             CAST(floor((2 * (s.y - CAST(floor((3 * (s.y - hw.s1)
                                                + 7 * (hw.lvl + hw.b)) / 10.0)
                                        AS BIGINT)) + 8 * hw.s1) / 10.0)
                  AS BIGINT) AS s7
      FROM hw JOIN series s ON s.i = hw.i + 1
    )
    SELECT d, y AS y_micro, lvl AS level_micro, b AS trend_micro,
           seas_used AS seasonal_micro,
           lvl + b + s1 AS forecast_next_micro
    FROM hw ORDER BY d
"""

# 9. ext_mips_cosine_reduction — the MIPS->cosine augmentation invariant:
#    top-5 by raw inner product == top-5 by augmented cosine (norm pad to
#    the global max norm M), per query. n_agree must be 5 for all.
ORACLES["ext_mips_cosine_reduction"] = """
    WITH norms AS (
      SELECT vec_id, embedding,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    ), m AS (
      SELECT max(nrm) AS mx FROM norms
    ), ip AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS raw_ip,
             list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
               (a.nrm * m.mx) AS aug_cos
      FROM norms a JOIN norms b ON a.vec_id <> b.vec_id CROSS JOIN m
      WHERE a.vec_id < 16
    ), r1 AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY raw_ip DESC, neighbor_id) AS rk
      FROM ip
    ), r2 AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY aug_cos DESC, neighbor_id) AS rk
      FROM ip
    )
    SELECT a.query_id, CAST(count(*) AS BIGINT) AS n_agree
    FROM (SELECT * FROM r1 WHERE rk <= 5) a
    JOIN (SELECT * FROM r2 WHERE rk <= 5) b
      ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
    GROUP BY a.query_id
"""

# 10. ext_random_projection_jl — 64->16 signed projection with an LCG-
#     parity sign matrix; distance-preservation ratio per adjacent pair.
#     Projection folds over the FIXED array order on both engines.
ORACLES["ext_random_projection_jl"] = """
    WITH pairs AS (
      SELECT a.vec_id AS u, b.vec_id AS v,
             list_transform(range(1, 65),
               i -> CAST(a.embedding[i] AS DOUBLE)
                    - CAST(b.embedding[i] AS DOUBLE)) AS diff
      FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
      WHERE a.vec_id < 50
    ), proj AS (
      SELECT u, v,
             list_sum(list_transform(range(1, 65), i -> diff[i] * diff[i]))
               AS orig_d2,
             list_transform(range(1, 17), j ->
               list_sum(list_transform(range(1, 65), i ->
                 CASE WHEN (1103515245 * ((i - 1) * 16 + j) + 12345) % 2 = 0
                      THEN diff[i] ELSE -diff[i] END))) AS pvec
      FROM pairs
    ), pd AS (
      SELECT u, v, orig_d2,
             list_sum(list_transform(pvec, p -> p * p)) AS proj_d2
      FROM proj
    )
    SELECT u, v,
           CAST(round(1000000 * proj_d2 / (16 * orig_d2)) AS BIGINT) AS ratio6,
           (proj_d2 / (16 * orig_d2) BETWEEN 0.2 AND 3.0) AS within_jl
    FROM pd
    WHERE orig_d2 > 0  -- degenerate gate (r8 audit): identical pair
"""

# 11. ext_sax_symbols — SAX letters (alphabet 4) over the z-scored daily
#     series; milli-unit integer moments, fixed breakpoint literals.
ORACLES["ext_sax_symbols"] = """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d,
             CAST(SUM(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1
    ), s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS sx,
             CAST(SUM(y * y) AS BIGINT) AS sxx
      FROM daily
    ), z AS (
      SELECT d, y,
             (y - 1.0 * sx / n) /
             sqrt((1.0 * n * sxx - 1.0 * sx * sx) / (1.0 * n * n)) AS zv
      FROM daily, s
      -- degenerate gate (r8 audit): constant series -> zero rows
      WHERE n * sxx - sx * sx > 0
    )
    SELECT d, y AS y_milli, CAST(round(1000000 * zv) AS BIGINT) AS z6,
           CASE WHEN zv < -0.6744897501960817 THEN 'a'
                WHEN zv < 0.0 THEN 'b'
                WHEN zv < 0.6744897501960817 THEN 'c'
                ELSE 'd' END AS sax_letter
    FROM z
"""

# 12. ext_bloom_size_planner — per-source Bloom sizing for fixed fpp via
#     embedded micro-int constants (ln(1/p)/ln^2(2), ln 2); all-integer.
ORACLES["ext_bloom_size_planner"] = """
    WITH n AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ), fpp AS (
      SELECT * FROM (VALUES ('p_1pct', CAST(9585058 AS BIGINT)),
                            ('p_0_1pct', CAST(14377588 AS BIGINT)))
        AS t(fpp_label, c_micro)
    ), m AS (
      SELECT source, n_docs, fpp_label,
             (n_docs * c_micro + 999999) // 1000000 AS m_bits
      FROM n, fpp
    )
    SELECT source, n_docs, fpp_label, CAST(m_bits AS BIGINT) AS m_bits,
           CAST((2 * m_bits * 693147 + n_docs * 1000000)
                // (2 * n_docs * 1000000) AS BIGINT) AS k_hashes
    FROM m
"""


def run_hash(sql):
    con = connect()
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    canon = sorted(repr(tuple(r)) for r in rows)
    h = hashlib.sha256("\n".join(canon).encode()).hexdigest()[:16]
    return len(rows), cols, h, rows[:3]


def main():
    ok, fail = [], []
    for name, sql in ORACLES.items():
        try:
            n1, cols, h1, sample = run_hash(sql)
            n2, _, h2, _ = run_hash(sql)
            det = "DET" if h1 == h2 else "NONDET!"
            status = "OK " if (n1 > 0 and h1 == h2) else "WARN"
            print(f"{status} {name}: rows={n1} {det} hash={h1} cols={cols}")
            for s in sample:
                print(f"      {s}")
            (ok if status == "OK " else fail).append(name)
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:250]}")
            fail.append(name)
    print(f"\n{len(ok)}/{len(ORACLES)} validated; issues: {fail}")


if __name__ == "__main__":
    main()
