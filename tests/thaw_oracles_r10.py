"""Round-10 thaw-candidate oracle validation (third tranche, drafted round 7).

ROUND-10 STATUS: ALL 6 REGISTERED (one commit each; the registered
copies in the extension modules are the source of truth, these oracles
retained as the validation record).

Run: ``python tests/thaw_oracles_r10.py`` (not pytest-collected). Same
harness as the r8/r9 validators. Six quality-first candidates from the
remaining genuine family gaps: graph community evaluation (modularity,
conductance), bounded time-series mining (matrix profile, DTW), embedding
distribution drift, and t-closeness (completing the privacy triad with
the existing k-anonymity and the vetted l-diversity keys).
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

MUTUAL_EDGES = f"""
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
    ), mutual AS (
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

# 1. ext_graph_modularity — modularity contribution per label community on
#    the mutual-kNN graph. All-integer until one rounded division per row:
#    contribution6 = round(1e6 * (e_c * 2m - K_c^2) / (2m)^2), where e_c =
#    DIRECTED within-community edges and K_c = community degree sum.
ORACLES["ext_graph_modularity"] = (
    "WITH " + MUTUAL_EDGES + """
    , lab AS (
      SELECT vec_id, label FROM embeddings WHERE vec_id < 100
    ), el AS (
      SELECT e.u, e.v, lu.label AS cu, lv.label AS cv
      FROM edges e JOIN lab lu ON e.u = lu.vec_id
                   JOIN lab lv ON e.v = lv.vec_id
    ), m2 AS (
      SELECT CAST(count(*) AS BIGINT) AS m2 FROM el
    ), within AS (
      SELECT cu AS community, CAST(count(*) AS BIGINT) AS e_in
      FROM el WHERE cu = cv GROUP BY cu
    ), degs AS (
      SELECT cu AS community, CAST(count(*) AS BIGINT) AS deg_sum
      FROM el GROUP BY cu
    ), nn AS (
      SELECT l.label AS community, CAST(count(*) AS BIGINT) AS n_nodes
      FROM lab l WHERE l.vec_id IN (SELECT u FROM edges)
      GROUP BY l.label
    )
    SELECT d.community, nn.n_nodes,
           coalesce(w.e_in, 0) AS e_in_directed,
           d.deg_sum,
           CAST(round(1000000.0 * (coalesce(w.e_in, 0) * m2.m2
                                   - d.deg_sum * d.deg_sum)
                      / (m2.m2 * m2.m2)) AS BIGINT) AS contribution6
    FROM degs d
    LEFT JOIN within w ON d.community = w.community
    JOIN nn ON d.community = nn.community
    CROSS JOIN m2
    """
)

# 2. ext_conductance_communities — per-community conductance on the same
#    graph: cut / min(vol, 2m - vol), one rounded division of exact ints.
ORACLES["ext_conductance_communities"] = (
    "WITH " + MUTUAL_EDGES + """
    , lab AS (
      SELECT vec_id, label FROM embeddings WHERE vec_id < 100
    ), el AS (
      SELECT e.u, e.v, lu.label AS cu, lv.label AS cv
      FROM edges e JOIN lab lu ON e.u = lu.vec_id
                   JOIN lab lv ON e.v = lv.vec_id
    ), m2 AS (
      SELECT CAST(count(*) AS BIGINT) AS m2 FROM el
    ), agg AS (
      SELECT cu AS community,
             CAST(SUM(CASE WHEN cu <> cv THEN 1 ELSE 0 END) AS BIGINT) AS cut,
             CAST(count(*) AS BIGINT) AS vol
      FROM el GROUP BY cu
    )
    SELECT community, cut, vol,
           CAST(round(1000000.0 * cut / LEAST(vol, m2.m2 - vol))
                AS BIGINT) AS conductance6
    FROM agg CROSS JOIN m2
    WHERE LEAST(vol, m2.m2 - vol) > 0
    """
)

# 3. ext_matrix_profile_daily — matrix profile (w=7, exclusion |i-j|>=4)
#    over the milli-unit daily series; UNNORMALIZED Euclidean^2 so every
#    distance is an exact int64.
ORACLES["ext_matrix_profile_daily"] = """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d,
             CAST(SUM(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1
    ), idx AS (
      SELECT y, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
      FROM daily
    ), nsub AS (
      SELECT CAST(max(i) - 6 AS BIGINT) AS ns FROM idx
    ), dists AS (
      SELECT a.i AS si, b.i AS sj,
             CAST(SUM((xa.y - xb.y) * (xa.y - xb.y)) AS BIGINT) AS d2
      FROM idx a
      JOIN idx b ON abs(a.i - b.i) >= 4
      JOIN nsub ON a.i <= nsub.ns AND b.i <= nsub.ns
      JOIN idx xa ON xa.i BETWEEN a.i AND a.i + 6
      JOIN idx xb ON xb.i = b.i + (xa.i - a.i)
      GROUP BY a.i, b.i
    ), mp AS (
      SELECT si, d2, sj,
             row_number() OVER (PARTITION BY si ORDER BY d2, sj) AS rn
      FROM dists
    )
    SELECT si AS subseq, d2 AS mp_d2, sj AS nn_subseq
    FROM mp WHERE rn = 1
"""


# 4. ext_dtw_bounded — exact integer DTW between the average Monday-
#    anchored weekday profiles of the first and last full ISO weeks
#    (7-point integer vectors); the 7x7 DP is unrolled into generated
#    per-cell CTEs (both engines replay the identical recurrence).
def _dtw_cells():
    cells = []
    for i in range(1, 8):
        for j in range(1, 8):
            cost = f"(SELECT (pa.y - pb.y) * (pa.y - pb.y) FROM pa, pb WHERE pa.dow = {i} AND pb.dow = {j})"
            if i == 1 and j == 1:
                prev = "0"
            elif i == 1:
                prev = f"(SELECT v FROM c{i}_{j-1})"
            elif j == 1:
                prev = f"(SELECT v FROM c{i-1}_{j})"
            else:
                prev = (f"LEAST((SELECT v FROM c{i-1}_{j}), "
                        f"(SELECT v FROM c{i}_{j-1}), "
                        f"(SELECT v FROM c{i-1}_{j-1}))")
            cells.append(
                f"c{i}_{j} AS MATERIALIZED (SELECT CAST({cost} + {prev} AS BIGINT) AS v)"
            )
    return ",\n    ".join(cells)


ORACLES["ext_dtw_bounded"] = f"""
    WITH daily AS MATERIALIZED (
      SELECT date_trunc('day', ts) AS d,
             CAST(SUM(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1
    ), wk AS MATERIALIZED (
      SELECT d, y, CAST(isodow(d) AS BIGINT) AS dow,
             date_trunc('week', d) AS w
      FROM daily
    ), full_weeks AS MATERIALIZED (
      SELECT w FROM wk GROUP BY w HAVING count(*) = 7
    ), pa AS MATERIALIZED (
      SELECT dow, y FROM wk
      WHERE w = (SELECT min(w) FROM full_weeks)
    ), pb AS MATERIALIZED (
      SELECT dow, y FROM wk
      WHERE w = (SELECT max(w) FROM full_weeks)
    ),
    {_dtw_cells()}
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM full_weeks) AS n_full_weeks,
           (SELECT v FROM c7_7) AS dtw_d2,
           CAST((SELECT SUM((pa.y - pb.y) * (pa.y - pb.y))
                 FROM pa JOIN pb ON pa.dow = pb.dow) AS BIGINT)
             AS euclid_d2
    -- degenerate-series gate (r8 prep for the r10 registration): with
    -- fewer than 2 full ISO weeks there is no (first, last) profile pair
    -- — emit ZERO rows (the ungated form returned one row of NULL cells
    -- at 0 weeks and self-DTW at 1, while the Spark DP raised on the
    -- missing side; both engines now agree on empty)
    WHERE (SELECT count(*) FROM full_weeks) >= 2
"""

# 5. ext_embedding_centroid_drift — pairwise distance between per-label
#    centroids; per-dim micro-int sums (shuffle-order-proof), exact-int
#    rationals combined in one identical float expression per pair.
ORACLES["ext_embedding_centroid_drift"] = """
    WITH dims AS (
      SELECT label, t.i AS dim,
             CAST(round(CAST(embedding[CAST(t.i AS INT)] AS DOUBLE) * 1000000)
                  AS BIGINT) AS x6
      FROM embeddings, unnest(range(1, 65)) AS t(i)
      WHERE label < 5
    ), cent AS (
      SELECT label, dim, CAST(SUM(x6) AS BIGINT) AS s6,
             CAST(count(*) AS BIGINT) AS n
      FROM dims GROUP BY label, dim
    ), pairs AS (
      SELECT a.label AS l1, b.label AS l2, a.dim,
             (1.0 * a.s6 / a.n - 1.0 * b.s6 / b.n) AS diff
      FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
    )
    SELECT l1, l2,
           CAST(round(sqrt(SUM(diff * diff))) AS BIGINT) AS centroid_dist6
    FROM pairs GROUP BY l1, l2
"""

# 6. ext_t_closeness_audit — ordered-EMD t-closeness per QI group against
#    the global sensitive distribution (acctbal buckets); exact-int
#    cumulative counts, one identical float combination per group.
ORACLES["ext_t_closeness_audit"] = """
    WITH s AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 2000) AS BIGINT) AS b
      FROM customer
    ), buckets AS (
      SELECT DISTINCT b FROM s
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS m FROM buckets
    ), groups AS (
      SELECT DISTINCT c_nationkey, c_mktsegment FROM s
    ), gb AS (
      SELECT g.c_nationkey, g.c_mktsegment, buckets.b,
             CAST(coalesce(cnt.c, 0) AS BIGINT) AS c
      FROM groups g CROSS JOIN buckets
      LEFT JOIN (
        SELECT c_nationkey, c_mktsegment, b, CAST(count(*) AS BIGINT) AS c
        FROM s GROUP BY 1, 2, 3
      ) cnt ON cnt.c_nationkey = g.c_nationkey
           AND cnt.c_mktsegment = g.c_mktsegment AND cnt.b = buckets.b
    ), gcum AS (
      SELECT c_nationkey, c_mktsegment, b,
             SUM(c) OVER (PARTITION BY c_nationkey, c_mktsegment ORDER BY b
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(c) OVER (PARTITION BY c_nationkey, c_mktsegment) AS n
      FROM gb
    ), allcum AS (
      SELECT b, SUM(CAST(count(*) AS BIGINT))
                  OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS cum_all,
             (SELECT CAST(count(*) AS BIGINT) FROM s) AS n_all
      FROM s GROUP BY b
    )
    SELECT g.c_nationkey, g.c_mktsegment,
           CAST(max(g.n) AS BIGINT) AS group_n,
           CAST(round(1000000.0 / (m.m - 1)
                * SUM(abs(1.0 * g.cum / g.n - 1.0 * a.cum_all / a.n_all)))
                AS BIGINT) AS emd6,
           CAST(round(1000000.0 / (m.m - 1)
                * SUM(abs(1.0 * g.cum / g.n - 1.0 * a.cum_all / a.n_all)))
                AS BIGINT) > 200000 AS at_risk
    FROM gcum g JOIN allcum a ON g.b = a.b CROSS JOIN m
    -- degenerate gate (r8 audit): one sensitive bucket -> zero rows
    WHERE m.m >= 2
    GROUP BY g.c_nationkey, g.c_mktsegment, m.m
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
