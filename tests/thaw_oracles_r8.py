"""Round-8 thaw-candidate oracle validation (written in round 7).

ROUND-8 STATUS: 10 of the 12 oracles below were lifted verbatim into
their ``@query`` registrations; ``ext_bpe_train_k_rounds`` and
``ext_graph_degeneracy_core`` are deferred (still vetted, later tranche).

Run: ``python tests/thaw_oracles_r8.py`` — no pytest collection (helper
convention, like recensus_budgets.py). Drafts the exact DuckDB oracle for
each ROADMAP_r8.md candidate and runs it twice against sf0.01, checking
(a) it executes, (b) it is deterministic (stable value hash over sorted
rows from fresh connections), (c) row counts are sane. Nothing here
registers a key — the round-7 net-new-key freeze holds; this turns each
"oracle sketch" into a vetted oracle so round-8 registration (oracle +
plan pin + driver-sim in ONE commit, per the thaw rule in registry.py)
is mechanical. Validation results + spec adjustments: ROADMAP_r8.md.
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


# --- shared fragments -------------------------------------------------------

MUTUAL_EDGES = """
    pairs AS (
      SELECT a.vec_id AS u, b.vec_id AS v,
             list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
             (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
              sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS sim
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

# 1. ext_bpe_train_k_rounds — 3 unrolled merge rounds over the distinct-word
#    table; winner = (count desc, pair asc); merged symbol = chr(round).
_bpe_round = """
    , p{n} AS (
      SELECT unnest(list_transform(range(1, length(w)),
               i -> substring(w, CAST(i AS INT), 2))) AS pair, f
      FROM freq{m}
    ), w{n} AS (
      SELECT pair, n FROM (
        SELECT pair, CAST(SUM(f) AS BIGINT) AS n FROM p{n} GROUP BY pair
        ORDER BY n DESC, pair LIMIT 1)
    ), freq{n} AS (
      SELECT replace(f.w, (SELECT pair FROM w{n}), chr({n})) AS w, f.f
      FROM freq{m} f
    )
"""
ORACLES["ext_bpe_train_k_rounds"] = (
    """
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ), freq0 AS (
      SELECT w, CAST(count(*) AS BIGINT) AS f
      FROM tok WHERE length(w) >= 2 GROUP BY w
    )
    """
    + "".join(_bpe_round.format(n=n, m=n - 1) for n in (1, 2, 3))
    + """
    SELECT r AS round, pair AS merged_pair, n AS pair_count, vocab_symbols
    FROM (
      SELECT 1 AS r, (SELECT pair FROM w1) AS pair, (SELECT n FROM w1) AS n,
             (SELECT CAST(SUM(length(w) * f) AS BIGINT) FROM freq1) AS vocab_symbols
      UNION ALL
      SELECT 2, (SELECT pair FROM w2), (SELECT n FROM w2),
             (SELECT CAST(SUM(length(w) * f) AS BIGINT) FROM freq2)
      UNION ALL
      SELECT 3, (SELECT pair FROM w3), (SELECT n FROM w3),
             (SELECT CAST(SUM(length(w) * f) AS BIGINT) FROM freq3)
    ) ORDER BY round
    """
)

# 2. ext_dedup_cascade_report — exact-hash stage then minhash-band stage,
#    per-stage attrition counts (stage SQL chained as CTEs; the minhash
#    stage oracle is pulled from the live registry at validation time and
#    inlined as a subquery).
ORACLES["ext_dedup_cascade_report"] = None  # filled in main() from registry

# 3. ext_paragraph_dedup — documents have NO newlines (validated), so
#    "paragraphs" = fixed 16-word chunks; cross-doc chunk-hash dedup.
ORACLES["ext_paragraph_dedup"] = """
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), chunks AS (
      SELECT doc_id, CAST(i AS BIGINT) AS chunk_no,
             array_to_string(ws[(CAST(i AS INT) * 16 + 1):(CAST(i AS INT) * 16 + 16)], ' ') AS chunk
      FROM words, unnest(range(0, CAST(ceil(len(ws) / 16.0) AS BIGINT))) AS t(i)
    )
    SELECT md5(chunk) AS chunk_hash,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS keeper_doc
    FROM chunks GROUP BY md5(chunk) HAVING count(*) > 1
    ORDER BY n_occurrences DESC, chunk_hash LIMIT 50
"""

# 4. join_asof_tolerance — asof join NULLed beyond a 1-hour tolerance.
ORACLES["join_asof_tolerance"] = """
    WITH u AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'click' THEN event_id END AS click_id,
             CASE WHEN event_type = 'click' THEN ts END AS click_ts,
             CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS tag
      FROM events
    ), m AS (
      SELECT user_id, event_id, ts, tag,
             last_value(click_id IGNORE NULLS) OVER w AS asof_click_id,
             last_value(click_ts IGNORE NULLS) OVER w AS asof_click_ts
      FROM u
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, tag, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id,
           CASE WHEN asof_click_ts IS NOT NULL
                 AND epoch_us(ts) - epoch_us(asof_click_ts)
                     <= CAST(3600 AS BIGINT) * 1000000
                THEN asof_click_id END AS asof_click_id_tol
    FROM m WHERE tag = 1
"""

# 5. join_interval_point_containment — point (event ts) in campaign interval
#    [week_start, week_start + 3 days]; oracle = plain BETWEEN join,
#    Spark side = week-banded equi-join (sibling of interval_overlap).
ORACLES["join_interval_point_containment"] = """
    WITH ivals AS (
      SELECT DISTINCT date_trunc('week', ts) AS w_start,
             date_trunc('week', ts) + INTERVAL 3 DAY AS w_end
      FROM events
    )
    SELECT ivals.w_start AS campaign_start,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
             AS sum_value_micro
    FROM events JOIN ivals ON ts >= ivals.w_start AND ts <= ivals.w_end
    GROUP BY ivals.w_start
"""

# 6. agg_kll_quantile_invariant — approx_percentile within rank tolerance,
#    reported as a boolean invariant per (group, q).
ORACLES["agg_kll_quantile_invariant"] = """
    SELECT l_returnflag, q_pct, TRUE AS within_tol
    FROM (SELECT DISTINCT l_returnflag FROM lineitem),
         (SELECT unnest([25, 50, 75]) AS q_pct)
    ORDER BY l_returnflag, q_pct
"""

# 7. ext_label_propagation_bounded — 3 synchronous min-label rounds on the
#    mutual-kNN graph (k=5, first 100 vectors).
_lp_round = """
    , l{n} AS (
      SELECT n.node, least(n.lbl, coalesce(min(m.lbl), n.lbl)) AS lbl
      FROM l{m} n
      LEFT JOIN edges e ON e.u = n.node
      LEFT JOIN l{m} m ON m.node = e.v
      GROUP BY n.node, n.lbl
    )
"""
ORACLES["ext_label_propagation_bounded"] = (
    "WITH " + MUTUAL_EDGES
    + """
    , l0 AS (
      SELECT DISTINCT u AS node, CAST(u AS BIGINT) AS lbl FROM edges
    )
    """
    + "".join(_lp_round.format(n=n, m=n - 1) for n in (1, 2, 3))
    + """
    SELECT node, lbl AS label_r3 FROM l3
    """
)

# 8. ext_graph_degeneracy_core — 3 k-core peel rounds (k=2) on the same graph.
_peel_round = """
    , deg{n} AS (
      SELECT u AS node, CAST(count(*) AS BIGINT) AS deg FROM e{m} GROUP BY u
    ), alive{n} AS (
      SELECT node FROM deg{n} WHERE deg >= 2
    ), e{n} AS (
      SELECT e.u, e.v FROM e{m} e
      JOIN alive{n} a ON e.u = a.node
      JOIN alive{n} b ON e.v = b.node
    )
"""
ORACLES["ext_graph_degeneracy_core"] = (
    "WITH " + MUTUAL_EDGES
    + ", e0 AS (SELECT u, v FROM edges)"
    + "".join(_peel_round.format(n=n, m=n - 1) for n in (1, 2, 3))
    + """
    SELECT u AS node, CAST(count(*) AS BIGINT) AS core_deg
    FROM e3 GROUP BY u ORDER BY node
    """
)

# 9. ext_holt_winters_additive — fixed alpha=0.3 beta=0.1 additive double
#    smoothing over the gap-filled daily series, integer micro-units,
#    floor division (both engines: explicit floor). Recursive CTE oracle.
ORACLES["ext_holt_winters_additive"] = """
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
      SELECT i, d, y, y AS lvl, CAST(0 AS BIGINT) AS trend
      FROM series WHERE i = 1
      UNION ALL
      SELECT s.i, s.d, s.y,
             CAST(floor((3 * s.y + 7 * (hw.lvl + hw.trend)) / 10.0) AS BIGINT),
             CAST(floor((1 * (CAST(floor((3 * s.y + 7 * (hw.lvl + hw.trend)) / 10.0) AS BIGINT) - hw.lvl)
                         + 9 * hw.trend) / 10.0) AS BIGINT)
      FROM hw JOIN series s ON s.i = hw.i + 1
    )
    SELECT d, y AS y_micro, lvl AS level_micro, trend AS trend_micro,
           lvl + trend AS forecast_next_micro
    FROM hw ORDER BY d
"""

# 10. ext_anomaly_mad_rolling — trailing-7-row median/MAD gate over the daily
#     series; all-integer via doubled medians (2*median of ints is exact).
ORACLES["ext_anomaly_mad_rolling"] = """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d,
             CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1
    ), idx AS (
      SELECT d, y, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
      FROM daily
    ), frames AS (
      SELECT a.i, a.d, a.y, b.y AS yb
      FROM idx a JOIN idx b ON b.i BETWEEN a.i - 6 AND a.i
    ), med AS (
      SELECT i, d, y, CAST(2 * median(yb) AS BIGINT) AS med2
      FROM frames GROUP BY i, d, y
    ), mad AS (
      SELECT m.i, m.d, m.y, m.med2,
             CAST(2 * median(abs(2 * f.yb - m.med2)) AS BIGINT) AS mad4
      FROM med m JOIN frames f ON f.i = m.i
      GROUP BY m.i, m.d, m.y, m.med2
    )
    SELECT d, y AS y_micro, med2, mad4,
           (2 * abs(2 * y - med2) > 3 * mad4) AS is_anomaly
    FROM mad WHERE i >= 7 ORDER BY d
"""

# 11. ext_shard_skew_rebalance — docs beyond each shard's 110%-of-average
#     byte prefix are the move set (deterministic greedy via running sums).
ORACLES["ext_shard_skew_rebalance"] = """
    WITH assets AS (
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents
    ), cum AS (
      SELECT doc_id, n_bytes,
             SUM(n_bytes) OVER (ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum_bytes
      FROM assets
    ), pack AS (
      SELECT doc_id, n_bytes,
             CAST((cum_bytes - n_bytes) // 4096 AS BIGINT) AS shard
      FROM cum
    ), shard_tot AS (
      SELECT shard, CAST(SUM(n_bytes) AS BIGINT) AS tot FROM pack GROUP BY shard
    ), target AS (
      SELECT CAST(floor(avg(tot)) AS BIGINT) AS tgt FROM shard_tot
    ), within AS (
      SELECT p.shard, p.doc_id, p.n_bytes,
             SUM(p.n_bytes) OVER (PARTITION BY p.shard ORDER BY p.doc_id
                                  ROWS UNBOUNDED PRECEDING) AS cum_in_shard
      FROM pack p
    )
    SELECT shard, doc_id, n_bytes
    FROM within, target
    WHERE cum_in_shard > (tgt * 11) // 10
    ORDER BY shard, doc_id
"""

# 12. ext_ann_ivf_nprobe_curve — IVF recall@5 vs nprobe in {1,2,4}; exact
#     top-5 as truth; centroids = first 8 vectors (matches ext_knn_ivf).
ORACLES["ext_ann_ivf_nprobe_curve"] = """
    WITH cent AS (
      SELECT vec_id AS centroid_id, embedding AS c_emb
      FROM embeddings WHERE vec_id < 8
    ), q2c AS (
      SELECT e.vec_id, c.centroid_id,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_dot_product(e.embedding::DOUBLE[], c.c_emb::DOUBLE[]) /
                        (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                         sqrt(list_dot_product(c.c_emb::DOUBLE[], c.c_emb::DOUBLE[]))) DESC,
                        c.centroid_id ASC) AS rn
      FROM embeddings e CROSS JOIN cent c
    ), assign AS (
      SELECT vec_id, centroid_id FROM q2c WHERE rn = 1
    ), queries AS (
      SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 32
    ), exact AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                        (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                         sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) DESC,
                        b.vec_id ASC) AS rk
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
      WHERE a.vec_id < 32
    ), truth AS (
      SELECT query_id, neighbor_id FROM exact WHERE rk <= 5
    ), nprobes AS (
      SELECT unnest([1, 2, 4]) AS nprobe
    ), probe AS (
      SELECT np.nprobe, q.vec_id AS query_id, q.centroid_id
      FROM nprobes np JOIN q2c q ON q.rn <= np.nprobe
      WHERE q.vec_id < 32
    ), cand AS (
      SELECT DISTINCT p.nprobe, p.query_id, a.vec_id AS neighbor_id
      FROM probe p JOIN assign a ON a.centroid_id = p.centroid_id
      WHERE a.vec_id <> p.query_id
    ), hits AS (
      SELECT t.query_id, n.nprobe,
             CAST(SUM(CASE WHEN c.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hits
      FROM truth t CROSS JOIN nprobes n
      LEFT JOIN cand c ON c.nprobe = n.nprobe AND c.query_id = t.query_id
                      AND c.neighbor_id = t.neighbor_id
      GROUP BY t.query_id, n.nprobe
    )
    SELECT nprobe, CAST(count(*) AS BIGINT) AS n_queries,
           CAST(SUM(n_hits) AS BIGINT) AS total_hits,
           CAST((SUM(n_hits) * 1000000) // (count(*) * 5) AS BIGINT) AS recall6
    FROM hits GROUP BY nprobe ORDER BY nprobe
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
    sys.path.insert(0, "/root/repo")
    from spark_sql_dsv2_extension_spark import registry
    registry.load_all()
    minhash = registry.REGISTRY["ext_near_dedup_minhash"].oracle
    exact = registry.REGISTRY["ext_exact_dedup"].oracle
    ORACLES["ext_dedup_cascade_report"] = f"""
    WITH exact_stage AS ({exact}),
    minhash_stage AS ({minhash})
    SELECT stage, n FROM (
      SELECT 0 AS stage, CAST(count(*) AS BIGINT) AS n FROM documents
      UNION ALL
      SELECT 1, CAST(count(*) AS BIGINT) FROM exact_stage
      UNION ALL
      SELECT 2, CAST(count(*) AS BIGINT) FROM minhash_stage
    ) ORDER BY stage
    """

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
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
            fail.append(name)
    print(f"\n{len(ok)}/{len(ORACLES)} validated; issues: {fail}")


if __name__ == "__main__":
    main()
