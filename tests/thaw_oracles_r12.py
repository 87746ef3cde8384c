"""Round-12 thaw-candidate oracle validation (fifth tranche).

ROUND-12 STATUS: BOTH REGISTERED at round-12 close (the registered
copies in extensions/similarity.py are the source of truth; these
oracles retained as the validation record).

Run: ``python tests/thaw_protos_r12.py`` (not pytest-collected). Same
harness as the r8/r9/r10 validators. Two quality-first candidates from
the remaining embedding-retrieval gaps: Matryoshka truncation-recall and
the binary-quantization Hamming cascade. Both oracles carry the
round-12 scorable-embedding gate (MATERIALIZED, matching
similarity._EMB_SCORABLE_CTE) so they are X1/X2-safe from day one.
"""

_GATE = (
    "embeddings AS MATERIALIZED "
    "(SELECT * FROM main.embeddings WHERE embedding IS NOT NULL"
    " AND list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) > 0"
    " AND list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) < 1e9)"
)

ORACLES = {}

# --- ext_mrl_truncation_curve -------------------------------------------
# Per truncation dim d: recall@5 of d-dim cosine top-5 vs full-dim exact
# top-5 over queries vec_id < 10. Prefix-norm-0 vectors drop from that
# dim's ranking (dot(v,v) > 0 gate, mirroring the Spark side).
_MRL_TOPK = """
    t{tag} AS (
      SELECT vec_id, embedding[1:{d}]::DOUBLE[] AS v
      FROM embeddings
      WHERE list_dot_product(embedding[1:{d}]::DOUBLE[],
                             embedding[1:{d}]::DOUBLE[]) > 0
    ), q{tag} AS (
      SELECT vec_id AS query_id, v AS qv FROM t{tag} WHERE vec_id < 10
    ), s{tag} AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_dot_product(q.qv, e.v) /
             (sqrt(list_dot_product(q.qv, q.qv)) *
              sqrt(list_dot_product(e.v, e.v))) AS sim
      FROM q{tag} q JOIN t{tag} e ON e.vec_id <> q.query_id
    ), k{tag} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rk
        FROM s{tag}
      ) WHERE rk <= 5
    )
"""

_MRL_DIM_ROW = """
    SELECT CAST({d} AS BIGINT) AS trunc_dim,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(SUM(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits,
           CAST((SUM(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 * 1000000) // count(*) AS BIGINT) AS recall6
    FROM kfull f LEFT JOIN kd{d} t
      ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
"""

ORACLES["ext_mrl_truncation_curve"] = (
    "WITH "
    + _GATE
    + ","
    + ",".join(
        _MRL_TOPK.format(tag=tag, d=d)
        for tag, d in (("full", 64), ("d8", 8), ("d16", 16), ("d32", 32))
    )
    + " SELECT * FROM ("
    + " UNION ALL ".join(_MRL_DIM_ROW.format(d=d) for d in (8, 16, 32))
    + ")"
)

# --- ext_knn_binary_hamming ----------------------------------------------
# Sign bits packed into two 32-bit words; top-20 candidates by Hamming
# distance (xor + bit_count, tie neighbor asc); exact-cosine rerank top-5.
ORACLES["ext_knn_binary_hamming"] = f"""
    WITH {_GATE}, coded AS (
      SELECT vec_id, embedding,
             CAST(list_sum(list_transform(range(0, 32),
               i -> CASE WHEN CAST(embedding[CAST(i + 1 AS INT)] AS DOUBLE) > 0
                         THEN CAST(1 AS BIGINT) << i ELSE 0 END)) AS BIGINT)
               AS b0,
             CAST(list_sum(list_transform(range(32, 64),
               i -> CASE WHEN CAST(embedding[CAST(i + 1 AS INT)] AS DOUBLE) > 0
                         THEN CAST(1 AS BIGINT) << (i - 32) ELSE 0 END))
               AS BIGINT) AS b1
      FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, embedding AS q_emb, b0 AS q0, b1 AS q1
      FROM coded WHERE vec_id < 10
    ), ham AS (
      SELECT q.query_id, e.vec_id AS neighbor_id, q.q_emb, e.embedding,
             bit_count(xor(e.b0, q.q0)) + bit_count(xor(e.b1, q.q1))
               AS hamming
      FROM q JOIN coded e ON e.vec_id <> q.query_id
    ), cand AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY hamming ASC, neighbor_id ASC) AS crk
        FROM ham
      ) WHERE crk <= 20
    ), rer AS (
      SELECT query_id, neighbor_id, hamming,
             list_dot_product(q_emb::DOUBLE[], embedding::DOUBLE[]) /
             (sqrt(list_dot_product(q_emb::DOUBLE[], q_emb::DOUBLE[])) *
              sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])))
               AS sim
      FROM cand
    )
    SELECT query_id, neighbor_id, CAST(hamming AS BIGINT) AS hamming,
           round(sim, 6) AS cosine6, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rk
      FROM rer
    )
    WHERE rk <= 5
"""
