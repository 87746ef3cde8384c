"""Round-13 tranche-7 thaw-candidate oracle validation.

ROUND-13 STATUS: ALL THREE REGISTERED mid-round (the registered copies
in extensions/similarity.py and extensions/curation.py are the source
of truth; these oracles retained as the validation record).

Run: ``python tests/thaw_protos_r13b.py`` (not pytest-collected). Three
SHAPE-telemetry candidates (see the proto module's docstring). All three
oracles are exact-integer aggregates; the scorable condition in the
width audit reproduces similarity._EMB_SCORABLE_CTE's predicate exactly
(non-NULL, width = 64, norm > 0 via max|component| > 0,
max|component| < 1e9) so the audit's pass rate IS the gate's pass rate.
"""

ORACLES = {}

_ABS_MAX = "list_max(list_transform(embedding::DOUBLE[], x -> abs(x)))"

ORACLES["ext_embedding_width_audit"] = f"""
    SELECT CAST(COALESCE(len(embedding), -1) AS BIGINT) AS width,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(COALESCE(SUM(CASE WHEN embedding IS NOT NULL
                          AND len(embedding) = 64
                          AND {_ABS_MAX} > 0 AND {_ABS_MAX} < 1e9
                     THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_scorable
    FROM embeddings GROUP BY 1
"""

ORACLES["ext_payload_shape_profile"] = """
    WITH c AS (
      SELECT CASE
               WHEN props IS NULL OR trim(props) = '' THEN 'empty'
               WHEN substring(trim(props), 1, 1) = '{' THEN 'object'
               WHEN substring(trim(props), 1, 1) = '[' THEN 'array'
               WHEN substring(trim(props), 1, 1) = '"' THEN 'string'
               WHEN substring(trim(props), 1, 1) IN
                    ('-','0','1','2','3','4','5','6','7','8','9')
                 THEN 'number'
               ELSE 'other'
             END AS shape_class,
             COALESCE(length(props), 0) AS n_chars
      FROM events
    )
    SELECT shape_class,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM c GROUP BY shape_class
"""

ORACLES["ext_text_shape_audit"] = """
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(COALESCE(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_null,
           CAST(COALESCE(SUM(CASE WHEN text IS NOT NULL AND text = ''
                     THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_empty,
           CAST(COALESCE(SUM(CASE WHEN text IS NOT NULL AND text <> ''
                          AND trim(text) = ''
                     THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_ws_only,
           CAST(COALESCE(SUM(CASE WHEN length(text) = 1 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_single_char,
           CAST(COALESCE(SUM(CASE WHEN contains(text, chr(0))
                     THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_with_nul
    FROM documents GROUP BY source
"""
