"""Dataset-curation operators: selection, sharding, budgeting.

The ops that turn a cleaned corpus into a TRAINING SET: importance-based
selection toward a target distribution (DSIR), deterministic shard
manifests for the dataloader, and token-budget trimming per language.
Complements extensions/text.py (cleaning/scoring) and extensions/dedup.py
(dedup) — this is the last mile before tokenization.

All scoring follows the integer-scaled-log pattern (text.py
ext_unigram_logprob): per-token terms rounded to 1e-6 and summed as int64,
so results are partition-order-independent and oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import fan_out, load

_DSIR_TOP = 100


@query(
    "ext_dsir_importance",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
      FROM documents
    ), t AS (SELECT doc_id, lang, w FROM tok WHERE length(w) > 0),
    target AS (
      SELECT w, CAST(count(*) AS BIGINT) AS ct FROM t
      WHERE lang = 'en' GROUP BY w
    ), source AS (
      SELECT w, CAST(count(*) AS BIGINT) AS cs FROM t GROUP BY w
    ), totals AS (
      SELECT (SELECT SUM(ct) FROM target) AS nt,
             (SELECT SUM(cs) FROM source) AS ns
    ), scored AS (
      SELECT t.doc_id,
             CAST(round((ln(CAST(target.ct AS DOUBLE) / nt)
                         - ln(CAST(source.cs AS DOUBLE) / ns)) * 1e6)
                  AS BIGINT) AS lr6
      FROM t JOIN target USING (w) JOIN source USING (w), totals
    ), per_doc AS (
      SELECT d.doc_id, d.lang,
             CAST(coalesce(count(s.lr6), 0) AS BIGINT) AS n_scored_tokens,
             CAST(coalesce(SUM(s.lr6), 0) AS BIGINT) AS weight6
      FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_id, lang, n_scored_tokens,
           round(weight6 / 1e6, 4) AS log_ratio,
           row_number() OVER (ORDER BY weight6 DESC, doc_id)
             <= {_DSIR_TOP} AS selected
    FROM per_doc
    """,
)
def ext_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weighting (Xie et al.): each document scores
    sum over tokens of ln p_target(w) − ln p_source(w) under unigram LMs
    (target = the English slice, source = the whole corpus); the top-N by
    weight are the documents importance RESAMPLING would draw first.
    Tokens outside the target vocabulary contribute nothing (both engines
    inner-join the target LM), and every per-token log-ratio is rounded to
    1e-6 and summed as int64 — order-independent, oracle-exact.

    Scale: two vocab aggregations + one fact join (vocab broadcast here,
    shuffle at web scale); selection is a single top-N. The n-gram-hash
    feature space of the paper swaps in for words with no shape change."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    t = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.length("w") > 0)
    target = t.filter(F.col("lang") == "en").groupBy("w").agg(
        F.count(F.lit(1)).alias("ct")
    )
    source = t.groupBy("w").agg(F.count(F.lit(1)).alias("cs"))
    nt = target.agg(F.sum("ct").alias("nt"))
    ns = source.agg(F.sum("cs").alias("ns"))
    lr6 = F.round(
        (
            F.log(F.col("ct").cast("double") / F.col("nt"))
            - F.log(F.col("cs").cast("double") / F.col("ns"))
        )
        * F.lit(1e6)
    ).cast("long")
    scored = (
        t.join(F.broadcast(target), "w")
        .join(F.broadcast(source), "w")
        .join(F.broadcast(nt))
        .join(F.broadcast(ns))
        .select("doc_id", lr6.alias("lr6"))
    )
    per_doc = (
        docs.select("doc_id", "lang")
        .join(
            scored.groupBy("doc_id").agg(
                F.count(F.lit(1)).alias("n_scored_tokens"),
                F.sum("lr6").alias("weight6"),
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            "lang",
            F.coalesce("n_scored_tokens", F.lit(0)).alias("n_scored_tokens"),
            F.coalesce("weight6", F.lit(0)).alias("weight6"),
        )
    )
    w = Window.orderBy(F.col("weight6").desc(), "doc_id")
    return per_doc.select(
        "doc_id",
        "lang",
        "n_scored_tokens",
        F.round(F.col("weight6") / 1e6, 4).alias("log_ratio"),
        (F.row_number().over(w) <= _DSIR_TOP).alias("selected"),
    )


_SHARD_A = 2654435761
_SHARD_M = 2_147_483_647
_N_SHARDS = 16


@query(
    "ext_shard_manifest",
    oracle=f"""
    WITH assigned AS (
      SELECT (doc_id * {_SHARD_A} + 987654321) % {_SHARD_M} % {_N_SHARDS}
               AS shard,
             doc_id, n_chars,
             CASE WHEN length(text) = 0 THEN 0
                  ELSE length(text) - length(replace(text, ' ', '')) + 1
             END AS n_tokens
      FROM documents
    )
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id,
           CAST(max(doc_id) AS BIGINT) AS max_doc_id,
           CAST(SUM(doc_id * doc_id % {_SHARD_M}) % {_SHARD_M} AS BIGINT)
             AS content_check
    FROM assigned GROUP BY shard
    """,
)
def ext_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dataloader shard manifest: documents hash-assigned to
    {_N_SHARDS} shards (multiplicative hash on doc_id — stable across
    reruns and cluster sizes, unlike round-robin), with the per-shard
    accounting a training job reads before it opens a single file: doc and
    token and char totals, id range, and an order-independent content
    checksum (modular sum of id squares) that catches a dropped or
    double-counted document at manifest-diff time.

    Scale: one shuffle on the shard key — the same shuffle the subsequent
    partitioned write does anyway, so the manifest is free at write time;
    16 output rows regardless of corpus size."""
    docs = load(spark, sf_dir, "documents")
    n_tokens = F.when(F.length("text") == 0, F.lit(0)).otherwise(
        F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        + 1
    )
    assigned = docs.select(
        ((F.col("doc_id") * _SHARD_A + 987654321) % _SHARD_M % _N_SHARDS).alias(
            "shard"
        ),
        "doc_id",
        "n_chars",
        n_tokens.alias("n_tokens"),
    )
    return assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
        (F.sum(F.col("doc_id") * F.col("doc_id") % _SHARD_M) % _SHARD_M).alias(
            "content_check"
        ),
    )


_BUDGET_TOKENS = 5000  # per-language token budget


@query(
    "ext_token_budget_trim",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             CASE WHEN length(text) = 0 THEN 0
                  ELSE length(text) - length(replace(text, ' ', '')) + 1
             END AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING)
               AS cum_tokens
      FROM t
    )
    SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM c WHERE cum_tokens <= {_BUDGET_TOKENS}
    """,
)
def ext_token_budget_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget trimming: keep documents per language, in stable
    doc_id order, until the language's cumulative token count reaches the
    budget ({_BUDGET_TOKENS} here) — the deterministic version of "take
    the first N tokens of each language" that makes reruns reproduce the
    identical training set. The running total is one window per language.

    Scale: the cumulative sum shuffles once on lang; at very high doc
    counts per language the window serializes per key, so the production
    variant first block-aggregates per (lang, doc_id bucket) and prefixes
    over bucket subtotals — same cutoff, two small passes."""
    docs = load(spark, sf_dir, "documents")
    n_tokens = F.when(F.length("text") == 0, F.lit(0)).otherwise(
        F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        + 1
    )
    t = docs.select("doc_id", "lang", n_tokens.alias("n_tokens"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= _BUDGET_TOKENS)
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
    )
