"""Spark-side prototypes for the round-13 tranche-7 thaw candidates.

ROUND-13 STATUS: ALL THREE REGISTERED mid-round (one tranche commit
under the thaw rule; rotation slots 51-53 front the round-14 window).
The registered copies in extensions/similarity.py (width audit) and
extensions/curation.py (payload/text shape) are the source of truth;
these prototypes are retained as the validation record.

Three SHAPE-telemetry keys — the monitoring queries that QUANTIFY the
malformation classes the round-13 ragged frontier (RAGGED_AUDIT_r13.md)
probes. A 100 TB pipeline doesn't just quarantine broken shapes; it
publishes how much it quarantined, per slice, so an encoder regression
or a truncating writer is caught as a moved metric rather than a silent
recall drop:

- ``ext_embedding_width_audit`` — per-width vector counts with the
  scorable-gate pass rate (the Family-W quarantine's own telemetry):
  how many vectors are NULL / zero-norm / overflow / off-width, keyed
  by observed width. One grouped aggregate over the corpus.
- ``ext_payload_shape_profile`` — structural classes of the
  events.props JSON payload (empty / object / array / quoted-string /
  number / other, by first non-space character — pure string ops,
  bit-identical on both engines) with per-class row counts and payload
  byte volume. The Family-J quarantine's telemetry.
- ``ext_text_shape_audit`` — per-source document-shape flags:
  NUL-byte carriers, whitespace-only, single-character, and empty
  texts (the Family-T hazards), plus NULL texts. One grouped aggregate.

All three are exact-integer aggregates — no floats anywhere — so the
oracles are exact at every SF and under every audit fixture mode.

Validation harness (same as tests/thaw_protos_r{8,9,10,12,13}.py):
``python tests/thaw_protos_r13b.py [key ...]`` compares each proto
against tests/thaw_oracles_r13b.py under a vanilla session at
$PARITY_SF_DIR (default sf0.01); run the degenerate audit over the
tranche with ``python tests/degenerate_audit.py [--mode] --protos r13b``.
"""
from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_sql_dsv2_extension_spark.tables import load

SF = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")

PROTOS = {}


def proto(name):
    def deco(fn):
        PROTOS[name] = fn
        return fn

    return deco


EMB_DIM = 64


@proto("ext_embedding_width_audit")
def ext_embedding_width_audit(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    abs_max = F.array_max(
        F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    )
    scorable = (
        F.col("embedding").isNotNull()
        & (F.size("embedding") == EMB_DIM)
        & (abs_max > 0)
        & (abs_max < 1e9)
    )
    width = F.when(
        F.col("embedding").isNull(), F.lit(-1)
    ).otherwise(F.size("embedding"))
    return emb.select(
        width.cast("long").alias("width"),
        F.when(scorable, 1).otherwise(0).alias("sc"),
    ).groupBy("width").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum("sc").cast("long").alias("n_scorable"),
    )


@proto("ext_payload_shape_profile")
def ext_payload_shape_profile(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    t = F.trim(F.col("props"))
    c1 = F.substring(t, 1, 1)
    cls = (
        F.when(F.col("props").isNull() | (t == ""), "empty")
        .when(c1 == "{", "object")
        .when(c1 == "[", "array")
        .when(c1 == '"', "string")
        .when(c1.isin("-", "0", "1", "2", "3", "4", "5", "6", "7", "8", "9"),
              "number")
        .otherwise("other")
    )
    return ev.select(
        cls.alias("shape_class"),
        F.coalesce(F.length("props"), F.lit(0)).alias("n_chars"),
    ).groupBy("shape_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@proto("ext_text_shape_audit")
def ext_text_shape_audit(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    text = F.col("text")
    flag = lambda c: F.when(c, 1).otherwise(0)  # noqa: E731
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(flag(text.isNull())).cast("long").alias("n_null"),
        F.sum(flag(text.isNotNull() & (text == ""))).cast("long")
        .alias("n_empty"),
        F.sum(flag(text.isNotNull() & (text != "") & (F.trim(text) == "")))
        .cast("long").alias("n_ws_only"),
        F.sum(flag(F.length(text) == 1)).cast("long").alias("n_single_char"),
        F.sum(flag(text.contains("\x00"))).cast("long").alias("n_with_nul"),
    )


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    from spark_sql_dsv2_extension_spark.tables import TABLE_NAMES
    from tests.parity import canonical_rows
    from tests.thaw_oracles_r13b import ORACLES

    keys = sys.argv[1:] or list(PROTOS)
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("thaw-protos-r13b")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    failed = []
    for k in keys:
        t0 = time.time()
        try:
            sdf = PROTOS[k](spark, SF).toPandas()
            odf = con.sql(ORACLES[k]).df()
            cols = sorted(sdf.columns)
            assert cols == sorted(odf.columns), (cols, sorted(odf.columns))
            ok = canonical_rows(sdf) == canonical_rows(odf)
            print(
                f"{'PASS' if ok else 'FAIL'} {k}: spark={len(sdf)} "
                f"oracle={len(odf)} rows in {time.time() - t0:.1f}s"
            )
            if not ok:
                failed.append(k)
        except Exception:  # noqa: BLE001
            traceback.print_exc()
            print(f"ERROR {k}")
            failed.append(k)
    print(f"\n{len(keys) - len(failed)}/{len(keys)} pass; failed={failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
