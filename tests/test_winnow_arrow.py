"""Focused test for the r16 winnow gram-hash vectorization.

``ext_winnow_fingerprints`` computes its Rabin-Karp gram hashes in numpy
inside ``mapInArrow`` (r16 optimization). The contract is BIT-EQUALITY
with the JVM expression form it replaced — pure int64 modular arithmetic
over UTF-32 codepoints, exactly what ``ascii(substr(text, p, 1))``
yielded per character. This pins that equality on (a) the real fixture
corpus and (b) a synthetic frame exercising the edges the fixtures lack:
non-ASCII codepoints (multi-byte UTF-8, CJK, symbols) and NULL doc_ids.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from spark_sql_dsv2_extension_spark.extensions.text import (
    _BASE,
    _GRAM,
    _MOD,
    _WINNOW_GRAM_SCHEMA,
    _winnow_gram_hashes,
)
from spark_sql_dsv2_extension_spark.tables import load


def _expr_hashes(df):
    """The pre-r16 JVM expression form, kept as the reference."""

    def gram_hash(p: Column) -> Column:
        return F.aggregate(
            F.transform(
                F.sequence(F.lit(0), F.lit(_GRAM - 1)),
                lambda k: F.ascii(F.col("text").substr(p + k, F.lit(1))).cast(
                    "long"
                ),
            ),
            F.lit(7).cast("long"),
            lambda acc, c: (acc * _BASE + c) % _MOD,
        )

    return df.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.length("text") - (_GRAM - 1)), gram_hash
            )
        ).alias("pos0", "h"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "h")


def _assert_identical(df):
    a = sorted(map(str, _expr_hashes(df).collect()))
    b = sorted(map(str, df.mapInArrow(_winnow_gram_hashes, _WINNOW_GRAM_SCHEMA).collect()))
    assert len(a) > 0
    assert a == b


def test_gram_hashes_bit_equal_on_fixture_corpus(spark, sf_dir):
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.length("text") >= _GRAM)
        .select("doc_id", "text")
    )
    _assert_identical(docs)


def test_gram_hashes_bit_equal_on_nonascii_and_null_ids(spark):
    rows = [
        (1, "héllo wörld ünïcode ñ €uro"),
        (2, "普通话文本长度超过八个字符"),
        (3, "mixed ascii κόσμε ASCII"),
        (4, "emoji 🙂 inside the gram window"),
        (None, "null-id document with text"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING").filter(
        F.length("text") >= _GRAM
    )
    _assert_identical(df)
