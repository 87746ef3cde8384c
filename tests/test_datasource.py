"""Python DataSource connector tests (reference DSv2 stack parity)."""

from __future__ import annotations

import pytest

from spark_sql_dsv2_extension_spark.catalog import EngineCatalog
from spark_sql_dsv2_extension_spark.sources.datasource import (
    EngineTableReader,
    register,
)


@pytest.fixture()
def fact_table(spark, tmp_path):
    cat = EngineCatalog(spark, "dscat", str(tmp_path))
    cat.create_table(
        "default", "fact", "id BIGINT, v DOUBLE, dt STRING", partition_by=["dt"]
    )
    df = spark.createDataFrame(
        [(1, 1.5, "d1"), (2, 2.5, "d1"), (3, 3.5, "d2"), (4, 4.5, "d3")],
        "id BIGINT, v DOUBLE, dt STRING",
    )
    cat.insert("default", "fact", df)
    return cat._table_dir("default", "fact")


SCHEMA = "id BIGINT, v DOUBLE, dt STRING"


def test_reads_partitioned_table(spark, fact_table):
    register(spark)
    df = (
        spark.read.format("engine_table")
        .schema(SCHEMA)
        .option("path", fact_table)
        .option("partitionColumns", "dt")
        .load()
    )
    rows = {(r.id, r.v, r.dt) for r in df.collect()}
    assert rows == {(1, 1.5, "d1"), (2, 2.5, "d1"), (3, 3.5, "d2"), (4, 4.5, "d3")}
    assert df.columns == ["id", "v", "dt"]  # partition col trailing


def test_static_prune_reads_only_matching_partition(spark, fact_table):
    register(spark)
    df = (
        spark.read.format("engine_table")
        .schema(SCHEMA)
        .option("path", fact_table)
        .option("partitionColumns", "dt")
        .option("prune.dt", "d1")
        .load()
    )
    assert {(r.id, r.dt) for r in df.collect()} == {(1, "d1"), (2, "d1")}


def test_prune_skips_file_listing(fact_table):
    # driver-side check: pruned partitions never produce splits
    reader = EngineTableReader(
        schema=None,
        options={"path": fact_table, "partitioncolumns": "dt", "prune.dt": "d2"},
    )
    splits = reader.partitions()
    assert len(splits) >= 1
    assert all(s.partition_values == {"dt": "d2"} for s in splits)


def test_schema_required(spark, fact_table):
    register(spark)
    with pytest.raises(Exception, match="schema"):
        spark.read.format("engine_table").option("path", fact_table).load().collect()
