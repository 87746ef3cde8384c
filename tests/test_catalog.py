"""Catalog/DDL layer unit tests (reference operators A1-A11, A24-A28)."""

from __future__ import annotations

import os

import pytest

from spark_sql_dsv2_extension_spark.catalog import (
    CatalogError,
    EngineCatalog,
    NoSuchNamespaceError,
    TableAlreadyExistsError,
)


@pytest.fixture()
def cat(spark, tmp_path):
    return EngineCatalog(spark, "hive1_external", str(tmp_path))


SCHEMA = "id BIGINT, name STRING, dt STRING"


def test_namespace_lifecycle(cat):
    assert cat.list_namespaces() == ["default"]
    cat.create_namespace("db1", comment="test db")
    assert cat.namespace_exists("db1")
    meta = cat.load_namespace_metadata("db1")
    assert meta["comment"] == "test db" and "location" in meta

    cat.alter_namespace("db1", {"owner_team": "data"})
    assert cat.load_namespace_metadata("db1")["owner_team"] == "data"
    # reserved props protected (V2ExternalCatalog.scala:311-318)
    with pytest.raises(CatalogError):
        cat.alter_namespace("db1", {"location": "/elsewhere"})
    # multi-level rejected (ImplicitSqlHelper.scala:23-31)
    with pytest.raises(NoSuchNamespaceError):
        cat.create_namespace("a.b")

    cat.create_table("db1", "t", SCHEMA)
    with pytest.raises(CatalogError):  # non-empty guard (:331-333)
        cat.drop_namespace("db1")
    cat.drop_table("db1", "t")
    cat.drop_namespace("db1")
    assert not cat.namespace_exists("db1")


def test_table_lifecycle_and_rename(cat, spark):
    cat.create_table("default", "people", SCHEMA, partition_by=["dt"])
    assert cat.list_tables("default") == ["people"]
    with pytest.raises(TableAlreadyExistsError):
        cat.create_table("default", "people", SCHEMA)

    df = spark.createDataFrame(
        [(1, "a", "2024-01-01"), (2, "b", "2024-01-02")], SCHEMA
    )
    cat.insert("default", "people", df)
    got = cat.load_table("default", "people")
    assert got.count() == 2
    # partition cols trail (V2Table.scala:37-38)
    assert got.columns == ["id", "name", "dt"]

    cat.rename_table("default", "people", "people2")
    assert cat.list_tables("default") == ["people2"]
    assert cat.load_table("default", "people2").count() == 2

    cat.drop_table("default", "people2")
    assert cat.list_tables("default") == []


def test_bucketed_and_bad_provider_rejected(cat):
    with pytest.raises(CatalogError):
        cat.create_table("default", "b", SCHEMA, bucket_by=("id", 8))
    with pytest.raises(CatalogError):
        cat.create_table("default", "o", SCHEMA, provider="orc_custom")


def test_dynamic_partition_overwrite(cat, spark):
    cat.create_table("default", "fact", SCHEMA, partition_by=["dt"])
    base = spark.createDataFrame(
        [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2")], SCHEMA
    )
    cat.insert("default", "fact", base, overwrite=True)
    # dynamic overwrite touching only d1 must keep d2 intact
    patch = spark.createDataFrame([(9, "z", "d1")], SCHEMA)
    cat.insert("default", "fact", patch, overwrite=True, dynamic=True)
    rows = {(r.id, r.dt) for r in cat.load_table("default", "fact").collect()}
    assert rows == {(9, "d1"), (3, "d2")}
    # static overwrite replaces the whole table (A18 truncate branch)
    cat.insert("default", "fact", patch, overwrite=True, dynamic=False)
    assert cat.load_table("default", "fact").count() == 1


def test_partition_management_and_stats(cat, spark):
    cat.create_table("default", "ev", SCHEMA, partition_by=["dt"])
    df = spark.createDataFrame([(1, "a", "d1"), (2, "b", "d2")], SCHEMA)
    cat.insert("default", "ev", df)
    assert cat.list_partitions("default", "ev") == [{"dt": "d1"}, {"dt": "d2"}]
    assert cat.list_partitions("default", "ev", {"dt": "d2"}) == [{"dt": "d2"}]

    cat.create_partition("default", "ev", {"dt": "d3"})
    assert {"dt": "d3"} in cat.list_partitions("default", "ev")
    assert cat.drop_partition("default", "ev", {"dt": "d3"})
    assert not cat.drop_partition("default", "ev", {"dt": "d3"})  # idempotent

    size = cat.update_table_stats("default", "ev")
    assert size > 0 and cat.table_size("default", "ev") == size
    cat.drop_partition("default", "ev", {"dt": "d2"})
    assert cat.table_size("default", "ev") < size  # stats follow mutations

    with pytest.raises(NotImplementedError):
        cat.replace_partition_metadata("default", "ev", {})


def test_external_table_keeps_data(cat, spark, tmp_path):
    loc = str(tmp_path / "ext_data")
    cat.create_table("default", "ext", SCHEMA, location=loc)
    cat.insert("default", "ext", spark.createDataFrame([(1, "a", "d")], SCHEMA))
    cat.drop_table("default", "ext")
    assert os.path.exists(loc)  # EXTERNAL: drop keeps data (A7/A25 rule)


def test_csv_json_providers_roundtrip(cat, spark):
    for provider in ("csv", "json"):
        cat.create_table("default", f"t_{provider}", "id BIGINT, name STRING",
                         provider=provider)
        df = spark.createDataFrame([(1, "x"), (2, "y")], "id BIGINT, name STRING")
        cat.insert("default", f"t_{provider}", df)
        back = cat.load_table("default", f"t_{provider}")
        assert {(r.id, r.name) for r in back.collect()} == {(1, "x"), (2, "y")}


def test_catalog_isolation(spark, tmp_path):
    # two named catalogs over one warehouse are fully isolated (A1)
    c1 = EngineCatalog(spark, "cat1", str(tmp_path))
    c2 = EngineCatalog(spark, "cat2", str(tmp_path))
    c1.create_table("default", "only_in_1", SCHEMA)
    assert c1.list_tables("default") == ["only_in_1"]
    assert c2.list_tables("default") == []
    # registry persists across instances (like HMS across sessions)
    c1b = EngineCatalog(spark, "cat1", str(tmp_path))
    assert c1b.list_tables("default") == ["only_in_1"]
