"""Table-reference routing: Iceberg catalog tables vs parquet paths."""

from __future__ import annotations

import pytest

from fairtracks_validator_spark.sources.tables import (
    is_catalog_table,
    read_table,
    write_table,
)


def test_path_refs_are_not_catalog_tables(spark):
    assert not is_catalog_table(spark, "/data/pages.parquet")
    assert not is_catalog_table(spark, "events.parquet")  # filename dot
    assert not is_catalog_table(spark, "relative/dir")
    # dotted name whose head catalog is NOT configured → path fallback
    assert not is_catalog_table(spark, "nosuchcat.db.tbl")


def test_table_prefix_forces_catalog(spark):
    assert is_catalog_table(spark, "table:some.tbl")
    # forcing catalog resolution on a missing table raises — never
    # misread as a path
    with pytest.raises(Exception):
        read_table(spark, "table:definitely_missing_tbl_xyz").collect()


def test_configured_catalog_head_is_table(spark):
    spark.conf.set("spark.sql.catalog.testcat",
                   "org.apache.spark.sql.connector.catalog.InMemoryCatalog")
    try:
        assert is_catalog_table(spark, "testcat.db.tbl")
    finally:
        spark.conf.unset("spark.sql.catalog.testcat")


def test_parquet_roundtrip_via_table_api(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    write_table(df, p, mode="overwrite")
    got = read_table(spark, p)
    assert {(r["id"], r["v"]) for r in got.collect()} == {(1, "a"), (2, "b")}
