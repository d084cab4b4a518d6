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


def test_bucketed_join_no_exchange(spark, tmp_path):
    """Same-key same-count bucketed tables must join with ZERO Exchange —
    the co-location contract that deletes the FK-probe shuffle at scale."""
    import pyspark.sql.functions as F

    from fairtracks_validator_spark.sources.tables import write_bucketed

    corpus = spark.range(0, 10_000).select(
        F.concat(F.lit("https://d"), (F.col("id") % 97), F.lit(".ex/p"), F.col("id"))
        .alias("url"),
        (F.col("id") % 7).alias("x"),
    )
    registry = corpus.select("url").distinct().withColumn("seen", F.lit(True))
    write_bucketed(corpus, "bk_corpus", "url", buckets=8,
                   path=str(tmp_path / "bk_corpus"))
    write_bucketed(registry, "bk_registry", "url", buckets=8,
                   path=str(tmp_path / "bk_registry"))
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("bk_corpus").join(
                spark.table("bk_registry"), "url", "left_anti"
            )
            txt = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in txt, txt
            assert "SortMergeJoin" in txt
            assert joined.count() == 0  # every url is registered
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_corpus")
        spark.sql("DROP TABLE IF EXISTS bk_registry")
