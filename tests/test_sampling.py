"""Deterministic hash sampling: exactness, stability, stratification."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from fairtracks_validator_spark.operators.sampling import (
    hash_bucket,
    hash_sample,
    stratified_sample,
    train_val_split,
)


@pytest.fixture(scope="module")
def keyed(spark):
    return spark.range(0, 20_000).withColumn(
        "lang",
        F.when(F.col("id") % 10 < 7, "en").when(F.col("id") % 10 < 9, "de").otherwise("fr"),
    )


def test_rate_is_close_and_exactly_reproducible(keyed):
    a = hash_sample(keyed, "id", 0.2, seed="x")
    b = hash_sample(keyed.repartition(13), "id", 0.2, seed="x")
    ids_a = {r["id"] for r in a.select("id").collect()}
    ids_b = {r["id"] for r in b.select("id").collect()}
    assert ids_a == ids_b  # partition-invariant, not just same count
    assert 0.2 * 20_000 * 0.9 < len(ids_a) < 0.2 * 20_000 * 1.1


def test_seed_changes_selection(keyed):
    a = {r["id"] for r in hash_sample(keyed, "id", 0.2, seed="x").select("id").collect()}
    b = {r["id"] for r in hash_sample(keyed, "id", 0.2, seed="y").select("id").collect()}
    assert a != b
    # ~rate² overlap, not near-total
    assert len(a & b) < 0.5 * len(a)


def test_rate_bounds(keyed):
    assert hash_sample(keyed, "id", 0.0).count() == 0
    assert hash_sample(keyed, "id", 1.0).count() == 20_000


def test_stratified_rates(keyed):
    out = stratified_sample(
        keyed, "id", "lang", rates={"en": 0.1, "de": 1.0}, default_rate=0.0
    )
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got.get("fr") is None  # default 0.0 drops the tail stratum
    assert got["de"] == 4000  # rate 1.0 keeps every row
    assert 0.05 * 14_000 < got["en"] < 0.15 * 14_000


def test_split_entity_stable_and_partitions_cover(spark):
    # duplicate keys must land in one split (no train/eval leakage)
    df = spark.range(0, 5000).withColumn("key", F.col("id") % 500)
    out = train_val_split(df, "key", val_frac=0.2, test_frac=0.1, seed="s")
    per_key = out.groupBy("key").agg(F.countDistinct("split").alias("k")).collect()
    assert all(r["k"] == 1 for r in per_key)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 5000


def test_bucket_matches_duckdb(spark):
    import duckdb

    df = spark.range(0, 200).select(
        "id", hash_bucket(F.col("id"), seed="z").alias("b")
    )
    got = {(r["id"], r["b"]) for r in df.collect()}
    exp = {
        (i, b)
        for i, b in duckdb.sql(
            "SELECT i, ('0x' || substr(md5(i::VARCHAR || '|z'), 1, 15))::BIGINT % 1000000 "
            "FROM range(200) t(i)"
        ).fetchall()
    }
    assert got == exp


def test_nested_samples_are_monotone(spark):
    """sample(r1) ⊆ sample(r2) for r1 < r2 — threshold semantics make
    samples nested, so a 1% pilot is always a subset of the 10% run
    (progressive scale-up without rescanning discarded rows)."""
    df = spark.range(0, 5000)
    prev: set = set()
    for rate in (0.01, 0.05, 0.2, 0.6, 1.0):
        cur = {r["id"] for r in hash_sample(df, "id", rate, seed="n").collect()}
        assert prev <= cur
        prev = cur
    assert prev == set(range(5000))


def test_split_on_pages_url_key_entity_stable(spark):
    """North-rule shape: string url keys; duplicated urls (the pages
    generator plants dup_rate reused urls) must land in ONE split."""
    from fairtracks_validator_spark.operators.sampling import train_val_split
    from fairtracks_validator_spark.sources.pages import pages

    df = pages(spark, 20_000, dup_rate=0.05)
    out = train_val_split(df, "url", val_frac=0.15, seed="pg")
    bad = (
        out.groupBy("url")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert bad == 0
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert 0.10 < counts["val"] / 20_000 < 0.20


# ------------------------------------------------------ importance sampling
def test_importance_sample_rate_and_proportionality(spark):
    from fairtracks_validator_spark.operators.sampling import importance_sample

    # weights 1 vs 4: heavy rows kept ~4x as often, overall rate ~ target
    df = spark.range(0, 40_000).withColumn(
        "w", F.when(F.col("id") % 2 == 0, F.lit(1)).otherwise(F.lit(4))
    )
    kept = importance_sample(df, "id", "w", 0.2, seed="imp")
    light = kept.where(F.col("w") == 1).count()
    heavy = kept.where(F.col("w") == 4).count()
    total = light + heavy
    assert 0.2 * 40_000 * 0.9 < total < 0.2 * 40_000 * 1.1
    assert 3.0 < heavy / max(light, 1) < 5.0


def test_importance_sample_saturation_and_determinism(spark):
    from fairtracks_validator_spark.operators.sampling import importance_sample

    # huge weight saturates at p=1: ALL such rows kept, repartition-invariant
    df = spark.range(0, 2_000).withColumn(
        "w", F.when(F.col("id") < 100, F.lit(10_000)).otherwise(F.lit(1))
    )
    a = importance_sample(df, "id", "w", 0.1, seed="s")
    b = importance_sample(df.repartition(7), "id", "w", 0.1, seed="s")
    ids_a = {r["id"] for r in a.select("id").collect()}
    ids_b = {r["id"] for r in b.select("id").collect()}
    assert ids_a == ids_b
    assert set(range(100)) <= ids_a  # saturated rows always kept


def test_importance_sample_explicit_mean_and_errors(spark):
    from fairtracks_validator_spark.operators.sampling import importance_sample

    df = spark.range(0, 1_000).withColumn("w", F.lit(2))
    # explicit mean == computed mean -> identical selection, zero extra scan
    a = {r["id"] for r in importance_sample(df, "id", "w", 0.3).collect()}
    b = {r["id"] for r in importance_sample(
        df, "id", "w", 0.3, mean_weight=2.0).collect()}
    assert a == b
    with pytest.raises(ValueError, match="target_rate"):
        importance_sample(df, "id", "w", 1.5)
    zero = df.withColumn("w", F.lit(0))
    with pytest.raises(ValueError, match="mean_weight"):
        importance_sample(zero, "id", "w", 0.5)


# ------------------------------------------------------ temperature rates
def test_temperature_rates_flattens_head():
    from fairtracks_validator_spark.operators.sampling import temperature_rates

    counts = {"en": 900_000, "de": 90_000, "fr": 10_000}
    r_uniform = temperature_rates(counts, alpha=1.0, target_total=100_000)
    # alpha=1: proportional sampling, every stratum same rate
    assert abs(r_uniform["en"] - r_uniform["fr"]) < 1e-9
    r_flat = temperature_rates(counts, alpha=0.3, target_total=100_000)
    # alpha<1: tail rate rises above head rate
    assert r_flat["fr"] > r_flat["en"]
    # expected kept mass == target
    got = sum(r_flat[k] * counts[k] for k in counts)
    assert abs(got - 100_000) < 1.0


def test_temperature_rates_water_filling_cap():
    from fairtracks_validator_spark.operators.sampling import temperature_rates

    # tiny stratum would need rate > 1 -> capped at 1.0, mass refilled
    counts = {"big": 1_000_000, "tiny": 50}
    r = temperature_rates(counts, alpha=0.0, target_total=10_000)
    assert r["tiny"] == 1.0
    got = r["big"] * counts["big"] + counts["tiny"]
    assert abs(got - 10_000) < 1.0
    # degenerate inputs
    assert temperature_rates({}, 0.5, 100) == {}
    assert temperature_rates(counts, 0.5, 0) == {"big": 0.0, "tiny": 0.0}


def test_cap_per_group_semantics(spark):
    from fairtracks_validator_spark.operators.sampling import cap_per_group
    import pyspark.sql.functions as F

    rows = [(i, "big") for i in range(10)] + [(100, "small"), (101, "small")]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    out = cap_per_group(df, "domain", "doc_id", cap=3)
    kept = out.where("keep").groupBy("domain").count().collect()
    assert {r["domain"]: r["count"] for r in kept} == {"big": 3, "small": 2}
    # all rows present, keep is a flag not a filter
    assert out.count() == 12
    # under-quota group entirely kept
    assert out.where("domain = 'small' AND NOT keep").count() == 0


def test_cap_per_group_deterministic_and_partition_invariant(spark):
    from fairtracks_validator_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(
        [(i, "d") for i in range(50)], "doc_id long, domain string"
    )
    a = {r["doc_id"] for r in
         cap_per_group(df, "domain", "doc_id", 10).where("keep").collect()}
    b = {r["doc_id"] for r in
         cap_per_group(df.repartition(7), "domain", "doc_id", 10)
         .where("keep").collect()}
    assert a == b and len(a) == 10
    # different seed -> (almost surely) different winners
    c = {r["doc_id"] for r in
         cap_per_group(df, "domain", "doc_id", 10, seed="x")
         .where("keep").collect()}
    assert c != a


def test_cap_per_group_edge_caps(spark):
    from fairtracks_validator_spark.operators.sampling import cap_per_group
    import pytest as _pytest

    df = spark.createDataFrame([(1, "d"), (2, "d")], "doc_id long, domain string")
    assert cap_per_group(df, "domain", "doc_id", 0).where("keep").count() == 0
    with _pytest.raises(ValueError, match="cap must be"):
        cap_per_group(df, "domain", "doc_id", -1)


def test_cap_per_group_null_group_not_dropped(spark):
    from fairtracks_validator_spark.operators.sampling import cap_per_group

    rows = [(i, None) for i in range(5)] + [(10, "d"), (11, "d")]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    out = cap_per_group(df, "domain", "doc_id", cap=2)
    assert out.count() == 7                      # null stratum survives
    kept_null = out.where("domain IS NULL AND keep").count()
    assert kept_null == 2                        # capped like any group
