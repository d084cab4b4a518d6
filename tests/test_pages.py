"""F8 pages table: generator determinism, extraction invariant, full
validation, partition invariance, checkpoint/resume-equals-fresh."""

from __future__ import annotations

import hashlib
import shutil

import pytest
from pyspark.sql import functions as F

from fairtracks_validator_spark.checkpoint import CheckpointedValidation
from fairtracks_validator_spark.functions.extract import extract_text
from fairtracks_validator_spark.plans.schema_compile import compile_schema
from fairtracks_validator_spark.runner import validate_corpus
from fairtracks_validator_spark.sources.pages import pages, pages_schema_dict

N = 2000


@pytest.fixture(scope="module")
def pages_df(spark):
    return pages(spark, N).withColumn("source", F.col("url")).withColumn(
        "ord", F.col("page_id")
    ).cache()


def test_generator_deterministic_across_parallelism(spark):
    a = pages(spark, 500, partitions=1).orderBy("page_id").collect()
    b = pages(spark, 500, partitions=8).orderBy("page_id").collect()
    assert a == b


def test_extraction_invariant_byte_identical(pages_df):
    """extract_text(html) == text for every non-null-text row (input_hint)."""
    checked = pages_df.where(F.col("text").isNotNull()).select(
        (extract_text("html") == F.col("text")).alias("same")
    )
    n_bad = checked.where(~F.col("same")).count()
    assert n_bad == 0


def test_extraction_golden_hash(pages_df):
    """Version-pinned extractor: corpus-level golden hash must be stable."""
    row = (
        pages_df.where(F.col("text").isNotNull())
        .select(extract_text("html").alias("t"), "page_id")
        .orderBy("page_id")
        .agg(F.md5(F.concat_ws("\x00", F.collect_list("t"))).alias("h"))
        .collect()[0]
    )
    assert row["h"] == hashlib.md5(
        "\x00".join(
            r["text"]
            for r in pages_df.where(F.col("text").isNotNull())
            .orderBy("page_id")
            .select("text")
            .collect()
        ).encode()
    ).hexdigest()


def test_pages_validation_counts(spark, pages_df):
    plan = compile_schema(pages_schema_dict())
    res = validate_corpus({"pages/1.0": (plan, pages_df)})
    by_check = {
        (r["check_id"], r["reason"]): r["count"]
        for r in res.violations.groupBy("check_id", "reason").count().collect()
    }
    # planted anomalies all detected
    assert by_check.get(("pk", "dup_pk"), 0) > 0
    assert by_check.get(("enum:lang", "schema"), 0) > 0
    assert ("required:text", "schema") not in by_check  # text not required
    # url pattern never fires (all urls https)
    assert ("pattern:url", "schema") not in by_check


def test_partition_invariance(spark, pages_df):
    """Same verdicts at repartition(1/8/32) — SURVEY §5.2 property test."""
    plan = compile_schema(pages_schema_dict())

    def verdict_set(df):
        res = validate_corpus({"pages/1.0": (plan, df)})
        return {(r["source"], r["validated"]) for r in res.verdicts.collect()}

    v1 = verdict_set(pages_df.repartition(1))
    v8 = verdict_set(pages_df.repartition(8))
    assert v1 == v8


@pytest.fixture()
def ckpt_dir(tmp_path):
    d = str(tmp_path / "ckpt")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _read_outputs(spark, out_dir):
    verd = spark.read.parquet(f"{out_dir}/verdicts")
    viol = spark.read.parquet(f"{out_dir}/violations")
    return (
        {(r["source"], r["validated"]) for r in verd.collect()},
        {(r["source"], r["check_id"], r["key_str"]) for r in viol.collect()},
    )


def test_checkpoint_resume_equals_fresh(spark, pages_df, ckpt_dir, tmp_path):
    plan = compile_schema(pages_schema_dict())

    # fresh run, all partitions in one go
    fresh = CheckpointedValidation(out_dir=str(tmp_path / "fresh"), n_partitions=16)
    r = fresh.run(pages_df, plan, key_col="url", run_id="fresh")
    assert len(r["processed"]) == 16

    # interrupted run: 5 partitions, then resume the rest
    cv = CheckpointedValidation(out_dir=ckpt_dir, n_partitions=16)
    r1 = cv.run(pages_df, plan, key_col="url", max_partitions=5, run_id="r1")
    assert len(r1["processed"]) == 5
    assert sorted(cv.completed_partitions(spark)) == sorted(r1["processed"])
    r2 = cv.run(pages_df, plan, key_col="url", run_id="r2")
    assert len(r2["processed"]) == 11
    assert set(r2["skipped"]) == set(r1["processed"])
    # idempotent third call: nothing left
    r3 = cv.run(pages_df, plan, key_col="url", run_id="r3")
    assert r3["processed"] == []

    assert _read_outputs(spark, ckpt_dir) == _read_outputs(spark, str(tmp_path / "fresh"))

    # lineage carries metrics for every partition
    lin = spark.read.parquet(f"{ckpt_dir}/lineage")
    assert lin.count() == 16
    assert lin.agg(F.sum("rows_scanned")).collect()[0][0] == N


def test_checkpoint_dup_pk_matches_fresh_run(spark, pages_df, tmp_path):
    """Checkpointed dup-PK detection must equal validate_corpus's, INCLUDING
    duplicates that share their source value with the first holder (source is
    url here, and pages duplicates reuse an earlier row's url by construction
    — the reference flags same-file duplicates too,
    ValidatedJSONSchema.java:378-383). Regression: the registry used to store
    only first_source, so url-keyed duplicates were silently missed."""
    plan = compile_schema(pages_schema_dict())
    fresh = validate_corpus({"pages/1.0": (plan, pages_df)})
    fresh_dups = {
        (r["source"], r["ord"], r["key_str"])
        for r in fresh.violations.where(F.col("reason") == "dup_pk").collect()
    }
    assert len(fresh_dups) > 0  # the fixture plants ~1% duplicates

    cv = CheckpointedValidation(out_dir=str(tmp_path / "dupckpt"), n_partitions=8)
    cv.run(pages_df, plan, key_col="url", run_id="dups")
    ck = spark.read.parquet(f"{tmp_path}/dupckpt/violations")
    ck_dups = {
        (r["source"], r["ord"], r["key_str"])
        for r in ck.where(F.col("reason") == "dup_pk").collect()
    }
    assert ck_dups == fresh_dups


def test_checkpoint_with_fk_registry(spark, tmp_path):
    """FK probes against a frozen external registry inside the checkpointed
    runner (dimension-style referential check, resumable)."""
    from fairtracks_validator_spark.plans.schema_compile import compile_schema

    schema = {
        "$id": "pages_fk/1.0",
        "primary_key": ["url"],
        "properties": {"url": {"type": "string"}},
        "foreign_keys": [{"schema_id": "dim_langs/1.0", "members": ["lang"]}],
    }
    plan = compile_schema(schema)
    df = pages(spark, 500).withColumn("source", F.col("url")).withColumn(
        "ord", F.col("page_id"))
    lang_reg = spark.createDataFrame(
        [("dim_langs/1.0", "pk", f'["{c}"]', "dim") for c in
         ["en", "de", "es", "fr", "it", "pt", "nl", "pl"]],
        "schema_id string, check_id string, key_str string, first_source string",
    )
    cv = CheckpointedValidation(out_dir=str(tmp_path / "fkckpt"), n_partitions=8)
    cv.run(df, plan, key_col="url", max_partitions=3, run_id="a",
           extra_registries={("dim_langs/1.0", "pk"): lang_reg})
    cv.run(df, plan, key_col="url", run_id="b",
           extra_registries={("dim_langs/1.0", "pk"): lang_reg})
    viol = spark.read.parquet(f"{tmp_path}/fkckpt/violations")
    by_reason = {r["reason"]: r["count"] for r in viol.groupBy("reason").count().collect()}
    # the planted bad langs ('xx') miss the dim registry
    assert by_reason.get("fk_missing", 0) > 0
    n_bad_lang = df.where("lang = 'xx'").count()
    assert by_reason["fk_missing"] == n_bad_lang


def test_planted_duplicate_count_is_exact(spark):
    """Module contract: planted anomaly counts are EXACT. Every dup-bucket
    row must collide with a real displayed url (chained dups previously
    copied a base url nobody displays)."""
    df = pages(spark, 50_000, dup_rate=0.05)
    n = df.count()
    n_urls = df.select("url").distinct().count()
    # collisions = rows minus distinct urls; must equal the planted count,
    # which the fixed generator makes countable in closed form
    import pyspark.sql.functions as F

    seed, thr = 42, 50
    ids = spark.range(0, 50_000)
    h = F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(1000))
    ph = F.pmod(F.xxhash64(F.col("id") - 1, F.lit(seed)), F.lit(1000))
    planted = ids.where(
        (h < thr) & (F.col("id") > 0) & ~((ph < thr) & (F.col("id") - 1 > 0))
    ).count()
    assert n - n_urls == planted


def test_extract_text_entity_round_trip():
    """Extractor 1.1.0: builders escape & < > into HTML; extraction
    unescapes AFTER tag-strip, so escaped literal markup in the text
    survives as text (browser semantics) and the round trip is byte-exact
    for any text content (code-review r5 — previously latent against any
    testdata regeneration containing entities)."""
    import html as html_mod

    import pandas as pd

    from fairtracks_validator_spark.functions.extract import extract_text_pd

    texts = [
        "plain words only",
        "a < b && c > d",
        "literal <b>not bold</b> tags in text",
        "amp-entity &amp; stays one level",
    ]
    payloads = pd.Series([
        (
            '<html><body><p>' + html_mod.escape(t, quote=False) + "</p></body></html>"
        ).encode()
        for t in texts
    ])
    out = extract_text_pd(payloads)
    assert list(out) == texts
