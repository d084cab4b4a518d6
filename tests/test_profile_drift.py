"""multi_histogram + profile/drift CLI (r5 monitoring loop)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from fairtracks_validator_spark.operators.stats import histogram, multi_histogram


def test_multi_histogram_matches_single(spark):
    df = spark.range(1000).select(
        (F.col("id") % 100).cast("double").alias("a"),
        (F.col("id") % 7).cast("double").alias("b"),
    )
    multi = multi_histogram(df, [("a", 0.0, 100.0, 10), ("b", 0.0, 7.0, 7)])
    for col, lo, hi, b in [("a", 0.0, 100.0, 10), ("b", 0.0, 7.0, 7)]:
        single = {
            (r["bucket"], r["lo_edge"], r["hi_edge"], r["n"])
            for r in histogram(df, col, lo, hi, b).collect()
        }
        got = {
            (r["bucket"], r["lo_edge"], r["hi_edge"], r["n"])
            for r in multi.where(F.col("column") == col).collect()
        }
        assert got == single, col


def test_multi_histogram_single_scan(spark, tmp_path):
    p = str(tmp_path / "mh.parquet")
    spark.range(100).select(
        F.col("id").cast("double").alias("a"),
        (F.col("id") * 2).cast("double").alias("b"),
    ).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    plan = multi_histogram(
        df, [("a", 0.0, 100.0, 5), ("b", 0.0, 200.0, 5)]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan


def test_multi_histogram_null_and_overflow(spark):
    df = spark.createDataFrame(
        [(None,), (-5.0,), (0.0,), (99.0,), (100.0,), (250.0,)],
        "v double",
    )
    cells = {
        r["bucket"]: r["n"]
        for r in multi_histogram(df, [("v", 0.0, 100.0, 10)]).collect()
    }
    # null dropped; -5 underflow (0); 100 and 250 overflow (11)
    assert cells[0] == 1 and cells[11] == 2 and sum(cells.values()) == 5


def test_multi_histogram_rejects_bad_spec(spark):
    import pytest

    df = spark.range(5).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError):
        multi_histogram(df, [])
    with pytest.raises(ValueError):
        multi_histogram(df, [("v", 5.0, 5.0, 4)])


def test_cli_profile_then_drift_roundtrip(spark, tmp_path, capsys):
    from fairtracks_validator_spark.cli import main

    src = "/root/testdata/sf0.001/documents.parquet"
    base = str(tmp_path / "baseline")
    rc = main(["profile", "--input", src, "--out", base,
               "--columns", "lang,n_chars"])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["columns"] == 2 and payload["histogram_columns"] == 1

    # same table vs its own baseline: nothing flags, exit 0
    rc = main(["drift", "--input", src, "--baseline", base])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["flagged"] == [] and payload["missing_columns"] == []

    # shifted copy (n_chars x10): PSI must flag, exit 1
    shifted = str(tmp_path / "shifted.parquet")
    spark.read.parquet(src).withColumn(
        "n_chars", F.col("n_chars") * 10
    ).write.mode("overwrite").parquet(shifted)
    out = str(tmp_path / "report")
    rc = main(["drift", "--input", shifted, "--baseline", base, "--out", out])
    assert rc == 1
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert any(f["metric"] == "psi" and f["column"] == "n_chars"
               for f in payload["flagged"])
    rep = spark.read.parquet(out)
    assert set(rep.columns) == {
        "column", "metric", "baseline", "current", "value", "flagged",
    }

    # baseline column missing from the input: reported + non-zero exit
    nolang = str(tmp_path / "nolang.parquet")
    spark.read.parquet(src).drop("lang").write.mode("overwrite").parquet(nolang)
    rc = main(["drift", "--input", nolang, "--baseline", base])
    assert rc == 1
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["missing_columns"] == ["lang"]
