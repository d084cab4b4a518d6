"""spark-submit CLI entry point: resumable validate run end-to-end."""

from __future__ import annotations

import json

from fairtracks_validator_spark.cli import main
from fairtracks_validator_spark.sources.pages import pages


def test_cli_validate_resumable(spark, tmp_path, capsys):
    src = str(tmp_path / "pages.parquet")
    pages(spark, 300).write.parquet(src)
    schema_file = tmp_path / "schema.json"
    schema_file.write_text(json.dumps({
        "$id": "pages/1.0",
        "required": ["url"],
        "primary_key": ["url"],
        "properties": {"lang": {"enum": ["en", "de", "es", "fr",
                                         "it", "pt", "nl", "pl"]}},
    }))
    out = str(tmp_path / "out")

    # first run processes a slice; second run resumes the rest
    rc1 = main(["validate", "--input", src, "--schema", str(schema_file),
                "--out", out, "--key-col", "url", "--partitions", "8",
                "--max-partitions", "3", "--run-id", "a"])
    rc2 = main(["validate", "--input", src, "--schema", str(schema_file),
                "--out", out, "--key-col", "url", "--partitions", "8",
                "--run-id", "b"])
    lines = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]

    # full corpus has planted violations (bad langs + dup urls) ⇒ non-zero
    # exit once all partitions are processed; the partial first run's exit
    # reflects only the partitions processed so far
    assert rc1 in (0, 1) and rc2 == 1
    run1, tot1, run2, tot2 = lines
    assert len(run1["processed"]) == 3
    assert set(run2["skipped"]) == set(run1["processed"])
    assert tot2["rows"] == 300
    assert tot2["violations"] > 0

    verd = spark.read.parquet(f"{out}/verdicts")
    assert verd.count() == 300
    assert {r["status"] for r in verd.select("status").distinct().collect()} <= {
        "ok", "failed"
    }

    # idempotent third run: nothing left to process
    rc3 = main(["validate", "--input", src, "--schema", str(schema_file),
                "--out", out, "--key-col", "url", "--run-id", "c",
                "--partitions", "8"])
    assert rc3 == 1  # violations still present in lineage totals
    run3 = json.loads(capsys.readouterr().out.strip().splitlines()[0])
    assert run3["processed"] == []


def test_cli_default_ord_distinguishes_identical_dup_rows(spark, tmp_path, capsys):
    """Fully-identical duplicate rows (the most common dup shape) must get
    DISTINCT (source, ord) identities under the default positional ord — a
    content-hash ord collapsed them and the registry dup check went blind
    (ADVICE r2)."""
    import pandas as pd

    src = str(tmp_path / "pages.parquet")
    pd.DataFrame(
        {"url": ["u1", "u1", "u2"], "lang": ["en", "en", "en"]}
    ).to_parquet(src)
    schema_file = tmp_path / "schema.json"
    schema_file.write_text(json.dumps({
        "$id": "pages/1.0", "primary_key": ["url"],
        "properties": {"lang": {"enum": ["en"]}},
    }))
    out = str(tmp_path / "out")
    rc = main(["validate", "--input", src, "--schema", str(schema_file),
               "--out", out, "--key-col", "url", "--partitions", "2",
               "--run-id", "a"])
    capsys.readouterr()
    assert rc == 1
    viol = spark.read.parquet(f"{out}/violations")
    dup = viol.where(viol.check_id == "pk").collect()
    # exactly one of the two identical u1 rows is blamed as the duplicate
    assert len(dup) == 1 and dup[0]["source"] == "u1"


def test_cli_prepare_subcommand(spark, tmp_path):
    from fairtracks_validator_spark.cli import main

    out = str(tmp_path / "prep_out")
    rc = main([
        "prepare",
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--out", out,
        "--id-col", "doc_id", "--text-col", "text",
        "--min-words", "25", "--sample-rate", "0.5", "--val-frac", "0.2",
    ])
    assert rc == 0
    got = spark.read.parquet(out)
    assert set(got.columns) >= {"doc_id", "text", "split"}
    n = got.count()
    assert 0 < n < 500  # gate + 50% sample removed rows
    # deterministic: same inputs -> identical output set
    out2 = str(tmp_path / "prep_out2")
    main([
        "prepare", "--input", "/root/testdata/sf0.001/documents.parquet",
        "--out", out2, "--id-col", "doc_id", "--text-col", "text",
        "--min-words", "25", "--sample-rate", "0.5", "--val-frac", "0.2",
    ])
    a = {(r["doc_id"], r["split"]) for r in got.select("doc_id", "split").collect()}
    b = {(r["doc_id"], r["split"])
         for r in spark.read.parquet(out2).select("doc_id", "split").collect()}
    assert a == b


def test_cli_dedup_subcommand(spark, tmp_path):
    import pyspark.sql.functions as F

    from fairtracks_validator_spark.cli import main

    # corpus with planted near-dup clones (ids 9000xx duplicate low ids)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    clones = docs.where(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 900000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra extra")).alias("text"),
    )
    src = str(tmp_path / "dedup_src")
    docs.select("doc_id", "text").unionByName(clones).write.parquet(src)

    out = str(tmp_path / "dedup_out")
    rc = main([
        "dedup", "--input", src, "--out", out,
        "--id-col", "doc_id", "--text-col", "text", "--threshold", "0.5",
    ])
    assert rc == 0
    got = spark.read.parquet(out)
    assert set(got.columns) == {"doc_id", "cluster_rep", "keep"}
    # every planted clone clusters with its original; one keeper per cluster
    reps = {r["doc_id"]: r["cluster_rep"] for r in got.collect()}
    for i in range(10):
        assert reps.get(900000 + i) == reps.get(i) == i
    keepers = got.groupBy("cluster_rep").agg(
        F.sum(F.col("keep").cast("int")).alias("k")
    ).collect()
    assert all(r["k"] == 1 for r in keepers)


def test_cli_dedup_string_url_ids(spark, tmp_path):
    """README scenario: --id-col url (string). The surrogate-id path must
    detect clusters and restore the original urls in the output."""
    import pyspark.sql.functions as F

    from fairtracks_validator_spark.cli import main

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = docs.select(
        F.concat(F.lit("https://ex.com/p"), F.col("doc_id")).alias("url"), "text"
    )
    clones = base.where(F.col("url").endswith("p7") | F.col("url").endswith("p8")).select(
        F.concat(F.col("url"), F.lit("-dup")).alias("url"),
        F.concat(F.col("text"), F.lit(" extra extra")).alias("text"),
    )
    src = str(tmp_path / "durl_src")
    base.unionByName(clones).write.parquet(src)

    out = str(tmp_path / "durl_out")
    rc = main([
        "dedup", "--input", src, "--out", out,
        "--id-col", "url", "--text-col", "text", "--threshold", "0.5",
    ])
    assert rc == 0
    got = spark.read.parquet(out)
    rows = {r["url"]: (r["cluster_rep"], r["keep"]) for r in got.collect()}
    assert rows  # urls restored, string-typed
    assert all(isinstance(u, str) and u.startswith("https://") for u in rows)
    # each planted clone shares a cluster_rep with its original
    for stem in ("https://ex.com/p7", "https://ex.com/p8"):
        assert stem in rows and stem + "-dup" in rows
        assert rows[stem][0] == rows[stem + "-dup"][0]
