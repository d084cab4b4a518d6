"""SemDeDup — cluster-blocked semantic deduplication (Abbas et al. 2023)."""

from __future__ import annotations

import pytest

from fairtracks_validator_spark.operators.dedup import semantic_dedup

# two well-separated clusters on the unit circle's axes
CENTS = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]


def test_drops_near_dup_keeps_outlier(spark):
    # cluster 0: ids 1,2 nearly parallel (cos≈1) -> one dropped;
    # id 3 orthogonal-ish member of cluster 1 survives alone
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.05]), (3, [0.0, 1.0])],
        "id long, vec array<double>",
    )
    out = {r["id"]: r for r in
           semantic_dedup(df, "id", "vec", CENTS, threshold=0.99).collect()}
    # keep order is centroid_sim ASC: id 2 (slightly off-axis, LOWER sim to
    # centroid 0) is the paper's "outlier", kept; id 1 (exactly the
    # centroid) is suppressed by it
    assert out[2]["keep"] is True
    assert out[1]["keep"] is False
    assert out[3]["keep"] is True
    assert out[1]["cluster"] == 0 and out[3]["cluster"] == 1
    assert all(not r["capped"] for r in out.values())


def test_tie_on_centroid_sim_keeps_smaller_id(spark):
    df = spark.createDataFrame(
        [(7, [2.0, 0.0]), (9, [4.0, 0.0])],  # same direction, same cosine
        "id long, vec array<double>",
    )
    out = {r["id"]: r["keep"] for r in
           semantic_dedup(df, "id", "vec", CENTS, threshold=0.99).collect()}
    assert out == {7: True, 9: False}


def test_cross_cluster_pairs_never_compared(spark):
    # identical vectors would be dups, but they sit in different clusters
    # (assignment splits them) only if they differ; here use two vectors
    # that are near-dups of each other but each nearest a different centroid
    df = spark.createDataFrame(
        [(1, [1.0, 0.9]), (2, [0.9, 1.0])],  # cos(1,2) ≈ 0.994
        "id long, vec array<double>",
    )
    out = {r["id"]: r for r in
           semantic_dedup(df, "id", "vec", CENTS, threshold=0.99).collect()}
    assert out[1]["cluster"] == 0 and out[2]["cluster"] == 1
    assert out[1]["keep"] and out[2]["keep"]


def test_capped_cluster_skips_pair_expansion(spark):
    df = spark.createDataFrame(
        [(i, [1.0, 0.0001 * i]) for i in range(5)],
        "id long, vec array<double>",
    )
    out = semantic_dedup(df, "id", "vec", CENTS, threshold=0.9,
                         max_cluster_size=2).collect()
    assert all(r["capped"] for r in out)
    assert all(r["keep"] for r in out)  # capped -> no drops, not silent


def test_zero_vector_excluded_zero_centroid_raises(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0])], "id long, vec array<double>"
    )
    out = semantic_dedup(df, "id", "vec", CENTS).collect()
    assert {r["id"] for r in out} == {2}
    with pytest.raises(ValueError, match="zero norm"):
        semantic_dedup(df, "id", "vec", [(0, [0.0, 0.0])])


def test_composes_with_kmeans_fit(spark):
    from fairtracks_validator_spark.operators.similarity import kmeans_fit

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    import pyspark.sql.functions as F

    clones = emb.where(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 900000).alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionByName(clones)
    cents = kmeans_fit(corpus, "vec_id", "embedding", k=4, iters=2)
    out = semantic_dedup(corpus, "vec_id", "embedding", cents, threshold=0.999)
    dropped = {r["id"] for r in out.where("NOT keep").collect()}
    # each planted exact clone pair loses exactly its higher-id member
    # (tie on centroid_sim -> smaller id kept)
    assert dropped == {900000, 900001, 900002}
    assert out.count() == corpus.count()


def test_backends_agree_and_validate(spark):
    import pyspark.sql.functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    clones = emb.where(F.col("vec_id") < 4).select(
        (F.col("vec_id") + 900000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(clones.withColumn("label", F.lit(None).cast("string")))
    cents = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
             for r in emb.where("vec_id < 6").collect()]
    a = sorted(
        (r["id"], r["keep"], r["cluster"])
        for r in semantic_dedup(corpus, "vec_id", "embedding", cents, 0.95,
                                pairs_backend="arrow").collect()
    )
    h = sorted(
        (r["id"], r["keep"], r["cluster"])
        for r in semantic_dedup(corpus, "vec_id", "embedding", cents, 0.95,
                                pairs_backend="hof").collect()
    )
    assert a == h
    assert sum(1 for _, k, _ in a if not k) == 4  # the planted clones
    with pytest.raises(ValueError, match="pairs_backend"):
        semantic_dedup(corpus, "vec_id", "embedding", cents,
                       pairs_backend="nope")


def test_arrow_backend_mixed_dims_no_cross_dim_drop(spark):
    # a 2-dim and a 3-dim vector can never suppress each other (their
    # cosine is undefined); same-dim dup still drops
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0, 0.0]), (3, [2.0, 0.0])],
        "id long, vec array<double>",
    )
    out = {r["id"]: r["keep"] for r in
           semantic_dedup(df, "id", "vec", CENTS, threshold=0.99).collect()}
    assert out == {1: True, 2: True, 3: False}


def test_cli_semdedup_subcommand(spark, tmp_path):
    import json
    import subprocess
    import sys

    import pyspark.sql.functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    clones = emb.where(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 900000).alias("vec_id"), "embedding", "label"
    )
    emb.unionByName(clones).write.mode("overwrite").parquet(
        str(tmp_path / "emb")
    )
    r = subprocess.run(
        [sys.executable, "-m", "fairtracks_validator_spark.cli", "semdedup",
         "--input", str(tmp_path / "emb"), "--out", str(tmp_path / "out"),
         "--k", "4", "--threshold", "0.999"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["rows"] == 503
    assert payload["dropped"] == 3          # the planted exact clones
    assert payload["capped_members"] == 0
    kept = spark.read.parquet(str(tmp_path / "out"))
    assert kept.where("NOT keep").count() == 3


def test_cli_semdedup_rejects_string_id(spark, tmp_path):
    import subprocess
    import sys

    spark.createDataFrame(
        [("a", [1.0, 0.0])], "vec_id string, embedding array<double>"
    ).write.mode("overwrite").parquet(str(tmp_path / "emb"))
    r = subprocess.run(
        [sys.executable, "-m", "fairtracks_validator_spark.cli", "semdedup",
         "--input", str(tmp_path / "emb"), "--out", str(tmp_path / "out")],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 2
    assert "must be numeric" in r.stderr


def test_duplicate_ids_backends_agree(spark):
    # rows sharing (centroid_sim, id) suppress NEITHER on either backend
    # (hof: strict-less predicate; arrow: strict-less key prefix)
    df = spark.createDataFrame(
        [(7, [1.0, 0.0]), (7, [1.0, 0.0]), (8, [1.0, 0.0])],
        "id long, vec array<double>",
    )
    for backend in ("arrow", "hof"):
        out = semantic_dedup(df, "id", "vec", CENTS, threshold=0.99,
                             pairs_backend=backend)
        keeps = sorted((r["id"], r["keep"]) for r in out.collect())
        assert keeps == [(7, True), (7, True), (8, False)], backend
