"""resolve_keepers (dedup keeper selection) and unigram_logprob."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from fairtracks_validator_spark.operators.dedup import resolve_keepers
from fairtracks_validator_spark.operators.scoring import unigram_logprob


def test_keeper_argmax_and_tiebreak(spark):
    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "id long, cluster_rep long",
    )
    scores = spark.createDataFrame(
        # cluster 1: id=2 wins on score; cluster 10: tie -> min id (10) wins
        [(1, 0.5), (2, 0.9), (3, 0.7), (10, 0.4), (11, 0.4)],
        "id long, score double",
    )
    out = resolve_keepers(comps, scores)
    kept = {r["id"] for r in out.collect() if r["keep"]}
    assert kept == {2, 10}
    # every member still present, exactly one keeper per cluster
    assert out.count() == 5
    per_cluster = {
        r["cluster_rep"]: r["n"]
        for r in out.where("keep")
        .groupBy("cluster_rep")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per_cluster == {1: 1, 10: 1}


def test_unigram_logprob_hand_computed(spark):
    # corpus: "a a b" + "b c" -> counts a=2 b=2 c=1, total=5
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in unigram_logprob(df, "doc_id", "text").collect()}
    lp = lambda c: math.log(c / 5.0)
    assert out[1]["logprob"] == pytest.approx(
        round((lp(2) + lp(2) + lp(2)) / 3, 4)
    )
    assert out[2]["logprob"] == pytest.approx(round((lp(2) + lp(1)) / 2, 4))
    assert out[2]["n_tokens"] == 2
    assert 3 not in out  # empty doc has no tokens, no row


def test_training_pipeline_stages(spark):
    from fairtracks_validator_spark.operators.pipeline import (
        prepare_training_corpus,
    )

    good = "the quick brown fox jumps over the lazy dog on a sunny day in town"
    rows = (
        [(i, good + f" case {i}") for i in range(100)]  # unique, pass gate
        + [(100 + i, good + " case 0") for i in range(5)]  # exact dups of id 0
        + [(200, "a a a"), (201, "")]  # fail the gate
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = prepare_training_corpus(
        df, "doc_id", "text", min_words=5, sample_rate=1.0, val_frac=0.2
    )
    ids = {r["doc_id"] for r in out.collect()}
    assert 200 not in ids and 201 not in ids  # gate
    assert ids & set(range(100, 105)) == set()  # dups dropped, first kept
    assert 0 in ids and len(ids) == 100
    splits = {r["split"] for r in out.collect()}
    assert splits <= {"train", "val"} and len(splits) == 2


def test_training_pipeline_single_shuffle(spark):
    from fairtracks_validator_spark.operators.pipeline import (
        prepare_training_corpus,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = prepare_training_corpus(docs, "doc_id", "text")
    txt = out._jdf.queryExecution().executedPlan().toString()
    assert txt.count("Exchange hashpartitioning") == 1, txt
    assert "EvalPython" not in txt


def test_pack_sequences_semantics(spark):
    from fairtracks_validator_spark.operators.pipeline import pack_sequences

    df = spark.createDataFrame(
        [(i, 100) for i in range(50)], "doc_id long, n_tok int"
    )
    out = pack_sequences(df, "doc_id", "n_tok", seq_len=250, buckets=1, seed="t")
    rows = sorted(
        (r["doc_id"], r["seq_id"], r["seq_offset"]) for r in out.collect()
    )
    # 100-token docs into 250-token seqs: starts 0,100,200,300,... →
    # seq_id = (100*i)//250, offset = (100*i) % 250
    assert rows == [(i, (100 * i) // 250, (100 * i) % 250) for i in range(50)]


def test_pack_sequences_partition_invariant(spark):
    from fairtracks_validator_spark.operators.pipeline import pack_sequences

    base = [(i, 1 + i % 37) for i in range(1000)]
    a = pack_sequences(
        spark.createDataFrame(base, "doc_id long, n_tok int").repartition(3),
        "doc_id", "n_tok", 128, buckets=4,
    )
    b = pack_sequences(
        spark.createDataFrame(base, "doc_id long, n_tok int").repartition(17),
        "doc_id", "n_tok", 128, buckets=4,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # every bucket's offsets stay inside [0, seq_len)
    assert a.where("seq_offset < 0 or seq_offset >= 128").count() == 0


def test_unigram_folded_matches_exact_when_vocab_covers(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "")], "doc_id long, text string"
    )
    exact = {
        (r["doc_id"], r["logprob"], r["n_tokens"])
        for r in unigram_logprob(df, "doc_id", "text").collect()
    }
    folded = {
        (r["doc_id"], r["logprob"], r["n_tokens"])
        for r in unigram_logprob(df, "doc_id", "text", max_vocab=100).collect()
    }
    assert folded == exact


def test_unigram_folded_zero_shuffle_and_oov(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b zzz")], "doc_id long, text string"
    )
    out = unigram_logprob(df, "doc_id", "text", max_vocab=1, oov_logprob=-9.0)
    txt = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in txt  # folded map: map-only scoring
    import math
    rows = {r["doc_id"]: r["logprob"] for r in out.collect()}
    # vocab truncated to top-1 ("a", cnt 2 of 5); everything else -> -9.0
    assert rows[1] == round((math.log(2 / 5) * 2 - 9.0) / 3, 4)
    assert rows[2] == round((-9.0 - 9.0) / 2, 4)
