"""bigram stupid-backoff LM, CCNet perplexity buckets, hashed linear
classifier (fastText shape)."""

from __future__ import annotations

import math

import pytest

from fairtracks_validator_spark.operators.scoring import (
    bigram_logprob,
    ccnet_buckets,
    hashed_linear_score,
    make_hash_weights,
)


def test_bigram_hand_computed(spark):
    # corpus: "a b a b" + "b c"
    # unigrams: a=2 b=3 c=1, T=6; bigrams: (a,b)=2 (b,a)=1 (b,c)=1
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "b c"), (3, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bigram_logprob(df, "doc_id", "text").collect()}
    # doc 1: pos0 a: ln(2/6); a->b: ln(2/2); b->a: ln(1/3); a->b: ln(2/2)
    exp1 = (math.log(2 / 6) + math.log(1.0) + math.log(1 / 3) + math.log(1.0)) / 4
    assert out[1]["logprob"] == pytest.approx(round(exp1, 4))
    assert out[1]["n_tokens"] == 4
    # doc 2: pos0 b: ln(3/6); b->c: ln(1/3)
    exp2 = (math.log(3 / 6) + math.log(1 / 3)) / 2
    assert out[2]["logprob"] == pytest.approx(round(exp2, 4))
    assert 3 not in out  # empty doc -> no row


def test_bigram_capped_equals_exact_when_uncapped(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["the cat sat", "the cat ran", "a dog sat on the mat", "x y z x y"]
        )],
        "doc_id long, text string",
    )
    exact = sorted(bigram_logprob(df, "doc_id", "text").collect())
    capped = sorted(
        bigram_logprob(df, "doc_id", "text", max_vocab=10_000,
                       max_bigrams=10_000).collect()
    )
    assert exact == capped


def test_bigram_backoff_branch(spark):
    # cap the model to top-1 unigram and top-1 bigram; everything else
    # must take ln(alpha) + OOV/unigram mass — exercise every branch.
    # corpus "a a a b": uni a=3 b=1 T=4, top-1 uni = a;
    # bigrams (a,a)=2 (a,b)=1, top-1 bigram = (a,a).
    df = spark.createDataFrame([(1, "a a a b")], "doc_id long, text string")
    out = bigram_logprob(
        df, "doc_id", "text", alpha=0.4, max_vocab=1, max_bigrams=1
    ).collect()[0]
    la = math.log(0.4)
    oov = math.log(1 / 4)
    exp = (
        math.log(3 / 4)          # pos0 'a': unigram, in vocab
        + math.log(2 / 3)        # a->a in model
        + math.log(2 / 3)        # a->a again
        + (la + oov)             # a->b backs off; 'b' OOV -> uniform mass
    ) / 4
    assert out["logprob"] == pytest.approx(round(exp, 4))


def test_bigram_train_df_heldout(spark):
    train = spark.createDataFrame([(100, "a b")], "doc_id long, text string")
    score = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    out = bigram_logprob(score, "doc_id", "text", train_df=train).collect()[0]
    # model: uni a=1 b=1 T=2; bigram (a,b)=1.
    # pos0 a: ln(1/2); a->b: ln(1/1); b->c: backoff, c OOV: ln(.4)+ln(1/2)
    exp = (math.log(0.5) + 0.0 + math.log(0.4) + math.log(0.5)) / 3
    assert out["logprob"] == pytest.approx(round(exp, 4))


def test_ccnet_buckets_semantics(spark):
    # 6 docs one lang: terciles of score; higher score = head
    rows = [(i, "en", float(s)) for i, s in enumerate([-1, -2, -3, -4, -5, -6])]
    df = spark.createDataFrame(rows, "doc_id long, lang string, logprob double")
    out = {r["doc_id"]: r["bucket"]
           for r in ccnet_buckets(df, "doc_id", "logprob", "lang").collect()}
    # cutoffs: q(2/3) of [-6..-1] = -2.333..., q(1/3) = -4.666...
    assert out == {0: "head", 1: "head", 2: "middle", 3: "middle",
                   4: "tail", 5: "tail"}


def test_ccnet_buckets_per_language_independent(spark):
    # same scores shifted per language — bucket assignment must be
    # computed within language, not globally
    rows = [(i, "en", float(-i)) for i in range(1, 7)]
    rows += [(100 + i, "de", float(-i - 100)) for i in range(1, 7)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, logprob double")
    out = ccnet_buckets(df, "doc_id", "logprob", "lang").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r["bucket"])
    for lang in ("en", "de"):
        assert sorted(by_lang[lang]) == ["head", "head", "middle", "middle",
                                         "tail", "tail"]


def test_hashed_linear_hand_computed(spark):
    import hashlib

    dim = 16
    w = make_hash_weights(dim, "t")
    df = spark.createDataFrame([(1, "a b"), (2, "")], "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in hashed_linear_score(df, "doc_id", "text", w).collect()}

    def bucket(f):
        return int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % dim

    feats = ["a", "b", "a b"]  # unigrams + adjacent bigram
    z = sum(w[bucket(f)] for f in feats) / len(feats)
    assert out[1]["score"] == pytest.approx(round(1 / (1 + math.exp(-z)), 4))
    assert out[1]["n_features"] == 3
    assert 2 not in out  # empty doc skipped


def test_hashed_linear_join_path_matches_fold(spark):
    dim = 64
    w = make_hash_weights(dim, "p")
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["the cat sat on the mat", "la la la", "one two three four"]
        )],
        "doc_id long, text string",
    )
    fold = sorted(hashed_linear_score(df, "doc_id", "text", w).collect())
    wdf = spark.createDataFrame(
        [(b, x) for b, x in enumerate(w)], "bucket long, weight double"
    )
    join = sorted(hashed_linear_score(df, "doc_id", "text", wdf, dim=dim).collect())
    assert fold == join


def test_hashed_linear_validations(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="dim is required"):
        hashed_linear_score(df, "doc_id", "text",
                            spark.createDataFrame([(0, 0.0)],
                                                  "bucket long, weight double"))
    with pytest.raises(ValueError, match="fold cap"):
        hashed_linear_score(df, "doc_id", "text", [0.0] * 5000)
    with pytest.raises(ValueError, match="!= dim"):
        hashed_linear_score(df, "doc_id", "text", [0.0] * 8, dim=16)


def test_lm_paths_have_no_python_udf(spark):
    # folded classifier and capped bigram scoring must stay JVM-side
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan1 = hashed_linear_score(
        df, "doc_id", "text", make_hash_weights(8)
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan1 and "ArrowEvalPython" not in plan1
    plan2 = bigram_logprob(
        df, "doc_id", "text", max_vocab=8, max_bigrams=8
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan2 and "ArrowEvalPython" not in plan2


def test_ccnet_buckets_null_lang_not_dropped(spark):
    rows = [(i, None, float(-i)) for i in range(1, 7)]
    rows += [(100, "en", -1.0), (101, "en", -2.0), (102, "en", -3.0)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, logprob double")
    out = ccnet_buckets(df, "doc_id", "logprob", "lang")
    assert out.count() == 9                      # null stratum survives
    nulls = {r["doc_id"]: r["bucket"] for r in out.where("lang IS NULL").collect()}
    assert sorted(nulls.values()) == ["head", "head", "middle", "middle",
                                      "tail", "tail"]


def test_hashed_linear_zero_dim_rejected(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="dim must be > 0"):
        hashed_linear_score(df, "doc_id", "text", [])


def test_hashed_linear_xxhash64_path(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, "la la la")], "doc_id long, text string"
    )
    w = make_hash_weights(32, "x")
    out = hashed_linear_score(df, "doc_id", "text", w, hash_fn="xxhash64")
    rows = sorted(out.collect())
    # deterministic across runs, same n_features as md5 path, scores differ
    # in general (different bucketing)
    again = sorted(
        hashed_linear_score(df, "doc_id", "text", w,
                            hash_fn="xxhash64").collect()
    )
    assert rows == again
    md5_rows = sorted(hashed_linear_score(df, "doc_id", "text", w).collect())
    assert [r["n_features"] for r in rows] == [r["n_features"] for r in md5_rows]
    plan = hashed_linear_score(
        df, "doc_id", "text", w, hash_fn="xxhash64"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    with pytest.raises(ValueError, match="hash_fn"):
        hashed_linear_score(df, "doc_id", "text", w, hash_fn="sha9")
