"""Gopher-style quality gates, repetition metrics, and heavy hitters.

Covers the north-star "training-data pipeline" text ops added in round 3:
- ``gopher_metrics`` / ``gopher_pass`` (Rae et al. 2021 §A1.1 thresholds)
- ``dup_token_frac`` / ``top_gram_frac`` (repetition filters)
- ``word_ngrams`` short-doc guard (sequence(1,0) is DESCENDING in Spark —
  the ungated form indexed element_at(t, 0) and threw under ANSI mode)
- ``top_k_per_group`` tree top-k vs a naive single-window reference
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from fairtracks_validator_spark.functions.text import (
    dup_token_frac,
    gopher_metrics,
    gopher_pass,
    shingles,
    top_gram_frac,
    word_ngrams,
)
from fairtracks_validator_spark.operators.stats import top_k_per_group


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat the cat sat again"),
            (2, "a a a a a"),
            (3, ""),
            (4, None),
            (5, "one"),
            (6, "#### #### ..."),
        ],
        "id long, text string",
    )


def _one(df, col):
    return {r["id"]: r["v"] for r in df.select("id", col.alias("v")).collect()}


class TestGopher:
    def test_metrics_values(self, docs):
        m = _one(docs, gopher_metrics("text"))
        r1 = m[1]
        assert r1["n_words"] == 10
        assert r1["mean_word_len"] == pytest.approx(31 / 10)
        assert r1["symbol_ratio"] == 0.0
        assert r1["frac_alpha_words"] == 1.0
        assert r1["stop_hits"] == 4  # the, on, the, the

    def test_empty_and_null(self, docs):
        m = _one(docs, gopher_metrics("text"))
        for i in (3, 4):
            assert m[i]["n_words"] == 0
            assert m[i]["mean_word_len"] == 0.0
            assert m[i]["frac_alpha_words"] == 0.0

    def test_symbol_ratio(self, docs):
        m = _one(docs, gopher_metrics("text"))
        # "#### #### ...": 8 hash symbols + 1 ellipsis over 3 words
        assert m[6]["symbol_ratio"] == pytest.approx(3.0)
        assert m[6]["frac_alpha_words"] == 0.0

    def test_pass_thresholds(self, docs):
        p = _one(docs, gopher_pass(gopher_metrics("text"), min_words=3))
        assert p[1] is True  # enough words, alpha, stopwords
        assert p[2] is False  # mean word length 1.0 < 3
        assert p[3] is False and p[4] is False and p[6] is False


class TestRepetition:
    def test_dup_token_frac(self, docs):
        d = _one(docs, dup_token_frac("text"))
        assert d[1] == pytest.approx(1 - 6 / 10)
        assert d[2] == pytest.approx(1 - 1 / 5)
        assert d[3] == 0.0 and d[4] == 0.0 and d[5] == 0.0

    def test_top_bigram_tie_breaks_lexicographic(self, docs):
        t = _one(docs, top_gram_frac("text", 2))
        # doc 1: "cat sat" and "the cat" both appear twice; smallest wins
        assert t[1]["top_gram"] == "cat sat"
        assert t[1]["top_count"] == 2
        assert t[1]["n_grams"] == 9
        assert t[1]["frac"] == pytest.approx(round(2 / 9, 6))

    def test_degenerate_docs(self, docs):
        t = _one(docs, top_gram_frac("text", 2))
        for i in (3, 4, 5):  # no bigrams at all
            assert t[i]["top_gram"] is None
            assert t[i]["top_count"] == 0
            assert t[i]["frac"] == 0.0
        assert t[2]["top_gram"] == "a a" and t[2]["top_count"] == 4


class TestNgramGuard:
    def test_short_docs_yield_empty_not_error(self, docs):
        out = _one(docs, word_ngrams("text", 3, distinct=False))
        assert out[5] == [] and out[3] == [] and out[4] == []
        assert len(out[2]) == 3  # 5 tokens -> 3 trigrams

    def test_shingles_still_distinct(self, docs):
        out = _one(docs, shingles("text", 2))
        assert sorted(out[2]) == ["a a"]


class TestTopKPerGroup:
    def test_matches_naive_window(self, spark):
        from pyspark.sql.window import Window

        rows = [
            ("en", w)
            for w in (["x"] * 5 + ["y"] * 5 + ["z"] * 3 + ["w"] * 1)
        ] + [("de", w) for w in (["der"] * 4 + ["und"] * 2)]
        df = spark.createDataFrame(rows, "lang string, token string").repartition(7)

        got = top_k_per_group(df, "lang", "token", 2)
        naive = (
            df.groupBy("lang", "token")
            .count()
            .withColumn(
                "rank",
                F.row_number().over(
                    Window.partitionBy("lang").orderBy(
                        F.desc("count"), F.asc("token")
                    )
                ),
            )
            .where(F.col("rank") <= 2)
        )
        assert {tuple(r) for r in got.collect()} == {
            tuple(r) for r in naive.select("lang", "token", "count", "rank").collect()
        }
        # deterministic tie: x before y at count 5
        en = {r["rank"]: r["token"] for r in got.where(F.col("lang") == "en").collect()}
        assert en == {1: "x", 2: "y"}

    def test_partition_invariance(self, spark):
        rows = [("g", f"t{i % 17}") for i in range(500)]
        df1 = spark.createDataFrame(rows, "lang string, token string").repartition(2)
        df13 = spark.createDataFrame(rows, "lang string, token string").repartition(13)
        r1 = [tuple(r) for r in top_k_per_group(df1, "lang", "token", 3).collect()]
        r13 = [tuple(r) for r in top_k_per_group(df13, "lang", "token", 3).collect()]
        assert sorted(r1) == sorted(r13) and len(r1) == 3


def test_repetition_invariants_random_corpus(spark):
    """Invariants over a seeded random corpus: frac·n_grams == top_count
    (mod rounding), 0 ≤ dup_frac < 1, top_count ≤ n_grams."""
    import random

    rng = random.Random(0)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 40))))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = df.select(
        "id",
        dup_token_frac("text").alias("d"),
        top_gram_frac("text", 2).alias("t"),
    ).collect()
    for r in out:
        t = r["t"]
        assert 0.0 <= r["d"] < 1.0
        assert t["top_count"] <= t["n_grams"]
        if t["n_grams"] > 0:
            assert t["frac"] == pytest.approx(t["top_count"] / t["n_grams"], abs=1e-6)
            assert t["top_gram"] is not None
        else:
            assert t["top_count"] == 0 and t["frac"] == 0.0


def test_gopher_repetition_hand_cases(spark):
    from fairtracks_validator_spark.functions.text import gopher_repetition
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [
            (1, "a b c\na b c\nx y"),        # 1 dup line of 3, 5 of 15 chars
            (2, "p one\n\np one\n\np two"),  # 1 dup para of 3
            (3, "clean text"),
            (4, ""),
            (5, None),
            (6, "x\n \nx"),                  # whitespace-only line excluded
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", gopher_repetition("text").alias("m")
        ).select("doc_id", "m.*").collect()
    }
    assert out[1]["dup_line_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert out[1]["dup_line_char_frac"] == pytest.approx(5 / 15, abs=1e-6)
    assert out[1]["dup_para_frac"] == 0.0
    assert out[2]["n_paras"] == 3
    assert out[2]["dup_para_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert out[2]["dup_para_char_frac"] == pytest.approx(5 / 19, abs=1e-6)
    for empty in (3, 4, 5):
        assert out[empty]["dup_line_frac"] == 0.0
        assert out[empty]["dup_para_frac"] == 0.0
    assert out[6]["n_lines"] == 2           # blank middle line excluded
    assert out[6]["dup_line_frac"] == 0.5
    assert out[6]["dup_line_char_frac"] == pytest.approx(1 / 5, abs=1e-6)


def test_gopher_repetition_beyond_first_counting(spark):
    # k occurrences of one line -> k-1 duplicates (not k, not 1)
    from fairtracks_validator_spark.functions.text import gopher_repetition

    df = spark.createDataFrame(
        [(1, "dup\ndup\ndup\ndup\nuniq")], "doc_id long, text string"
    )
    r = df.select(gopher_repetition("text").alias("m")).select("m.*").collect()[0]
    assert r["n_lines"] == 5
    assert r["dup_line_frac"] == pytest.approx(3 / 5, abs=1e-6)


def test_c4_metrics_hand_cases(spark):
    from fairtracks_validator_spark.functions.text import c4_metrics, c4_pass

    page = "\n".join([
        "This is a perfectly good first sentence with words.",  # kept
        "short one.",                                 # <5 words -> dropped
        "no terminal punctuation in this line here",  # no punct -> dropped
        "This javascript line would otherwise be kept fine.",  # js -> drop
        "Another good sentence follows right here today!",     # kept
        'He said "quoted lines count as terminal too."',       # kept (")
    ])
    df = spark.createDataFrame(
        [(1, page), (2, "Only { brace. Page with three. Sentences here."),
         (3, "Has Lorem IPSUM inside. More words here today. And a third one."),
         (4, "One good sentence with enough words here."),  # <3 sentences
         (5, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in df.select(
        "doc_id", c4_metrics("text").alias("m"),
        c4_pass(c4_metrics("text")).alias("keep"),
    ).select("doc_id", "m.*", "keep").collect()}
    r = out[1]
    assert r["n_lines_kept"] == 3 and r["n_lines_dropped"] == 3
    assert r["n_sentences"] == 3        # '.', '!', '."' -> . ! . = 3
    assert r["keep"] is True
    assert out[2]["has_brace"] and out[2]["keep"] is False
    assert out[3]["has_lorem"] and out[3]["keep"] is False
    assert out[4]["n_sentences"] == 1 and out[4]["keep"] is False
    assert out[5]["n_lines_kept"] == 0 and out[5]["keep"] is False


def test_c4_clean_text_byte_stable(spark):
    from fairtracks_validator_spark.functions.text import c4_metrics

    page = "Keep this sentence with plenty of words.\nno punct line\n" \
           "And keep this second sentence with words too."
    df = spark.createDataFrame([(1, page)], "doc_id long, text string")
    got = df.select(c4_metrics("text")["clean_text"].alias("c")).first()["c"]
    assert got == ("Keep this sentence with plenty of words.\n"
                   "And keep this second sentence with words too.")


def test_pipeline_c4_stage(spark):
    from fairtracks_validator_spark.operators.pipeline import (
        prepare_training_corpus,
    )

    good = ("The quick brown fox jumps over the lazy dog today. "
            "It was a sunny day in the old town with friends. "
            "Everyone shared a warm meal at the long table.")
    rows = [
        (f"u{i}", good + f" Tail number {i} ends the page right here.")
        for i in range(4)
    ]
    rows.append(("ubrace", good + " A line with a { brace marker."))
    rows.append(("ujs", good + "\nthis javascript line has many words here."))
    df = spark.createDataFrame(rows, "url string, text string")
    out = prepare_training_corpus(
        df, "url", "text", min_words=10, sample_rate=1.0, val_frac=0.25,
        min_stop_hits=1, c4_min_sentences=3,
    )
    got = {r["url"]: r["text"] for r in out.collect()}
    assert "ubrace" not in got            # page gate dropped it
    assert "ujs" in got                   # page survives, js line removed
    assert "javascript" not in got["ujs"]
    assert len(got) == 5


def test_cli_prepare_c4_flag(spark, tmp_path):
    import json
    import subprocess
    import sys

    good = ("The quick brown fox jumps over the lazy dog today. "
            "It was a sunny day in the old town with friends. "
            "Everyone shared a warm meal at the long table.")
    rows = [(f"u{i}", good) for i in range(3)]
    rows.append(("ubrace", good + " A trailing { brace."))
    spark.createDataFrame(rows, "url string, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "in"))
    r = subprocess.run(
        [sys.executable, "-m", "fairtracks_validator_spark.cli", "prepare",
         "--input", str(tmp_path / "in"), "--out", str(tmp_path / "out"),
         "--id-col", "url", "--min-words", "10", "--min-stop-hits", "1",
         "--c4-min-sentences", "3"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    # exact dedup collapses the 3 identical-text survivors to 1; the brace
    # page was C4-gated before any of that
    assert payload["rows"] == 1
