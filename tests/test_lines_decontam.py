"""Line-level dedup + benchmark decontamination (r5 corpus operators)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fairtracks_validator_spark.operators.decontam import (
    benchmark_ngrams,
    contamination_report,
    remove_contaminated,
)
from fairtracks_validator_spark.operators.lines import dedup_lines_text, line_dedup


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


# ----------------------------------------------------------------- line dedup
def _lines_df(spark):
    return spark.createDataFrame(
        [
            (1, ["nav menu", "unique one", "footer"]),
            (2, ["nav menu", "unique two", "footer"]),
            (3, ["unique three"]),
            (4, []),
        ],
        "doc_id long, lines array<string>",
    )


def test_line_dedup_keep_first(spark):
    out = _by_id(line_dedup(_lines_df(spark), "doc_id", "lines", keep="first"))
    assert out[1]["lines_kept"] == ["nav menu", "unique one", "footer"]
    assert out[2]["lines_kept"] == ["unique two"]
    assert (out[2]["n_lines"], out[2]["n_kept"], out[2]["n_dropped"]) == (3, 1, 2)
    assert out[3]["lines_kept"] == ["unique three"]
    assert out[4]["lines_kept"] == [] and out[4]["n_lines"] == 0


def test_line_dedup_keep_none(spark):
    out = _by_id(line_dedup(_lines_df(spark), "doc_id", "lines", keep="none"))
    assert out[1]["lines_kept"] == ["unique one"]
    assert out[2]["lines_kept"] == ["unique two"]


def test_line_dedup_first_writer_is_position_order_within_doc(spark):
    # duplicate INSIDE one document: first occurrence (lowest pos) survives
    df = spark.createDataFrame(
        [(7, ["same", "mid", "same"])], "doc_id long, lines array<string>"
    )
    out = _by_id(line_dedup(df, "doc_id", "lines", keep="first"))
    assert out[7]["lines_kept"] == ["same", "mid"]


def test_line_dedup_blank_lines_exempt(spark):
    df = spark.createDataFrame(
        [(1, ["a", "", "  ", "x"]), (2, ["b", "", "  ", "x"])],
        "doc_id long, lines array<string>",
    )
    out = _by_id(line_dedup(df, "doc_id", "lines", keep="none"))
    # blank/whitespace lines are never counted as duplicates; "x" is
    assert out[1]["lines_kept"] == ["a", "", "  "]
    assert out[2]["lines_kept"] == ["b", "", "  "]


def test_line_dedup_normalize_key_trims(spark):
    df = spark.createDataFrame(
        [(1, ["pad  "]), (2, ["  pad"])], "doc_id long, lines array<string>"
    )
    out = _by_id(line_dedup(df, "doc_id", "lines", keep="none"))
    # trim-normalized keys collide even though raw bytes differ
    assert out[1]["lines_kept"] == [] and out[2]["lines_kept"] == []


def test_line_dedup_min_count_threshold(spark):
    df = spark.createDataFrame(
        [(1, ["dup"]), (2, ["dup"]), (3, ["dup"])],
        "doc_id long, lines array<string>",
    )
    out = _by_id(line_dedup(df, "doc_id", "lines", min_count=4, keep="none"))
    assert all(out[i]["lines_kept"] == ["dup"] for i in (1, 2, 3))


def test_line_dedup_partition_invariant(spark):
    df = _lines_df(spark)
    a = line_dedup(df, "doc_id", "lines", keep="first")
    b = line_dedup(df.repartition(7), "doc_id", "lines", keep="first")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_dedup_lines_text_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "nav\nkeep one\nfooter"), (2, "nav\nkeep two\nfooter")],
        "doc_id long, text string",
    )
    out = _by_id(dedup_lines_text(df, "doc_id", "text", keep="first"))
    assert out[1]["text"] == "nav\nkeep one\nfooter"
    assert out[2]["text"] == "keep two"
    assert out[2]["n_dropped"] == 2


def test_line_dedup_rejects_bad_keep(spark):
    import pytest

    with pytest.raises(ValueError):
        line_dedup(_lines_df(spark), "doc_id", "lines", keep="last")


# ------------------------------------------------------------- decontamination
def _bench_corpus(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # contains the full benchmark 8-gram inside a longer doc
            (1, "intro alpha beta gamma delta epsilon zeta eta theta outro"),
            # clean: same words, different order — no shared 8-gram
            (2, "theta eta zeta epsilon delta gamma beta alpha padding words"),
            # too short for any 8-gram
            (3, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    return bench, corpus


def test_contamination_report_flags_embedded_gram(spark):
    bench, corpus = _bench_corpus(spark)
    bg = benchmark_ngrams(bench, "text", n=8)
    rep = _by_id(contamination_report(corpus, bg, "doc_id", "text", n=8))
    assert set(rep) == {1}
    # doc 1 has 10 tokens -> 3 distinct 8-grams, exactly 1 overlaps
    assert rep[1]["n_grams"] == 3 and rep[1]["overlap_grams"] == 1
    assert abs(rep[1]["overlap_frac"] - 1 / 3) < 1e-6


def test_remove_contaminated_drops_only_flagged(spark):
    bench, corpus = _bench_corpus(spark)
    bg = benchmark_ngrams(bench, "text", n=8)
    kept = remove_contaminated(corpus, bg, "doc_id", "text", n=8)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]
    # threshold above the overlap keeps everything
    lax = remove_contaminated(
        corpus, bg, "doc_id", "text", n=8, max_overlap_frac=0.5
    )
    assert lax.count() == 3


def test_benchmark_ngrams_distinct_across_docs(spark):
    bench = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h")],
        "doc_id long, text string",
    )
    assert benchmark_ngrams(bench, "text", n=8).count() == 1


def test_contamination_counts_distinct_doc_grams_once(spark):
    # the same contaminated 8-gram repeated in one doc counts once
    bench = spark.createDataFrame(
        [(9, "a b c d e f g h")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(1, "a b c d e f g h a b c d e f g h")], "doc_id long, text string"
    )
    bg = benchmark_ngrams(bench, "text", n=8)
    rep = _by_id(contamination_report(corpus, bg, "doc_id", "text", n=8))
    assert rep[1]["overlap_grams"] == 1


def test_line_dedup_preserves_string_id_type(spark):
    df = spark.createDataFrame(
        [("https://a.example/x", ["nav", "one"]), ("https://b.example/y", ["nav", "two"])],
        "url string, lines array<string>",
    )
    out = line_dedup(df, "url", "lines", keep="first")
    assert dict(out.dtypes)["url"] == "string"
    rows = {r["url"]: r["lines_kept"] for r in out.collect()}
    # lexicographic first-writer: https://a... keeps the shared line
    assert rows["https://a.example/x"] == ["nav", "one"]
    assert rows["https://b.example/y"] == ["two"]


def test_pipeline_line_dedup_stage(spark):
    from fairtracks_validator_spark.operators.pipeline import prepare_training_corpus

    boiler = "cookie banner accept all terms now please thanks"
    body_a = " ".join(f"worda{i}" for i in range(30))
    body_b = " ".join(f"wordb{i}" for i in range(30))
    df = spark.createDataFrame(
        [
            (1, boiler + "\n" + body_a, "en"),
            (2, boiler + "\n" + body_b, "en"),
        ],
        "doc_id long, text string, lang string",
    )
    out = prepare_training_corpus(
        df, "doc_id", "text", min_words=25, sample_rate=1.0, val_frac=0.0,
        min_stop_hits=0, line_dedup_min_count=2,
    )
    rows = {r["doc_id"]: r.asDict() for r in out.collect()}
    # doc 1 is first writer and keeps the boilerplate; doc 2 loses it
    assert rows[1]["text"] == boiler + "\n" + body_a
    assert rows[2]["text"] == body_b
    # non-text columns survive the rejoin
    assert rows[2]["lang"] == "en"
    # default path (no line dedup) leaves text untouched
    out2 = prepare_training_corpus(
        df, "doc_id", "text", min_words=25, sample_rate=1.0, val_frac=0.0,
        min_stop_hits=0,
    )
    assert {r["text"] for r in out2.collect()} == {
        boiler + "\n" + body_a, boiler + "\n" + body_b,
    }


def test_decontam_preserves_string_id_type(spark):
    bench = spark.createDataFrame(
        [("b1", "alpha beta gamma delta epsilon zeta eta theta")],
        "url string, text string",
    )
    corpus = spark.createDataFrame(
        [("https://x/1", "pad alpha beta gamma delta epsilon zeta eta theta"),
         ("https://x/2", "unrelated words only here nothing shared at all")],
        "url string, text string",
    )
    bg = benchmark_ngrams(bench, "text", n=8)
    rep = contamination_report(corpus, bg, "url", "text", n=8)
    assert dict(rep.dtypes)["url"] == "string"
    assert [r["url"] for r in rep.collect()] == ["https://x/1"]
    kept = remove_contaminated(corpus, bg, "url", "text", n=8)
    assert [r["url"] for r in kept.collect()] == ["https://x/2"]


def test_cli_decontam_subcommand(spark, tmp_path, capsys):
    import json

    from fairtracks_validator_spark.cli import main

    src = "/root/testdata/sf0.001/documents.parquet"
    bench_path = str(tmp_path / "bench.parquet")
    docs = spark.read.parquet(src)
    docs.where(F.col("doc_id") < 20).write.mode("overwrite").parquet(bench_path)
    out = str(tmp_path / "clean")
    rep = str(tmp_path / "contam_report")
    rc = main(["decontam", "--input", src, "--bench", bench_path,
               "--out", out, "--report", rep,
               "--id-col", "doc_id", "--text-col", "text"])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # the 20 bench docs ARE in the corpus -> flagged at containment 1.0
    assert payload["dropped"] >= 20
    kept = spark.read.parquet(out)
    assert kept.where(F.col("doc_id") < 20).count() == 0
    assert kept.count() == 500 - payload["dropped"]
    report = spark.read.parquet(rep)
    assert {"doc_id", "n_grams", "overlap_grams", "overlap_frac"} <= set(report.columns)


def test_trim_contaminated_spans(spark):
    from fairtracks_validator_spark.operators.decontam import trim_contaminated

    bench = spark.createDataFrame(
        [(100, "a b c d e f g h")], "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # bench 8-gram embedded mid-doc: exactly those 8 tokens cut
            (1, "pre1 pre2 a b c d e f g h post1 post2"),
            # clean doc: byte-identical passthrough
            (2, "totally different words with no overlap at all here"),
            # shorter than n: no grams, passthrough
            (3, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    bg = benchmark_ngrams(bench, "text", n=8)
    out = _by_id(trim_contaminated(corpus, bg, "doc_id", "text", n=8))
    assert out[1]["text"] == "pre1 pre2 post1 post2"
    assert (out[1]["n_tokens"], out[1]["n_tokens_removed"]) == (12, 8)
    assert out[2]["text"] == "totally different words with no overlap at all here"
    assert out[2]["n_tokens_removed"] == 0
    assert out[3]["text"] == "tiny doc" and out[3]["n_tokens_removed"] == 0


def test_trim_contaminated_overlapping_windows(spark):
    from fairtracks_validator_spark.operators.decontam import trim_contaminated

    # two overlapping bench grams cover 9 tokens; union of spans removed
    bench = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "b c d e f g h i")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(7, "x a b c d e f g h i y")], "doc_id long, text string",
    )
    bg = benchmark_ngrams(bench, "text", n=8)
    out = _by_id(trim_contaminated(corpus, bg, "doc_id", "text", n=8))
    assert out[7]["text"] == "x y"
    assert out[7]["n_tokens_removed"] == 9
