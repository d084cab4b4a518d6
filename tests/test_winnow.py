"""Winnowing fingerprints + shared-passage pairs (Schleimer et al. 2003)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from fairtracks_validator_spark.operators.winnow import (
    shared_passage_pairs,
    winnow_fingerprints,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ref_winnow(text: str, k: int, w: int):
    """Independent pure-Python robust winnowing (the paper's algorithm,
    written directly from Figure 5's definition, not via Spark)."""
    toks = text.split()
    grams = [
        " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
    ]
    h = [hashlib.md5(g.encode()).hexdigest() for g in grams]
    if not h:
        return set()
    n_win = max(len(h) - w + 1, 1)
    out = set()
    for i in range(n_win):
        window = h[i : min(i + w, len(h))]
        # min hash, rightmost on ties
        best_j, best = 0, window[0]
        for j, x in enumerate(window):
            if x < best or x == best:
                best_j, best = j, x
        out.add((best, i + best_j + 1))  # 1-based gram position
    return out


def test_matches_reference_implementation(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again today",
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven twelve",
    ]
    df = _docs(spark, list(enumerate(texts)))
    got = winnow_fingerprints(df, "doc_id", "text", k=3, w=4).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], set()).add((r["fp"], r["pos"]))
    for i, t in enumerate(texts):
        assert by_doc[i] == _ref_winnow(t, 3, 4), f"doc {i}"


def test_rightmost_tie_break_on_repeated_grams(spark):
    # 10 identical tokens -> all gram hashes equal; robust winnowing must
    # select the RIGHTMOST gram of each window: positions w..m exactly
    k, w = 3, 4
    df = _docs(spark, [(1, " ".join(["rep"] * 10))])  # m = 8 grams
    got = winnow_fingerprints(df, "doc_id", "text", k=k, w=w).collect()
    assert sorted(r["pos"] for r in got) == list(range(w, 9))
    assert len({r["fp"] for r in got}) == 1


def test_short_docs(spark):
    df = _docs(
        spark,
        [
            (1, "a b c d e f"),  # 2 grams < w: one global-min fingerprint
            (2, "a b c"),  # < k tokens: no grams, no fingerprints
            (3, None),  # null text
        ],
    )
    got = winnow_fingerprints(df, "doc_id", "text", k=5, w=4)
    per = {r["doc_id"]: r["n"] for r in got.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert per.get(1) == 1
    assert 2 not in per and 3 not in per


def test_density_bound(spark):
    # winnowing guarantees expected density ~ 2/(w+1); assert the hard
    # upper bound (#windows) and that distinct-collapse actually bites
    import random

    rng = random.Random(7)
    words = [f"w{rng.randrange(500)}" for _ in range(400)]
    df = _docs(spark, [(1, " ".join(words))])
    k, w = 5, 8
    n = winnow_fingerprints(df, "doc_id", "text", k=k, w=w).count()
    m = 400 - k + 1
    assert n <= m - w + 1
    assert n < 0.5 * m  # far fewer than one per window for random text


def test_shared_passage_detected(spark):
    passage = "common shared passage tokens that are long enough to fire"
    df = _docs(
        spark,
        [
            (1, "doc one unique prefix " + passage + " doc one suffix here"),
            (2, "totally different start " + passage + " other ending words"),
            (3, "nothing in common with anybody else at all whatsoever"),
        ],
    )
    pairs = shared_passage_pairs(
        df, "doc_id", "text", k=3, w=4, min_shared=1
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got
    assert all(3 not in p for p in got)


def test_boilerplate_fp_guard(spark):
    # the same passage in MANY docs -> its fingerprints exceed
    # max_docs_per_fp and are dropped; no quadratic pair blowup
    boiler = "standard footer text repeated on every single page verbatim"
    rows = [(i, f"unique{i} words here then " + boiler) for i in range(20)]
    pairs = shared_passage_pairs(
        _docs(spark, rows), "doc_id", "text",
        k=3, w=4, min_shared=1, max_docs_per_fp=5,
    )
    assert pairs.count() == 0


def test_no_python_udf_in_plan(spark):
    df = _docs(spark, [(1, "a b c d e f g h i j")])
    plan = winnow_fingerprints(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_string_ids_and_cli_subcommand(spark, tmp_path, capsys):
    import json

    from fairtracks_validator_spark.cli import main

    passage = "quarterly report section three revenue grew nine percent overall"
    df = spark.createDataFrame(
        [
            ("https://a/1", "intro words before " + passage + " closing line"),
            ("https://b/2", "other opening text " + passage + " distinct tail"),
            ("https://c/3", "completely unrelated content on another topic entirely"),
        ],
        "url string, text string",
    )
    src = str(tmp_path / "pages.parquet")
    df.write.mode("overwrite").parquet(src)
    out = str(tmp_path / "pairs")
    rc = main(["passages", "--input", src, "--out", out,
               "--id-col", "url", "--text-col", "text",
               "--k", "3", "--window", "4", "--min-shared", "1"])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    pairs = spark.read.parquet(out).collect()
    assert payload["pairs"] == len(pairs) == 1
    assert (pairs[0]["id_a"], pairs[0]["id_b"]) == ("https://a/1", "https://b/2")
