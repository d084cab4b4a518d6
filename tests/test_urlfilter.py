"""URL blocklist pre-filter (C4 / RefinedWeb UT1 stage)."""

from __future__ import annotations

import pytest

from fairtracks_validator_spark.operators.urlfilter import (
    URL_BLOCK_FOLD_MAX,
    url_blocklist_filter,
)

URLS = [
    (1, "https://www.bad.example.com/page"),     # subdomain of blocked domain
    (2, "https://bad.example.com/x"),            # apex of blocked domain
    (3, "https://other.example.com/x"),          # same eTLD+1... see below
    (4, "https://EVIL.host.co.uk:443/x"),        # exact host entry, mixed case
    (5, "https://good.host.co.uk/x"),            # sibling subdomain survives
    (6, "https://clean.org/x"),
    (7, "not a url"),
    (8, "https://sub.clean.org/x"),              # domain-level block
    (9, "  https://bad.example.com#top "),       # fragment right after host
]
# registered_domain of *.example.com is example.com -> blocking
# 'bad.example.com' as a DOMAIN entry only blocks hosts whose eTLD+1 is
# literally 'bad.example.com' (none here); list it as a HOST block instead
# and block 'clean.org' at the domain level.
BLOCKED = ["bad.example.com", "www.bad.example.com", "evil.host.co.uk",
           "clean.org"]


def _expect(out):
    m = {r["doc_id"]: r for r in out.collect()}
    assert m[1]["blocked_by"] == "host"       # www.bad.example.com listed
    assert m[2]["blocked_by"] == "host"       # bad.example.com listed
    assert m[3]["keep"] is True               # example.com not listed
    assert m[4]["blocked_by"] == "host"       # lowercased host match
    assert m[5]["keep"] is True
    assert m[6]["blocked_by"] == "host"       # host==domain: host label wins
    assert m[7]["keep"] is True               # non-URL: host '' never listed
    assert m[8]["blocked_by"] == "domain"     # subdomain inherits the block
    # '#frag' directly after the authority (no path) + padding must not
    # leak into the host and defeat the block (code-review r5)
    assert m[9]["blocked_by"] == "host" 
    assert all((r["blocked_by"] is None) == r["keep"] for r in m.values())


def test_folded_list_path(spark):
    df = spark.createDataFrame(URLS, "doc_id long, url string")
    _expect(url_blocklist_filter(df, "url", BLOCKED))


def test_dataframe_path_matches_fold(spark):
    df = spark.createDataFrame(URLS, "doc_id long, url string")
    bdf = spark.createDataFrame([(b,) for b in BLOCKED], "domain string")
    _expect(url_blocklist_filter(df, "url", bdf))
    a = sorted(url_blocklist_filter(df, "url", BLOCKED).collect())
    b = sorted(url_blocklist_filter(df, "url", bdf).collect())
    assert a == b


def test_validations(spark):
    df = spark.createDataFrame(URLS, "doc_id long, url string")
    with pytest.raises(ValueError, match="fold cap"):
        url_blocklist_filter(df, "url", [f"d{i}.com" for i in
                                         range(URL_BLOCK_FOLD_MAX + 1)])
    bad = spark.createDataFrame([("x.com",)], "notdomain string")
    with pytest.raises(ValueError, match="'domain' column"):
        url_blocklist_filter(df, "url", bad)


def test_fold_path_stays_jvm_side(spark):
    df = spark.createDataFrame(URLS, "doc_id long, url string")
    plan = url_blocklist_filter(
        df, "url", BLOCKED
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_df_path_broadcasts(spark):
    df = spark.createDataFrame(URLS, "doc_id long, url string")
    bdf = spark.createDataFrame([(b,) for b in BLOCKED], "domain string")
    plan = url_blocklist_filter(
        df, "url", bdf
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pipeline_blocklist_stage(spark):
    from fairtracks_validator_spark.operators.pipeline import (
        prepare_training_corpus,
    )

    good = ("the quick brown fox jumps over the lazy dog on a sunny day "
            "in town with the old friends and a warm meal for everyone "
            "at the long table near the river bank")
    rows = [
        (f"https://ok{i}.org/p", good + f" tail{i}") for i in range(4)
    ] + [("https://spam.bad.net/x", good + " tailspam")]
    df = spark.createDataFrame(rows, "url string, text string")
    out = prepare_training_corpus(
        df, "url", "text", min_words=10, sample_rate=1.0, val_frac=0.25,
        min_stop_hits=1, url_col="url", url_blocklist=["bad.net"],
    )
    urls = {r["url"] for r in out.collect()}
    assert "https://spam.bad.net/x" not in urls
    assert len(urls) == 4
    with pytest.raises(ValueError, match="together"):
        prepare_training_corpus(df, "url", "text", url_col="url")


def test_cli_prepare_blocklist(spark, tmp_path):
    import json
    import subprocess
    import sys

    good = ("the quick brown fox jumps over the lazy dog on a sunny day "
            "in town with the old friends and a warm meal for everyone")
    rows = [(f"https://ok{i}.org/p", good + f" tail{i}") for i in range(3)]
    rows.append(("https://x.blocked.io/y", good + " tailblocked"))
    spark.createDataFrame(rows, "url string, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "in"))
    bl = tmp_path / "bl.txt"
    bl.write_text("blocked.io\n\n# not-a-comment-syntax but harmless\n")
    r = subprocess.run(
        [sys.executable, "-m", "fairtracks_validator_spark.cli", "prepare",
         "--input", str(tmp_path / "in"), "--out", str(tmp_path / "out"),
         "--id-col", "url", "--min-words", "10", "--min-stop-hits", "1",
         "--url-col", "url", "--blocklist", str(bl)],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["rows"] == 3
