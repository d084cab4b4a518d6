"""Candidate-broadcast uniqueness resolution (runner._dup_candidate_firsts)
must be observationally identical to the window-shuffle path.

The broadcast path is the near-unique web-corpus fast path: two narrow probe
jobs + a map-only main pass instead of sorting the corpus-wide verdict
stream. These tests pin equivalence on the adversarial corners: a
schema-FAILED row holding the earliest ord of a duplicated key (must NOT be
recorded as first — ``ValidatedJSONSchema.java:360-392``), keys whose every
holder fails, lone-ok-holder keys, null source/ord identities, and the
size-gate fallback.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fairtracks_validator_spark.plans.schema_compile import compile_schema
from fairtracks_validator_spark.runner import validate_corpus

SCHEMA = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "$id": "bc/1.0",
    "type": "object",
    "properties": {
        "url": {"type": "string", "minLength": 5},
        "n": {"type": "integer", "minimum": 0},
    },
    "required": ["url"],
    "primary_key": ["url"],
}

ROWS = [
    # (source, ord, url, n)
    ("a", 1, "http://x/1", 1),      # unique ok
    ("b", 2, "http://dup/a", 1),    # dup key, first OK holder
    ("c", 3, "http://dup/a", 2),    # dup violation (first=b)
    ("d", 4, "http://dup/a", -1),   # fails checks (n<0): no dup_pk, schema fail
    ("e", 5, "http://dup/b", -2),   # EARLIEST holder of dup/b FAILS checks...
    ("f", 6, "http://dup/b", 0),    # ...so f is the true first (validated)
    ("g", 7, "http://dup/b", 3),    # dup violation (first=f, NOT e)
    ("h", 8, "http://lone", -1),    # dup key where ONLY i passes → i rank 1
    ("i", 9, "http://lone", 4),
    ("j", 10, "bad", 5),            # fails minLength; unique key anyway
    ("k", 11, None, 6),             # required fails; no key
    (None, 12, "http://nullsrc", 7),   # null source identity
    ("m", None, "http://nullord", 8),  # null ord identity
    ("n", 13, "http://allfail", -3),   # every holder of allfail fails
    ("o", 14, "http://allfail", -4),
]


def _df(spark):
    return spark.createDataFrame(
        ROWS, "source string, ord long, url string, n long"
    )


def _run(spark, strategy):
    plan = compile_schema(SCHEMA)
    res = validate_corpus({"bc/1.0": (plan, _df(spark))}, dup_strategy=strategy)
    verdicts = {
        (r.source, r.ord): (r.validated, r.status)
        for r in res.verdicts.collect()
    }
    violations = {
        (r.source, r.ord, r.check_id, r.key_str, r.reason, r.description)
        for r in res.violations.collect()
    }
    pk = {
        (r.key_str, r.first_source, r.first_ord)
        for r in next(iter(res.pk_registries.values())).collect()
    }
    wide = {
        (r.source, r.ord, r.validated, r.status, len(r.violations))
        for r in res.wide.collect()
    }
    res.release()
    return verdicts, violations, pk, wide


def test_broadcast_equals_window(spark):
    assert _run(spark, "broadcast") == _run(spark, "window")


def test_failed_first_holder_not_recorded(spark):
    verdicts, violations, pk, _ = _run(spark, "broadcast")
    # e fails checks; f is the recorded first of dup/b, g the duplicate
    assert verdicts[("f", 6)] == (True, "ok")
    assert any(
        v[0] == "g" and v[4] == "dup_pk" and "f and g" in v[5]
        for v in violations
    )
    assert any(k[1] == "f" for k in pk)
    assert not any(k[1] == "e" for k in pk)
    # lone passing holder of a shared key is rank 1
    assert verdicts[("i", 9)] == (True, "ok")
    # all-failing key records nothing, raises no dup_pk
    assert not any(v[4] == "dup_pk" and v[0] in ("n", "o") for v in violations)


def test_gate_fallback_matches(spark, monkeypatch):
    import fairtracks_validator_spark.runner as runner

    monkeypatch.setattr(runner, "DUP_BROADCAST_MAX_KEYS", 0)
    gated = _run(spark, "auto")
    monkeypatch.undo()
    assert gated == _run(spark, "window")


def test_no_shuffle_in_broadcast_main_pass(spark):
    """The map-only claim, checked against the physical plan: no Exchange
    feeds the verdict output when the candidate broadcast resolves."""
    plan = compile_schema(SCHEMA)
    res = validate_corpus(
        {"bc/1.0": (plan, _df(spark))}, dup_strategy="broadcast"
    )
    physical = res.verdicts._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in physical
    # map-only means: no shuffle on the MAIN corpus stream. The bounded
    # probe jobs (duplicate-key + firsts aggregates) DO shuffle, but only
    # inside BroadcastExchange build subtrees.
    assert _shuffles_outside_broadcast(physical) == [], physical
    res.release()
    # positive control: the window strategy on the same input DOES shuffle
    # the main stream, proving the walker detects what it claims to exclude
    res_w = validate_corpus({"bc/1.0": (plan, _df(spark))}, dup_strategy="window")
    physical_w = res_w.verdicts._jdf.queryExecution().executedPlan().toString()
    assert _shuffles_outside_broadcast(physical_w), physical_w
    res_w.release()


def _shuffles_outside_broadcast(physical: str) -> list[str]:
    """Shuffle-exchange lines of a rendered physical plan whose ancestor
    chain contains no BroadcastExchange. ShuffleExchangeExec prints as
    'Exchange hashpartitioning/rangepartitioning/SinglePartition' — NOT
    'ShuffleExchange' (code-review r5: the old substring could never fire).
    Tree depth = the node connector position ('+- ' / ':- ')."""
    import re

    stack: list[tuple[int, bool]] = []  # (node-name position, is_broadcast)
    bad = []
    for ln in physical.splitlines():
        if not ln.strip():
            continue
        # depth = position of the node name: skip tree glyphs (' ', ':',
        # '|', '+', '-') — robust to AQE stage lines with NO connector
        # ('ResultQueryStage 3') and '== Final Plan ==' section markers
        ind = re.match(r"^[ :|+\-]*", ln).end()
        node = re.sub(r"^\*?\(\d+\) ", "", ln[ind:])  # codegen '*(k) '
        while stack and stack[-1][0] >= ind:
            stack.pop()
        is_shuffle = node.startswith("Exchange ") or node.startswith("AQEShuffleRead")
        if is_shuffle and not any(b for _, b in stack):
            bad.append(ln)
        stack.append((ind, node.startswith("BroadcastExchange")))
    return bad
