"""Property-based foundations (hypothesis): the cross-engine invariants that
everything else rests on.

1. Key serialization: Spark's ``to_json(array<string>)`` must equal Python's
   ``json.dumps(list, separators=(",", ":"), ensure_ascii=False)`` — this is
   what makes corpus keys, seed keys, and DuckDB oracle keys collide
   correctly (≙ ``new JSONArray(list).toString()``).
2. md5 parity: Spark md5 hex == hashlib md5 hex (the dedup-oracle basis).
3. Affine MinHash arithmetic stays in int64 (no overflow) for any 31-bit x.
"""

from __future__ import annotations

import hashlib
import json

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fairtracks_validator_spark.operators.dedup import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
)

# Strings incl. unicode, quotes, backslashes — but no control characters:
# Spark/Jackson escape them as uppercase \\u000F while Python json uses
# lowercase \\u000f (pinned below). Key equality is unaffected (both engines
# serialize consistently with THEMSELVES); only byte-level cross-language
# comparison of keys containing control chars would diverge.
_STR = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc")), min_size=0, max_size=40
)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(_STR, _STR), min_size=1, max_size=20))
def test_key_serialization_matches_python_json(spark, pairs):
    df = spark.createDataFrame(pairs, "a STRING, b STRING")
    got = [
        r["k"]
        for r in df.select(F.to_json(F.array("a", "b")).alias("k")).collect()
    ]
    expected = [
        json.dumps([a, b], separators=(",", ":"), ensure_ascii=False)
        for a, b in pairs
    ]
    assert got == expected


@settings(max_examples=20, deadline=None)
@given(st.lists(_STR.filter(lambda s: s == s.strip() and s), min_size=1, max_size=10))
def test_md5_parity_with_hashlib(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v STRING")
    got = {r["v"]: r["h"] for r in df.select("v", F.md5("v").alias("h")).collect()}
    for v in values:
        assert got[v] == hashlib.md5(v.encode("utf-8")).hexdigest()


def test_control_char_escaping_divergence_pinned(spark):
    """Pin the one known serialization divergence: control chars escape as
    uppercase hex in Spark/Jackson, lowercase in Python json. Documented
    caveat for keys containing raw control characters."""
    got = spark.range(1).select(
        F.to_json(F.array(F.lit("\x0f"))).alias("k")
    ).collect()[0]["k"]
    assert got == '["\\u000F"]'
    assert json.dumps(["\x0f"], separators=(",", ":")) == '["\\u000f"]'


@given(st.integers(min_value=0, max_value=MINHASH_P - 1))
@settings(max_examples=200, deadline=None)
def test_minhash_affine_no_overflow(x):
    for a, b in zip(MINHASH_A, MINHASH_B):
        prod = a * x + b
        assert prod < 2**63  # fits signed int64 in both Spark and DuckDB
        assert 0 <= prod % MINHASH_P < MINHASH_P
