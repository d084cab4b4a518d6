"""Property-based parity: the new scoring/repetition ops vs independent
pure-Python reference implementations (the test_winnow discipline — a
second implementation nobody shares code with)."""

from __future__ import annotations

import hashlib
import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

# word-ish tokens so whitespace tokenization is unambiguous
_WORD = st.text(alphabet="abcdexyz", min_size=1, max_size=4)
_DOC = st.lists(_WORD, min_size=0, max_size=12).map(" ".join)


def _py_tokens(t):
    return [w for w in (t or "").split() if w]


def _py_bigram_logprob(docs, alpha=0.4):
    """Independent stupid-backoff reference (Brants et al. 2007 §4)."""
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    for _, t in docs:
        ws = _py_tokens(t)
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    total = float(max(sum(uni.values()), 1))
    out = {}
    for i, t in docs:
        ws = _py_tokens(t)
        if not ws:
            continue
        lps = [math.log(uni[ws[0]] / total)]
        for a, b in zip(ws, ws[1:]):
            if (a, b) in big:
                lps.append(math.log(big[(a, b)] / uni[a]))
            else:  # unreachable when scoring the training corpus itself
                lps.append(math.log(alpha) + math.log(uni[b] / total))
        out[i] = (round(sum(lps) / len(lps), 4), len(ws))
    return out


@settings(max_examples=15, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=8))
def test_bigram_matches_python_reference(spark, texts):
    from fairtracks_validator_spark.operators.scoring import bigram_logprob

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["logprob"], r["n_tokens"])
        for r in bigram_logprob(df, "doc_id", "text").collect()
    }
    want = _py_bigram_logprob(docs)
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1]
        assert got[k][0] == pytest.approx(want[k][0], abs=2e-4)


def _py_hashed_linear(docs, w, dim):
    out = {}
    for i, t in docs:
        ws = _py_tokens(t)
        feats = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        if not feats:
            continue
        s = sum(
            w[int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % dim]
            for f in feats
        )
        z = s / len(feats)
        out[i] = (round(1 / (1 + math.exp(-z)), 4), len(feats))
    return out


@settings(max_examples=15, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=8))
def test_classifier_matches_python_reference(spark, texts):
    from fairtracks_validator_spark.operators.scoring import (
        hashed_linear_score,
        make_hash_weights,
    )

    dim = 32
    w = make_hash_weights(dim, "prop")
    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["score"], r["n_features"])
        for r in hashed_linear_score(df, "doc_id", "text", w).collect()
    }
    want = _py_hashed_linear(docs, w, dim)
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1]
        assert got[k][0] == pytest.approx(want[k][0], abs=2e-4)


def _py_dup_metrics(elements, total_chars):
    seen, dups, dup_chars = set(), 0, 0
    for e in elements:
        if e in seen:
            dups += 1
            dup_chars += len(e)
        else:
            seen.add(e)
    n = len(elements)
    return (
        n,
        round(dups / max(n, 1), 6),
        round(dup_chars / max(total_chars, 1), 6),
    )


_LINE = st.lists(_WORD, min_size=0, max_size=4).map(" ".join)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.lists(_LINE, min_size=0, max_size=8), min_size=1, max_size=6))
def test_gopher_repetition_matches_python_reference(spark, docs_lines):
    from fairtracks_validator_spark.functions.text import gopher_repetition

    docs = [(i, "\n".join(ls)) for i, ls in enumerate(docs_lines)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", gopher_repetition("text").alias("m")
        ).select("doc_id", "m.*").collect()
    }
    for i, t in docs:
        lines = [x for x in t.split("\n") if x.strip()]
        paras = [x for x in t.split("\n\n") if x.strip()]
        nl, lf, lcf = _py_dup_metrics(lines, len(t))
        np_, pf, pcf = _py_dup_metrics(paras, len(t))
        r = got[i]
        assert r["n_lines"] == nl and r["n_paras"] == np_
        assert r["dup_line_frac"] == pytest.approx(lf, abs=1e-6)
        assert r["dup_line_char_frac"] == pytest.approx(lcf, abs=1e-6)
        assert r["dup_para_frac"] == pytest.approx(pf, abs=1e-6)
        assert r["dup_para_char_frac"] == pytest.approx(pcf, abs=1e-6)


def _py_bfd(items, seq_len):
    """Independent BFD reference: items = [(id, n)], returns id -> bin."""
    from bisect import bisect_left, insort_left

    order = sorted(items, key=lambda t: (-t[1], t[0]))
    bins: list[tuple[int, int]] = []
    nxt, out = 0, {}
    for i, n in order:
        if n > seq_len:
            out[i] = (nxt, True)
            nxt += 1
            continue
        k = bisect_left(bins, (n, -1))
        if k < len(bins):
            rem, bid = bins.pop(k)
            left = rem - n
        else:
            bid, left = nxt, seq_len - n
            nxt += 1
        if left > 0:
            insort_left(bins, (left, bid))
        out[i] = (bid, False)
    return out


@settings(max_examples=12, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=140), min_size=1,
                max_size=25))
def test_pack_bfd_matches_python_reference(spark, sizes):
    from fairtracks_validator_spark.operators.pipeline import (
        pack_sequences_bfd,
    )

    items = list(enumerate(sizes))
    df = spark.createDataFrame(items, "doc_id long, n long")
    out = pack_sequences_bfd(df, "doc_id", "n", seq_len=100, buckets=1)
    got = {r["id"]: (r["bin_id"], r["overflow"]) for r in out.collect()}
    assert got == _py_bfd(items, 100)
    # invariants: every non-overflow bin fits seq_len
    fills: dict[int, int] = {}
    for i, n in items:
        b, over = got[i]
        if not over:
            fills[b] = fills.get(b, 0) + n
    assert all(v <= 100 for v in fills.values())


def test_pack_bfd_bucketed_partition_invariant(spark):
    from fairtracks_validator_spark.operators.pipeline import (
        pack_sequences_bfd,
    )

    rows = [(i, 10 + (i * 37) % 90) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    a = sorted(pack_sequences_bfd(df, "doc_id", "n", 128, buckets=8).collect())
    b = sorted(
        pack_sequences_bfd(df.repartition(13), "doc_id", "n", 128,
                           buckets=8).collect()
    )
    assert a == b
    # bins never cross buckets; per-(bucket,bin) fill <= seq_len
    fills: dict[tuple[int, int], int] = {}
    for r in a:
        assert not r["overflow"]
        key = (r["bucket"], r["bin_id"])
        fills[key] = fills.get(key, 0) + r["n_tokens"]
    assert all(v <= 128 for v in fills.values())
    # BFD beats concat-then-split padding-wise here: every doc whole
    assert len(a) == 200
    import pytest as _pytest

    with _pytest.raises(ValueError, match="seq_len"):
        pack_sequences_bfd(df, "doc_id", "n", 0)
