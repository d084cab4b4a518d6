"""Winnowing document fingerprints — shared-passage detection at scale.

The public algorithm (Schleimer, Wilkerson & Aiken, "Winnowing: Local
Algorithms for Document Fingerprinting", SIGMOD 2003 — the MOSS recipe):
hash every word k-gram, slide a window of ``w`` consecutive hashes, and in
each window select the minimum hash, ties broken by RIGHTMOST position (a
deterministic, position-local tie-break; the paper's "robust winnowing"
additionally prefers the previous window's pick — same guarantees, ours is
the stateless variant that vectorizes per window). The selected (hash, position) pairs are the
document's fingerprints, with guaranteed density ≤ 2/(w+1) and the
guarantee that every shared substring of at least w+k-1 tokens produces at
least one shared fingerprint. Documents sharing fingerprints share
passages — the passage-level complement to whole-doc MinHash
(``dedup.minhash_lsh_candidates``) and span-level decontamination
(``decontam.trim_contaminated``).

Spark shape — everything per-row until the tiny fingerprint relation:

- k-gram hashing and window minima are pure higher-order Column
  expressions (one let-bound tokenization, no per-row Python, no UDF);
- each doc emits ~2·tokens/(w+1) fingerprints map-side (posexplode);
- the only shuffle groups by fingerprint hash; promiscuous fingerprints
  (boilerplate that appears in more than ``max_docs_per_fp`` documents —
  MOSS drops these as "noise" too) are excluded BEFORE pair generation, so
  buckets are bounded and the pair count cannot blow up quadratically;
- pair expansion reuses the in-bucket indexed-transform combination trick
  (no self-join), then one pair-keyed aggregation counts shared
  fingerprints per pair.

md5 is used as the gram hash so the whole operator has a byte-exact DuckDB
oracle (``__spark_entry__.q_winnow_passages_documents``); the hex strings
compare lexicographically identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.expr import let_
from ..functions.text import word_ngrams
from .dedup import _bucket_pairs


def winnow_fingerprint_col(text_col, k: int = 5, w: int = 4) -> Column:
    """Array of winnowing fingerprints ``struct<fp:string, pos:int>`` for one
    text column. ``pos`` is the 1-based token index where the selected
    k-gram starts.

    Window ``i`` covers gram positions ``[i, min(i+w-1, m)]``; a document
    with fewer than ``w`` grams still yields one fingerprint (the global
    minimum), matching the paper's "every document with ≥ k tokens is
    fingerprinted" contract. Adjacent windows usually select the same gram —
    ``array_distinct`` collapses those repeats, which is exactly where the
    2/(w+1) density bound comes from."""
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1 (got k={k}, w={w})")

    def over_hashes(h):
        m = F.size(h)
        starts = F.when(
            m >= 1, F.sequence(F.lit(1), F.greatest(m - (w - 1), F.lit(1)))
        ).otherwise(F.array().cast("array<int>"))
        # per window: min over struct(hash asc, -pos asc) == smallest hash,
        # rightmost position on ties (deterministic stateless tie-break)
        selected = F.transform(
            starts,
            lambda i: F.array_min(
                F.transform(
                    F.sequence(i, F.least(i + (w - 1), m)),
                    lambda j: F.struct(
                        F.element_at(h, j.cast("int")).alias("fp"),
                        (-j).cast("int").alias("negpos"),
                    ),
                )
            ),
        )
        return F.array_distinct(
            F.transform(
                selected,
                lambda s: F.struct(
                    s["fp"].alias("fp"), (-s["negpos"]).alias("pos")
                ),
            )
        )

    grams = word_ngrams(text_col, k, distinct=False)
    return let_(F.transform(grams, lambda g: F.md5(g)), over_hashes)


def winnow_fingerprints(
    docs: DataFrame, id_col: str, text_col: str, k: int = 5, w: int = 4
) -> DataFrame:
    """Exploded fingerprint relation ``(<id_col>, fp, pos)`` — one row per
    selected (hash, position) pair, ~2/(w+1) of the gram count per doc.

    Map-side only: the winnowing selection is row-local; no shuffle happens
    until a caller aggregates by ``fp``."""
    return docs.select(
        F.col(id_col),
        F.explode(winnow_fingerprint_col(text_col, k, w)).alias("f"),
    ).select(id_col, F.col("f.fp").alias("fp"), F.col("f.pos").alias("pos"))


def shared_passage_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_docs_per_fp: int = 64,
) -> DataFrame:
    """Document pairs sharing at least ``min_shared`` winnowing fingerprints
    — candidate passage-duplicate pairs with their evidence count.

    Returns ``(id_a, id_b, shared_fps)`` with ``id_a < id_b``. Fingerprints
    present in more than ``max_docs_per_fp`` documents are treated as
    boilerplate and dropped BEFORE pair expansion (MOSS's noise threshold),
    so each bucket contributes at most ``max_docs_per_fp²/2`` pairs and the
    shuffle stays fingerprint-sized. Every shared passage of at least
    ``w + k - 1`` tokens is guaranteed to contribute ≥ 1 shared fingerprint
    (the winnowing correctness property), so ``min_shared=2`` asks for
    either one passage ≳ 2 windows long or two independent shared spans.
    ``id_a < id_b`` uses the id column's native ordering (numeric ids
    compare numerically, url ids lexicographically)."""
    fps = (
        winnow_fingerprints(docs, id_col, text_col, k, w)
        .select("fp", F.col(id_col).alias("id"))
        .distinct()
    )
    pairs = _bucket_pairs(fps, ["fp"], max_docs_per_fp)
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )
