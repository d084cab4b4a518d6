"""Benchmark decontamination — flag training documents that overlap an
evaluation/benchmark set by word n-grams.

The published recipe (GPT-3 appendix C: 13-gram overlap; PaLM / Llama use
8–10-gram variants — all public papers) is a set-intersection between each
training document's word n-grams and the union of n-grams appearing in the
held-out benchmark corpus. Documents whose overlap exceeds a threshold are
dropped (or trimmed) before training so eval scores are not inflated by
memorized test items.

Spark shape — built for a tiny-benchmark / huge-corpus asymmetry:

- the benchmark gram set is computed once (distinct n-grams over the eval
  corpus; millions of rows at most) and BROADCAST — the 100 TB training
  side never shuffles;
- each training document's grams are produced row-local with higher-order
  functions (:func:`..functions.text.word_ngrams` — one let-bound
  tokenization, no per-row Python) and exploded map-side;
- the broadcast inner join keeps ONLY matching grams, so the follow-up
  per-document aggregation shuffles just the contaminated slice of the
  corpus (normally a vanishing fraction), keyed by doc id.

Every hash-free string comparison is exact, so the whole operator has a
byte-exact DuckDB oracle (``__spark_entry__.q_decontam_documents``).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.expr import let_
from ..functions.text import word_ngrams


def benchmark_ngrams(bench: DataFrame, text_col: str, n: int = 8) -> DataFrame:
    """Distinct word n-grams of the benchmark corpus: one column ``gram``.

    This is the broadcast side — dedupe it here (one small shuffle over the
    benchmark only) so the join build side is minimal."""
    return (
        bench.select(F.explode(word_ngrams(text_col, n)).alias("gram"))
        .where(F.length("gram") > 0)
        .distinct()
    )


def contamination_report(
    docs: DataFrame,
    bench_grams: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
) -> DataFrame:
    """Per-document overlap with the benchmark gram set.

    Returns ``(<id_col>, n_grams, overlap_grams, overlap_frac)`` for every
    document sharing at least one n-gram with the benchmark — clean
    documents (the overwhelming majority at scale) produce no row and no
    shuffled bytes. The id keeps its input name and type (string url keys
    work). ``n_grams`` counts the document's DISTINCT n-grams, so
    ``overlap_frac`` is set containment of the doc's gram set in the
    benchmark's.

    ``bench_grams`` must come from :func:`benchmark_ngrams` with the same
    ``n``; it is broadcast (decontamination is only meaningful when the
    eval set is dwarfed by the training corpus)."""
    grams = docs.select(
        F.col(id_col).alias("_dc_id"),
        let_(
            word_ngrams(text_col, n),
            lambda g: F.struct(F.size(g).alias("n"), g.alias("arr")),
        ).alias("_g"),
    ).select("_dc_id", F.col("_g.n").alias("n_grams"), F.explode("_g.arr").alias("gram"))
    return (
        grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("_dc_id", "n_grams")
        .agg(F.count(F.lit(1)).alias("overlap_grams"))
        .select(
            F.col("_dc_id").alias(id_col),
            "n_grams",
            "overlap_grams",
            F.round(F.col("overlap_grams") / F.col("n_grams"), 6).alias("overlap_frac"),
        )
    )


def remove_contaminated(
    docs: DataFrame,
    bench_grams: Optional[DataFrame] = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    max_overlap_frac: float = 0.0,
    report: Optional[DataFrame] = None,
) -> DataFrame:
    """Drop documents whose benchmark containment exceeds
    ``max_overlap_frac`` (0.0 = any shared n-gram disqualifies).

    Pass either ``bench_grams`` (the report is computed here) or a
    precomputed ``report`` from :func:`contamination_report` (the CLI
    persists one to also write it out — the threshold predicate and the
    anti-join live HERE either way, so library and CLI cannot diverge).

    The flagged-id relation is the report filtered to the threshold —
    tiny by construction — so the anti-join broadcasts and the corpus
    passes through map-side."""
    if (bench_grams is None) == (report is None):
        raise ValueError("pass exactly one of bench_grams or report")
    if report is None:
        report = contamination_report(docs, bench_grams, id_col, text_col, n)
    flagged = report.where(F.col("overlap_frac") > max_overlap_frac).select(
        F.col(id_col).alias("_flagged_id")
    )
    return docs.join(
        F.broadcast(flagged),
        F.col(id_col) == F.col("_flagged_id"),
        "left_anti",
    )


def trim_contaminated(
    docs: DataFrame,
    bench_grams: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
) -> DataFrame:
    """Remove the contaminated SPANS instead of dropping whole documents.

    The softer decontamination variant from the public recipes (Llama /
    PaLM appendices trim matched windows rather than discard the page):
    every token covered by at least one benchmark-matching n-gram is cut,
    and the survivors are rejoined in order.

    Shape: tokens once (let-bound), positional n-grams exploded map-side,
    broadcast inner join keeps only matching positions, one groupBy(doc)
    collects the (tiny — contaminated-only) start-position list, and a
    final broadcast join hands each doc its starts so a pure HOF filter
    drops covered tokens. Clean documents (no matching gram) never shuffle
    and pass through with their text untouched.

    Returns ``(<id_col>, text, n_tokens, n_tokens_removed)``."""
    from ..functions.text import tokens as _tokens

    base = docs.select(
        F.col(id_col).alias("_dc_id"),
        _tokens(text_col).alias("_toks"),
    )
    # positional (start, gram) pairs; start is 1-based token index
    grams = base.select(
        "_dc_id",
        F.posexplode(
            F.when(
                F.size("_toks") >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size("_toks") - (n - 1)),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("_toks"), i, n)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pos0", "gram"),
    ).select("_dc_id", (F.col("pos0") + 1).alias("start"), "gram")
    hits = (
        grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("_dc_id")
        .agg(F.sort_array(F.collect_set("start")).alias("_starts"))
    )
    covered = lambda idx, starts: F.exists(  # noqa: E731
        starts, lambda s: (s <= idx) & (idx < s + n)
    )
    joined = base.join(F.broadcast(hits), "_dc_id", "left")
    kept = F.filter(
        F.col("_toks"),
        lambda tok, i: ~F.coalesce(
            covered(i + 1, F.col("_starts")), F.lit(False)
        ),
    )
    return joined.select(
        F.col("_dc_id").alias(id_col),
        F.concat_ws(" ", kept).alias(text_col),
        F.size("_toks").alias("n_tokens"),
        (F.size("_toks") - F.size(kept)).alias("n_tokens_removed"),
    )
