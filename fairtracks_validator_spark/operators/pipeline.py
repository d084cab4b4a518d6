"""End-to-end training-corpus preparation — the composed pipeline.

One declarative chain over a web corpus: Gopher quality gate → exact
content dedup (keep the smallest id per normalized hash) → deterministic
hash downsample → entity-stable train/val split. Everything is a pure
DataFrame transformation:

- the quality gate is a zero-shuffle Column predicate;
- dedup is ONE hash shuffle keyed by the 32-hex content digest (same shape
  as the uniqueness check — balanced by construction);
- sampling and splitting are map-only.

So the whole pipeline costs a single shuffle over the surviving rows — at
10^12 docs the gate runs map-side during the scan, and only quality
survivors reach the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import gopher_metrics, gopher_pass
from .sampling import hash_sample, train_val_split


def prepare_training_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 25,
    sample_rate: float = 0.5,
    val_frac: float = 0.2,
    seed: str = "pipe",
    min_stop_hits: int = 2,
    line_dedup_min_count: int | None = None,
    line_sep: str = "\n",
    url_col: str | None = None,
    url_blocklist: "list[str] | DataFrame | None" = None,
    c4_min_sentences: int | None = None,
) -> DataFrame:
    """Filter → dedup → sample → split; returns surviving rows with a
    ``split`` column. Deterministic end-to-end: re-runs, resumes, and
    different partitionings produce byte-identical output.

    ``min_stop_hits``: the Gopher stopword-presence rule. Set 0 for
    corpora whose language profile isn't covered by the stopword tables
    (e.g. the synthetic pages vocabulary) — otherwise the gate rejects
    every document and the pipeline runs on nothing.

    ``line_dedup_min_count``: when set, corpus-wide duplicated-line
    removal (:func:`..operators.lines.dedup_lines_text`, first-writer
    keep) rewrites ``text_col`` BEFORE the quality gate — boilerplate
    stripped this way both changes the gate metrics and shrinks what the
    doc-level dedup hashes. Costs the line-grain digest aggregation plus
    an id-keyed rejoin of the rebuilt text, on top of the pipeline's one
    shuffle — leave ``None`` to keep the single-shuffle plan.

    ``url_col`` + ``url_blocklist``: the C4/RefinedWeb pre-filter —
    blocked hosts/registered-domains drop FIRST, before any content work
    (:func:`..operators.urlfilter.url_blocklist_filter`). Folded-list or
    broadcast-join either way: map-only, the single-shuffle plan holds.

    ``c4_min_sentences``: when set, the C4 line filters rewrite
    ``text_col`` to the cleaned text and pages failing
    :func:`..functions.text.c4_pass` drop — BEFORE the Gopher gate, so
    both gates and the dedup hash see the cleaned bytes. Pure Columns:
    map-only, the single-shuffle plan still holds."""
    if (url_col is None) != (url_blocklist is None):
        raise ValueError("url_col and url_blocklist must be set together")
    if url_blocklist is not None:
        from .urlfilter import url_blocklist_filter

        df = (
            url_blocklist_filter(df, url_col, url_blocklist)
            .where(F.col("keep"))
            .drop("blocked_by", "keep")
        )
    if c4_min_sentences is not None:
        from ..functions.text import c4_metrics, c4_pass

        df = (
            df.withColumn("_c4", c4_metrics(F.col(text_col)))
            .where(c4_pass(F.col("_c4"), min_sentences=c4_min_sentences))
            .withColumn(text_col, F.col("_c4.clean_text"))
            .drop("_c4")
        )
    if line_dedup_min_count is not None:
        from .lines import dedup_lines_text

        rebuilt = dedup_lines_text(
            df, id_col, text_col,
            sep=line_sep, min_count=line_dedup_min_count, keep="first",
        ).select(id_col, F.col("text").alias("_ld_text"))
        df = (
            df.drop(text_col)
            .join(rebuilt, id_col)
            .withColumnRenamed("_ld_text", text_col)
        )
    passed = df.where(
        gopher_pass(
            gopher_metrics(F.col(text_col)),
            min_words=min_words,
            min_stop_hits=min_stop_hits,
        )
    )
    h = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    w = Window.partitionBy("_h").orderBy(F.col(id_col).asc())
    kept = (
        passed.withColumn("_h", h)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_h", "_rn")
    )
    sampled = hash_sample(kept, id_col, sample_rate, seed=seed)
    return train_val_split(sampled, id_col, val_frac, seed=seed + "-split")


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    seq_len: int,
    buckets: int = 256,
    seed: str = "pack",
) -> DataFrame:
    """Concat-then-split sequence packing: assign every document a
    (bucket, seq_id, seq_offset) slot in a virtual stream of fixed
    ``seq_len``-token training sequences.

    Documents are hash-bucketed (deterministic, entity-stable), ordered by
    id inside each bucket, virtually concatenated, and cut every
    ``seq_len`` tokens; ``seq_id``/``seq_offset`` locate the doc's FIRST
    token (a doc may straddle a cut — the consumer continues into seq_id+1,
    standard concat-then-split semantics). One window cumsum per bucket:
    with 10^12 docs and ≥256 buckets no single task sees more than a
    1/buckets slice, and packing is reproducible under any partitioning —
    the slot is a pure function of (corpus, seed).
    """
    from .sampling import hash_bucket

    b = F.pmod(hash_bucket(F.col(id_col), seed), F.lit(buckets))
    w = (
        Window.partitionBy("_b")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(n_tokens_col).over(w), F.lit(0)).cast("long")
    return (
        df.withColumn("_b", b)
        .withColumn("_start", start)
        .select(
            F.col(id_col),
            F.col("_b").cast("int").alias("bucket"),
            # integer DIV, not float floor: double division loses
            # exactness once cumulative tokens near 2^53 (code-review r4)
            F.expr(f"_start DIV {int(seq_len)}").alias("seq_id"),
            F.pmod(F.col("_start"), F.lit(seq_len)).cast("int").alias("seq_offset"),
            F.col(n_tokens_col).alias("n_tokens"),
        )
    )


def pack_sequences_bfd(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    seq_len: int,
    buckets: int = 256,
    seed: str = "pack",
) -> DataFrame:
    """Best-fit-decreasing sequence packing: assign each document WHOLE to
    a bin of capacity ``seq_len`` tokens — no document straddles a bin
    boundary, the packing objective the no-splitting recipes use (padding
    is wasted compute; splitting breaks attention context — this is the
    classic BFD bin-packing heuristic, ≤ 11/9·OPT + 1 bins).

    (id, bucket, bin_id, n_tokens, overflow) — ``overflow`` marks docs
    longer than ``seq_len`` (each gets a lone bin; truncate or segment
    upstream). Deterministic: docs are hash-bucketed (entity-stable, same
    ``seed`` contract as :func:`pack_sequences`), and within a bucket BFD
    runs over (n_tokens DESC, id ASC) with best-fit ties to the
    lowest-numbered bin — a pure function of (corpus, seed), invariant
    under repartitioning.

    Scale shape: ONE shuffle (the bucket groupBy); each bucket packs
    independently inside ``applyInPandas`` with a sorted-remaining-capacity
    list (O(n log n) per bucket via bisect). Sequential greedy state never
    leaves a bucket, so 10^12 docs / ≥256 buckets bounds any task's state
    to its bucket slice. BFD is inherently order-sequential — there is no
    SQL twin, so this operator carries invariant tests + an independent
    pure-Python reference instead of a DuckDB oracle (the same class as
    the stateful streaming ops).
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be > 0, got {seq_len}")
    import pandas as pd

    from .sampling import hash_bucket

    b = F.pmod(hash_bucket(F.col(id_col), seed), F.lit(buckets))
    keyed = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(n_tokens_col).cast("long").alias("n_tokens"),
        b.cast("int").alias("bucket"),
    )

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        from bisect import insort_left

        g = pdf.sort_values(
            ["n_tokens", "id"], ascending=[False, True], kind="mergesort"
        )
        # open bins as a sorted list of (remaining, bin_id); best fit =
        # smallest remaining >= need, ties to lowest bin_id (insort order)
        open_bins: list[tuple[int, int]] = []
        out_bin, out_over = [], []
        next_bin = 0
        from bisect import bisect_left

        for n_tok in g["n_tokens"].tolist():
            n = int(n_tok)
            if n > seq_len:
                out_bin.append(next_bin)
                out_over.append(True)
                next_bin += 1  # lone bin, never reopened
                continue
            i = bisect_left(open_bins, (n, -1))
            if i < len(open_bins):
                rem, bid = open_bins.pop(i)
                left = rem - n
            else:
                bid = next_bin
                next_bin += 1
                left = seq_len - n
            if left > 0:
                insort_left(open_bins, (left, bid))
            out_bin.append(bid)
            out_over.append(False)
        g = g.assign(bin_id=out_bin, overflow=out_over)
        return g[["id", "bucket", "bin_id", "n_tokens", "overflow"]]

    return keyed.groupBy("bucket").applyInPandas(
        pack,
        "id long, bucket int, bin_id long, n_tokens long, overflow boolean",
    )
