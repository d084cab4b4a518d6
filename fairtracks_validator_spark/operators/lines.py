"""Corpus-wide duplicated-line removal (CCNet-style line dedup).

Web text repeats whole lines across pages — navigation chrome, cookie
banners, boilerplate footers. The public CCNet / RefinedWeb recipe drops
every line whose (normalized) content appears ``min_count``-or-more times
across the corpus, keeping either no copy or exactly the first-writer copy,
then reassembles each document from its surviving lines in order.

Spark shape, line-grain but shuffle-lean:

- documents explode to ``(doc_id, pos, line)`` map-side; the corpus-wide
  count aggregates on ``md5(trim(line))`` — the only grain that ever
  shuffles for counting is ``(16-byte digest)`` with map-side combine, not
  the line text;
- only digests with ``count >= min_count`` survive the filter, so the join
  that marks doomed lines carries the (normally small) duplicated-line
  relation — AQE turns it into a broadcast join when it fits (observed at
  bench scale: the corpus side is never exchanged by ``h`` at all, it only
  re-runs the map-side explode+md5, which is cheap next to a line-grain
  shuffle); when the dup relation is genuinely huge the join falls back to
  a digest-keyed shuffle of ``(h, doc_id, pos, line)`` — still never the
  full corpus twice;
- reassembly is one ``groupBy(doc_id)`` with an ``array_sort`` on
  ``(pos, line)`` structs — deterministic output independent of
  partitioning, and first-writer selection uses the corpus' total order
  ``min(struct(doc_id, pos))`` so re-runs and resumes pick the same keeper.

Normalization is ``trim`` (the oracle-parity default); lines that are
empty after normalization are never counted or dropped — blank separators
are structure, not boilerplate.

Byte-exact DuckDB oracle: ``__spark_entry__.q_line_dedup_documents``.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def line_dedup(
    df: DataFrame,
    id_col: str,
    lines_col: str,
    min_count: int = 2,
    keep: str = "first",
    normalize: Optional[Callable[[Column], Column]] = None,
) -> DataFrame:
    """Drop corpus-wide duplicated lines from an ``array<string>`` column.

    Returns one row per input document:
    ``(<id_col>, lines_kept array<string>, n_lines, n_kept, n_dropped)`` —
    the id keeps its input name and type (string url keys work; the
    first-writer order is then lexicographic, still a deterministic total
    order). ``keep='first'`` retains the single earliest copy (by
    ``(id, pos)`` order); ``keep='none'`` drops every copy. ``normalize``
    maps a line Column to its dedup key form (default ``trim``);
    normalized-empty lines are exempt from dedup."""
    if keep not in ("first", "none"):
        raise ValueError(f"keep must be 'first' or 'none', got {keep!r}")
    norm = normalize or F.trim
    ex = df.select(
        F.col(id_col).alias("_ld_id"),
        F.posexplode_outer(F.col(lines_col)).alias("pos", "line"),
    ).withColumn(
        "h",
        F.when(norm(F.col("line")) != "", F.md5(norm(F.col("line")))),
    )
    dups = (
        ex.where(F.col("h").isNotNull())
        .groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.min(F.struct(F.col("_ld_id").alias("i"), "pos")).alias("_fw"),
        )
        .where(F.col("_n") >= min_count)
        .select("h", "_fw")
    )
    j = ex.join(dups, "h", "left")
    survives = F.col("_fw").isNull()
    if keep == "first":
        survives = survives | (
            F.struct(F.col("_ld_id").alias("i"), "pos") == F.col("_fw")
        )
    item = F.when(
        F.col("line").isNotNull(),
        F.struct(
            F.col("pos").alias("pos"),
            F.col("line").alias("line"),
            survives.alias("keep"),
        ),
    )
    return (
        j.groupBy("_ld_id")
        .agg(F.array_sort(F.collect_list(item)).alias("_items"))
        .select(
            F.col("_ld_id").alias(id_col),
            F.transform(
                F.filter("_items", lambda s: s["keep"]), lambda s: s["line"]
            ).alias("lines_kept"),
            F.size("_items").alias("n_lines"),
        )
        .select(
            id_col,
            "lines_kept",
            "n_lines",
            F.size("lines_kept").alias("n_kept"),
            (F.col("n_lines") - F.size("lines_kept")).alias("n_dropped"),
        )
    )


def dedup_lines_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
    min_count: int = 2,
    keep: str = "first",
) -> DataFrame:
    """Text-level convenience: split ``text_col`` on ``sep``, run
    :func:`line_dedup`, and reassemble the surviving lines.

    Returns ``(<id_col>, text, n_lines, n_kept, n_dropped)`` — ``text`` is
    the deduplicated document (empty string when every line was dropped)."""
    lines = df.select(
        F.col(id_col),
        F.split(F.coalesce(F.col(text_col), F.lit("")), sep).alias("_lines"),
    )
    out = line_dedup(lines, id_col, "_lines", min_count=min_count, keep=keep)
    return out.select(
        id_col,
        F.concat_ws(sep, "lines_kept").alias("text"),
        "n_lines",
        "n_kept",
        "n_dropped",
    )
