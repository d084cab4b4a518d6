"""Distribution-drift tests: two-sample Kolmogorov-Smirnov and chi-square.

North-star additions (no reference counterpart). Two implementations of KS:

- :func:`ks_2samp_exact` — the textbook statistic, exact, computed with a
  groupBy-on-value + one global ordered window over *distinct values only*.
  Correct at any scale where the number of DISTINCT values fits a single
  window partition (fine for bounded metrics like text length); the oracle-
  comparable form.
- :func:`ks_2samp_quantile` — approximate via ``percentile_approx`` over B
  quantiles; the 10^12-row path. One sketch pass, one O(log B) per-row bucket
  assignment, one bucket aggregation: no row multiplication, no corpus-sized
  window (the only window runs over ≤B+1 bucket rows). Error is bounded by
  the quantile sketch accuracy + 1/B.

Chi-square is a pure contingency aggregation — two shuffles (cell counts +
margins), no UDF, no driver loop. Skewed group keys (Zipfian ``lang``) are
pre-salted in the cell count: two-stage partial aggregation
``groupBy(key, salt) → groupBy(key)`` per the north rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ks_2samp_exact(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    max_distinct: int | None = 2_000_000,
) -> DataFrame:
    """Exact two-sample KS statistic between groups a and b of one table.

    Returns a 1-row DataFrame: (n_a, n_b, ks_stat). ECDFs are evaluated at
    every distinct observed value; D = max |F_a(v) - F_b(v)|. The cumulative
    window runs over DISTINCT values on one reducer — correct and cheap for
    bounded-cardinality metrics (lengths, scores), but a guard rejects
    high-cardinality columns up front (one approx_count_distinct probe)
    instead of silently funnelling them through a single partition; use
    :func:`ks_2samp_quantile` for those. ``max_distinct=None`` skips the
    probe when the caller already knows the cardinality is bounded.
    """
    s = df.where(F.col(group_col).isin([group_a, group_b])).select(
        F.col(value_col).cast("double").alias("v"),
        F.when(F.col(group_col) == group_a, 1).otherwise(0).alias("in_a"),
    ).where(F.col("v").isNotNull())

    if max_distinct is not None:
        approx = s.agg(F.approx_count_distinct("v", 0.05).alias("n")).first()["n"]
        if approx > max_distinct:
            raise ValueError(
                f"~{approx} distinct values of {value_col!r} exceed the exact-KS "
                f"single-reducer budget ({max_distinct}); use ks_2samp_quantile "
                "(the sketch path) or raise/disable max_distinct"
            )

    # the bounded per-value relation feeds BOTH the cumulative window and
    # the totals — localCheckpoint so the corpus scan + groupBy run once,
    # not once per consumer (code-review r4; same pattern as chi_square)
    per_value = s.groupBy("v").agg(
        F.sum("in_a").alias("ca"),
        F.sum(F.lit(1) - F.col("in_a")).alias("cb"),
    ).localCheckpoint()
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = per_value.select(
        "v",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    totals = per_value.agg(F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b"))
    return cum.crossJoin(F.broadcast(totals)).agg(
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
        F.round(
            F.max(F.abs(F.col("cum_a") / F.col("n_a") - F.col("cum_b") / F.col("n_b"))),
            6,
        ).alias("ks_stat"),
    )


def _count_lt(cuts: list[float], v) -> "F.Column":
    """#cuts strictly below ``v`` by an UNROLLED branchless binary search over
    the sorted literal cut array: ~log2(B) ``element_at`` probes per row, each
    level's running index bound ONCE via ``_let`` (Catalyst has no common-
    subexpression elimination, so a naive ``when`` chain would double the
    expression tree per level).
    """
    from ..functions.expr import let_ as _let

    m = len(cuts)
    arr = F.lit(cuts)

    def _advance(step: int):
        def body(lo):
            cand = lo + F.lit(step)
            ok = (cand <= F.lit(m)) & (F.element_at(arr, cand.cast("int")) < v)
            return F.when(ok, cand).otherwise(lo)

        return body

    step = 1
    while step * 2 <= m:
        step *= 2
    expr = F.lit(0).cast("long")
    while step >= 1:
        expr = _let(expr, _advance(step))
        step //= 2
    return expr


def ks_2samp_quantile(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    buckets: int = 1024,
) -> DataFrame:
    """Approximate KS via B-quantile ECDF comparison — the 10^12-row path.

    1. One mergeable-sketch pass (``percentile_approx``) produces ≤B-1 sorted
       cut points, collected to the driver (bounded by B, never by N).
    2. Each row is assigned its bucket = #cuts < v by an O(log B) unrolled
       binary search over the broadcast literal cuts — NO row multiplication
       (the previous form crossJoined every row with every cut: O(N·B)).
    3. ``groupBy(bucket)`` (map-side partial agg; ≤B+1 result rows), then a
       cumulative window over those ≤B+1 rows: cum(b) = #rows with v ≤
       cut_{b+1}, so D = max_b |cum_a(b)/n_a − cum_b(b)/n_b|.

    Error is bounded by the quantile-sketch accuracy + 1/B.
    """
    qs = [i / buckets for i in range(1, buckets)]
    s = df.where(F.col(group_col).isin([group_a, group_b])).select(
        F.col(value_col).cast("double").alias("v"),
        (F.col(group_col) == group_a).alias("is_a"),
    ).where(F.col("v").isNotNull())

    row = s.agg(F.percentile_approx("v", qs, 10000).alias("cut")).first()
    cuts = sorted(set(row["cut"] or []))
    if not cuts:
        return s.agg(
            F.sum(F.col("is_a").cast("long")).alias("n_a"),
            F.sum((~F.col("is_a")).cast("long")).alias("n_b"),
            F.lit(None).cast("double").alias("ks_stat"),
        )

    # ≤ B+1 rows feeding two consumers (window + totals): localCheckpoint
    # so the O(N) bucket scan runs once (code-review r4)
    counts = (
        s.select(_count_lt(cuts, F.col("v")).alias("b"), "is_a")
        .groupBy("b")
        .agg(
            F.sum(F.col("is_a").cast("long")).alias("ca"),
            F.sum((~F.col("is_a")).cast("long")).alias("cb"),
        )
        .localCheckpoint()
    )
    # the window relation is ≤ B+1 rows — bounded by the bucket count, not N
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = counts.select(
        F.sum("ca").over(w).alias("cum_a"), F.sum("cb").over(w).alias("cum_b")
    )
    totals = counts.agg(F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b"))
    return cum.crossJoin(F.broadcast(totals)).agg(
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
        F.round(
            F.max(F.abs(F.col("cum_a") / F.col("n_a") - F.col("cum_b") / F.col("n_b"))),
            6,
        ).alias("ks_stat"),
    )


def ks_per_group_pandas(
    df: DataFrame,
    value_col: str,
    group_col: str,
    split_col: str,
) -> DataFrame:
    """Per-group two-sample KS via ``applyInPandas`` — the grouped-pandas-UDF
    (UDAF) surface from SURVEY §2.10: one KS test per ``group_col`` value
    comparing the two halves of ``split_col`` (e.g. text-length drift per
    lang between two crawl snapshots). Arrow-batched; each group's samples
    must fit one executor — use the quantile variant for monster groups.
    """
    import numpy as np
    import pandas as pd

    out_schema = f"{group_col} string, n_a long, n_b long, ks_stat double"

    def ks(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf[group_col].iloc[0]
        # rows with a null split belong to NO half — drop them up front;
        # a None inside sorted() would TypeError the whole stage
        # (code-review r4)
        pdf = pdf[pdf[split_col].notna()]
        halves = pdf[split_col].unique()
        if len(halves) < 2:
            return pd.DataFrame(
                {group_col: [g], "n_a": [len(pdf)], "n_b": [0], "ks_stat": [None]}
            )
        ha, hb = sorted(halves)[:2]
        a = np.sort(pdf.loc[pdf[split_col] == ha, value_col].dropna().to_numpy())
        b = np.sort(pdf.loc[pdf[split_col] == hb, value_col].dropna().to_numpy())
        allv = np.concatenate([a, b])
        fa = np.searchsorted(a, allv, side="right") / max(len(a), 1)
        fb = np.searchsorted(b, allv, side="right") / max(len(b), 1)
        stat = float(np.max(np.abs(fa - fb))) if len(a) and len(b) else None
        return pd.DataFrame(
            {group_col: [g], "n_a": [len(a)], "n_b": [len(b)],
             "ks_stat": [round(stat, 6) if stat is not None else None]}
        )

    src = df.select(
        F.col(group_col).cast("string").alias(group_col),
        F.col(value_col).cast("double").alias(value_col),
        F.col(split_col).cast("string").alias(split_col),
    )
    return src.groupBy(group_col).applyInPandas(ks, out_schema)


def chi_square(
    df: DataFrame,
    bucket_col: str,
    group_col: str,
    salt_buckets: int = 0,
) -> DataFrame:
    """Pearson chi-square test of independence between bucket and group.

    Returns 1 row: (n, dof, chi2). ``salt_buckets > 0`` pre-aggregates cell
    counts through a salted two-stage groupBy — use when one bucket value
    dominates (Zipfian lang/domain keys at web scale, SURVEY §7.3).
    """
    base = df.select(
        F.col(bucket_col).cast("string").alias("b"),
        F.col(group_col).cast("string").alias("g"),
    ).where(F.col("b").isNotNull() & F.col("g").isNotNull())

    if salt_buckets > 0:
        salted = base.withColumn(
            "_salt", (F.xxhash64(F.monotonically_increasing_id()) % salt_buckets)
        )
        cells = (
            salted.groupBy("b", "g", "_salt").count()
            .groupBy("b", "g").agg(F.sum("count").alias("o"))
        )
    else:
        cells = base.groupBy("b", "g").agg(F.count(F.lit(1)).alias("o"))

    # eager localCheckpoint, not cache: cells is ≤ |buckets|×|groups| rows and
    # feeds four plan branches — checkpointing computes it once and leaves
    # nothing cached behind after the call (cache-lifecycle leak, ADVICE r2)
    cells = cells.localCheckpoint()
    row_tot = cells.groupBy("b").agg(F.sum("o").alias("row_n"))
    col_tot = cells.groupBy("g").agg(F.sum("o").alias("col_n"))
    n = cells.agg(F.sum("o").alias("n"))

    full = (
        row_tot.crossJoin(col_tot)
        .join(cells, ["b", "g"], "left")
        .na.fill({"o": 0})
        .crossJoin(F.broadcast(n))
        .withColumn("e", F.col("row_n") * F.col("col_n") / F.col("n"))
    )
    return full.agg(
        F.first("n").alias("n"),
        (
            (F.countDistinct("b") - F.lit(1)) * (F.countDistinct("g") - F.lit(1))
        ).cast("long").alias("dof"),
        F.round(F.sum(F.pow(F.col("o") - F.col("e"), 2) / F.col("e")), 6).alias("chi2"),
    )


def chi_square_vs_reference(
    observed: DataFrame,
    reference: DataFrame,
    bucket_col: str,
) -> DataFrame:
    """Goodness-of-fit of observed bucket counts vs a reference distribution.

    ``reference``: (bucket, p) rows with probabilities summing to 1 — a small
    broadcast dimension (e.g. last month's lang mix).
    """
    obs = observed.groupBy(F.col(bucket_col).cast("string").alias("b")).agg(
        F.count(F.lit(1)).alias("o")
    )
    n = obs.agg(F.sum("o").alias("n"))
    # FULL outer: observed buckets absent from the reference (p_ref = 0 —
    # the strongest drift signal, where chi-square is unbounded) previously
    # vanished from the statistic entirely (code-review r3). They can't
    # contribute a finite (o-e)²/e cell, so their mass surfaces as
    # ``novel_n`` / ``novel_buckets`` instead of being silently dropped.
    full = (
        F.broadcast(reference.select(F.col(bucket_col).cast("string").alias("b"), "p"))
        .join(obs, "b", "full")
        .na.fill({"o": 0, "p": 0.0})
        .crossJoin(F.broadcast(n))
        .withColumn("e", F.col("p") * F.col("n"))
    )
    return full.agg(
        F.first("n").alias("n"),
        (F.count(F.when(F.col("p") > 0, 1)) - F.lit(1)).cast("long").alias("dof"),
        F.round(
            F.sum(F.when(F.col("e") > 0, F.pow(F.col("o") - F.col("e"), 2) / F.col("e"))),
            6,
        ).alias("chi2"),
        F.sum(F.when(F.col("p") == 0, F.col("o")).otherwise(F.lit(0))).alias("novel_n"),
        (
            F.count(F.when((F.col("p") == 0) & (F.col("o") > 0), 1))
        ).cast("long").alias("novel_buckets"),
    )
