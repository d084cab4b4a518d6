"""Column-level statistics — north-star additions (BASELINE.json.north_star).

No reference counterpart (the reference is a per-document validator); these
are the aggregate checks a 100 TB validation run needs: null-rate, min/max,
cardinality (exact + HyperLogLog sketch), and threshold verdicts over them.

All implemented as single-pass Spark aggregations: one ``agg`` with N*K
expressions profiles K columns in one scan + one reduce — map-side partial
aggregation does the heavy lifting; no shuffle of row data, only of partial
states. ``approx_count_distinct`` is Spark's HLL++ — mergeable per-partition
sketches, the only cardinality that is feasible at 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _src_col(df: DataFrame, name: str):
    """Column reference robust to special characters: an exact top-level
    column gets backtick-quoted (names with dots/dashes/spaces otherwise
    parse as field access or break the stack() SQL — code-review r4);
    anything else passes through F.col for nested-field access."""
    if name in df.columns:
        return F.col("`" + name.replace("`", "``") + "`")
    return F.col(name)


def column_profile(
    df: DataFrame,
    columns: list[str],
    exact_distinct: bool = False,
    hll_rsd: float = 0.05,
) -> DataFrame:
    """One output row per profiled column:
    (column, n_rows, n_nulls, null_rate, min_str, max_str, n_distinct).

    ``exact_distinct=True`` uses ``count(DISTINCT)`` (oracle-comparable,
    expensive — one expand per column); False uses HLL++ (the at-scale path).
    min/max are cast to string so heterogeneous column types stack into one
    result relation.
    """
    # positional internal aliases: raw column names spliced into aliases and
    # the stack() SQL break on dots/quotes/dashes (code-review r4)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, c in enumerate(columns):
        col = _src_col(df, c)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"_c{i}__nulls"),
            F.min(col).cast("string").alias(f"_c{i}__min"),
            F.max(col).cast("string").alias(f"_c{i}__max"),
            (
                F.countDistinct(col) if exact_distinct
                else F.approx_count_distinct(col, hll_rsd)
            ).alias(f"_c{i}__nd"),
        ]
    wide = df.agg(*aggs)

    # unpivot the single wide row into one row per column — stack() keeps it
    # a pure projection (no second scan)
    parts = []
    for i, c in enumerate(columns):
        lit_name = c.replace("\\", "\\\\").replace("'", "\\'")
        parts.append(
            f"'{lit_name}', _c{i}__nulls, _c{i}__min, _c{i}__max, _c{i}__nd"
        )
    stacked = wide.select(
        F.col("n_rows"),
        F.expr(
            f"stack({len(columns)}, "
            + ", ".join(parts)
            + ") as (column, n_nulls, min_str, max_str, n_distinct)"
        ),
    ).select("column", "n_rows", "n_nulls", "min_str", "max_str", "n_distinct")
    return stacked.withColumn(
        "null_rate",
        F.round(F.col("n_nulls") / F.greatest(F.col("n_rows"), F.lit(1)), 6),
    ).select("column", "n_rows", "n_nulls", "null_rate", "min_str", "max_str", "n_distinct")


def _ranked_quantiles(
    df: DataFrame, col, fracs: list[float], out_name: str
) -> DataFrame:
    """1-row DataFrame: ``out_name`` = array of EXACT interpolated quantiles
    of ``col`` at ``fracs``, value-identical to ``F.percentile(col, fracs)``.

    Shape: count-by-value (parallel partial agg + one narrow shuffle) →
    single-partition window over the ~distinct values (running count +
    total) → one conditional-min per bracketing rank. The interpolation
    replicates ``Percentile.getPercentile`` term for term:
    ``pos = frac * (n - 1)``; if ``floor(pos) == ceil(pos)`` the value at
    ``pos``, else ``(ceil(pos) - pos) * lower + (pos - floor(pos)) * upper``
    — same operand order, so bit-identical doubles.
    """
    from pyspark.sql import Window

    vc = (
        df.select(col.alias("v"))
        .where(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_run = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = vc.select(
        "v",
        F.sum("c").over(w_run).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )

    def _pos(n_col, f: float):
        pos = F.lit(float(f)) * (n_col - 1).cast("double")
        return pos, F.floor(pos), F.ceil(pos)

    aggs = [F.max("n").alias("_n")]
    for i, f in enumerate(fracs):
        _, lo, hi = _pos(F.col("n"), f)
        # bucket of the 0-based rank k is the first value whose running
        # count exceeds k
        aggs.append(
            F.min(F.when(F.col("cum") > lo, F.col("v"))).alias(f"_lo{i}")
        )
        aggs.append(
            F.min(F.when(F.col("cum") > hi, F.col("v"))).alias(f"_hi{i}")
        )
    one = cum.agg(*aggs)
    outs = []
    for i, f in enumerate(fracs):
        pos, lo, hi = _pos(F.col("_n"), f)
        lov, hiv = F.col(f"_lo{i}"), F.col(f"_hi{i}")
        outs.append(
            F.when(lo == hi, lov).otherwise(
                (hi.cast("double") - pos) * lov
                + (pos - lo.cast("double")) * hiv
            )
        )
    return one.select(F.array(*outs).alias(out_name))


def quantile_profile(
    df: DataFrame,
    columns: list[str],
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-column quantiles: exact (interpolated ``percentile``) AND the
    sketch value (``percentile_approx`` — the 10^12-row path), plus a
    verdict that the sketch honours its rank-error contract.

    One row per (column, q): ``(column, q, exact_q, within_tol)`` where
    ``within_tol`` asserts the approx value lies between the exact
    quantiles at ``q ± 2/accuracy`` — the documented GK-sketch bound. All
    quantiles for all columns compute in ONE aggregation (single scan,
    partial-aggregated; only sketch states shuffle).
    """
    eps = 2.0 / accuracy
    nq = len(qs)
    all_fracs = []
    for q in qs:
        all_fracs.append(float(q))
    for q in qs:
        all_fracs += [max(q - eps, 0.0), min(q + eps, 1.0)]
    # Exact quantiles via grouped counts + ordered cumulative ranks instead
    # of the Percentile aggregate (r6): Percentile builds a value→count map
    # per partial task and merges the partials in ONE final task — over
    # mostly-distinct doubles that merge is a single-threaded build of an
    # N-entry map (~9 s for 2×1.5M values). Here the count-by-value shuffle
    # partial-aggregates in parallel, one narrow single-partition window
    # ranks the ~distinct values, and each requested fraction reads its
    # bracketing values with a conditional min. Interpolation replicates
    # Percentile's arithmetic term for term (verified value-identical —
    # see tests), so results are unchanged.
    wide = df.agg(
        *[
            F.percentile_approx(
                _src_col(df, c).cast("double"), [float(q) for q in qs],
                accuracy,
            ).alias(f"_c{j}__ap")
            for j, c in enumerate(columns)
        ]
    )
    for j, c in enumerate(columns):
        col = _src_col(df, c).cast("double")
        wide = wide.crossJoin(
            _ranked_quantiles(df, col, all_fracs, f"_c{j}__all")
        )
    parts = []
    for j, c in enumerate(columns):
        lit_name = c.replace("\\", "\\\\").replace("'", "\\'")
        for i, q in enumerate(qs):
            parts.append(
                f"'{lit_name}', CAST({q} AS DOUBLE), _c{j}__all[{i}], "
                f"_c{j}__all[{nq + 2 * i}], _c{j}__all[{nq + 2 * i + 1}], "
                f"_c{j}__ap[{i}]"
            )
    stacked = wide.select(
        F.expr(
            f"stack({len(columns) * len(qs)}, " + ", ".join(parts)
            + ") as (column, q, ex, lo, hi, ap)"
        )
    )
    return stacked.select(
        "column",
        "q",
        F.round("ex", 6).alias("exact_q"),
        ((F.col("ap") >= F.col("lo")) & (F.col("ap") <= F.col("hi"))).alias(
            "within_tol"
        ),
    )


def distinct_count_per_group(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Exact ``count(DISTINCT value)`` per group, Zipf-safe by construction:
    the expensive shuffle is keyed by ``(group, value)`` — the value acts as
    a built-in salt, so one dominant group (``lang``/domain at web scale)
    spreads over the whole cluster; the second stage aggregates ≤ one row
    per distinct pair. A naive ``groupBy(g).agg(countDistinct(v))`` expands
    the same way internally but this form keeps the two stages explicit and
    lets the first stage reuse an existing (g, v) partitioning."""
    pairs = df.select(
        F.col(group_col).alias("g"), F.col(value_col).alias("v")
    ).where(F.col("v").isNotNull()).distinct()
    return (
        pairs.groupBy("g").agg(F.count(F.lit(1)).alias("n_distinct"))
        .select(F.col("g").alias(group_col), "n_distinct")
    )


def top_k_per_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int,
) -> DataFrame:
    """Exact top-``k`` heavy hitters per group (count desc, value asc on
    ties) → (group, value, cnt, rank).

    Skew-safe tree shape for a 10^12-token corpus: stage 1 counts by
    ``(group, value)`` — the value salts the dominant group across the
    cluster, and map-side partial aggregation absorbs hot tokens before the
    shuffle. A single window over ``group`` would then funnel a whole
    group's vocabulary (10^7+ distinct tokens for the head language) through
    one task, so stage 2 takes a LOCAL top-k per (group, shuffle-partition)
    first — each window partition is a fragment — and the final window only
    ranks ≤ k·P pre-filtered candidates per group.
    """
    from pyspark.sql.window import Window

    counts = (
        df.select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
        .where(F.col("v").isNotNull())
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    order = [F.desc("cnt"), F.asc("v")]
    local_w = Window.partitionBy("g", "_p").orderBy(*order)
    local = (
        counts.withColumn("_p", F.spark_partition_id())
        .withColumn("_r", F.row_number().over(local_w))
        .where(F.col("_r") <= k)
        .drop("_p", "_r")
    )
    final_w = Window.partitionBy("g").orderBy(*order)
    return (
        local.withColumn("rank", F.row_number().over(final_w))
        .where(F.col("rank") <= k)
        .select(
            F.col("g").alias(group_col),
            F.col("v").alias(value_col),
            "cnt",
            "rank",
        )
    )


def hll_partition_sketches(
    df: DataFrame, column: str, partition_col: str, lg_k: int = 12
) -> DataFrame:
    """Mergeable per-partition HLL sketches: (partition, sketch bytes, estimate).

    The 10^12-row cardinality workflow: each partition/shard persists its
    sketch in the lineage table; any subset's cardinality is one
    ``hll_union_agg`` away — no rescan. (Datasketches HLL via Spark's
    ``hll_sketch_agg``.)
    """
    return df.groupBy(partition_col).agg(
        F.hll_sketch_agg(column, F.lit(lg_k)).alias("sketch")
    ).select(
        partition_col,
        "sketch",
        F.hll_sketch_estimate("sketch").alias("estimate"),
    )


def hll_merge_estimate(sketches: DataFrame, sketch_col: str = "sketch") -> DataFrame:
    """Union previously persisted sketches → one global estimate row."""
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias("estimate")
    )


def fixed_width_bucket(value, lo: float, hi: float, buckets: int):
    """Bucket index 1..buckets for values in [lo, hi); 0 below, buckets+1 at/
    above hi. Explicit floor arithmetic (NOT ``width_bucket``) so any SQL
    engine reproduces the exact same bin edges bit for bit."""
    v = value.cast("double")
    raw = F.floor((v - F.lit(float(lo))) / F.lit(float(hi - lo)) * buckets) + 1
    return (
        F.when(v < lo, F.lit(0))
        .when(v >= hi, F.lit(buckets + 1))
        .otherwise(raw)
        .cast("int")
    )


def histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    buckets: int = 20,
) -> DataFrame:
    """Fixed-width histogram: (bucket, lo_edge, hi_edge, n). One map-combined
    aggregation — shuffle payload is ≤ buckets+2 partial rows per task, never
    row data; under/overflow land in buckets 0 and buckets+1."""
    width = (hi - lo) / buckets
    b = fixed_width_bucket(F.col(value_col), lo, hi, buckets)
    return (
        df.where(F.col(value_col).isNotNull())
        .groupBy(b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            F.round(F.lit(lo) + (F.col("bucket") - 1) * F.lit(width), 6).alias("lo_edge"),
            F.round(F.lit(lo) + F.col("bucket") * F.lit(width), 6).alias("hi_edge"),
            "n",
        )
        .orderBy("bucket")
    )


def psi(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_ref,
    group_obs,
    lo: float,
    hi: float,
    buckets: int = 10,
    epsilon: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between a reference and an observed group:
    PSI = Σ_b (p_obs − p_ref) · ln(p_obs / p_ref), over fixed-width buckets
    (plus under/overflow). Empty bins are floored at ``epsilon`` (the
    standard smoothing, part of the contract so SQL oracles reproduce it).
    One aggregation over ≤ buckets+2 cells; drift verdicts usually threshold
    at 0.1 (moderate) / 0.25 (major)."""
    s = df.where(F.col(group_col).isin([group_ref, group_obs])).select(
        fixed_width_bucket(F.col(value_col), lo, hi, buckets).alias("bucket"),
        (F.col(group_col) == group_obs).alias("is_obs"),
    ).where(F.col("bucket").isNotNull())
    cells = s.groupBy("bucket").agg(
        F.sum((~F.col("is_obs")).cast("long")).alias("c_ref"),
        F.sum(F.col("is_obs").cast("long")).alias("c_obs"),
    )
    totals = cells.agg(F.sum("c_ref").alias("n_ref"), F.sum("c_obs").alias("n_obs"))
    p_ref = F.greatest(F.col("c_ref") / F.col("n_ref"), F.lit(epsilon))
    p_obs = F.greatest(F.col("c_obs") / F.col("n_obs"), F.lit(epsilon))
    return cells.crossJoin(F.broadcast(totals)).agg(
        F.first("n_ref").alias("n_ref"),
        F.first("n_obs").alias("n_obs"),
        F.round(F.sum((p_obs - p_ref) * F.log(p_obs / p_ref)), 6).alias("psi"),
    )


def null_rate_check(
    df: DataFrame, column: str, max_null_rate: float, schema_id: str = "stats"
) -> DataFrame:
    """Aggregate constraint: violation row iff null-rate exceeds threshold."""
    agg = df.agg(
        F.avg(F.col(column).isNull().cast("double")).alias("rate"),
        F.count(F.lit(1)).alias("n"),
    )
    return agg.where(F.col("rate") > max_null_rate).select(
        F.lit(None).cast("string").alias("source"),
        F.lit(None).cast("long").alias("ord"),
        F.lit(schema_id).alias("schema_id"),
        F.lit(f"null_rate:{column}").alias("check_id"),
        F.lit(None).cast("string").alias("key_str"),
        F.lit("null_rate").alias("reason"),
        F.format_string(
            f"null rate %.6f of column {column} exceeds threshold {max_null_rate}",
            F.col("rate"),
        ).alias("description"),
    )


def cardinality_check(
    df: DataFrame,
    column: str,
    expected_unique: bool = True,
    tolerance: float = 0.05,
    schema_id: str = "stats",
) -> DataFrame:
    """HLL-based near-uniqueness probe: cheap pre-flight before the exact
    uniqueness shuffle (at 10^12 rows you run THIS first; the exact dup check
    only on suspicion)."""
    agg = df.agg(
        F.approx_count_distinct(column, tolerance / 2).alias("approx_nd"),
        F.sum(F.col(column).isNotNull().cast("long")).alias("n_non_null"),
    )
    cond = (
        F.col("approx_nd") < F.col("n_non_null") * (1.0 - tolerance)
        if expected_unique
        else F.lit(False)
    )
    return agg.where(cond).select(
        F.lit(None).cast("string").alias("source"),
        F.lit(None).cast("long").alias("ord"),
        F.lit(schema_id).alias("schema_id"),
        F.lit(f"cardinality:{column}").alias("check_id"),
        F.lit(None).cast("string").alias("key_str"),
        F.lit("cardinality").alias("reason"),
        F.format_string(
            f"approx distinct %d of column {column} below %d non-null rows "
            f"(tolerance {tolerance})",
            F.col("approx_nd"), F.col("n_non_null"),
        ).alias("description"),
    )


def multi_histogram(
    df: "DataFrame", specs: list[tuple[str, float, float, int]]
) -> "DataFrame":
    """Fixed-width histograms for MANY columns in ONE scan.

    ``specs``: ``[(column, lo, hi, buckets), ...]``. Output one row per
    non-empty (column, bucket) cell:
    ``(column, lo, hi, buckets, bucket, lo_edge, hi_edge, n)`` — the spec
    columns ride along so a later run (drift comparison) can rebuild the
    identical grid from the stored table alone.

    Shape: each row emits one ``(column, bucket)`` struct per spec via an
    inline array + explode (map-side, no row duplication cost beyond the
    ≤ len(specs) structs), then a single map-combined aggregation whose
    shuffle payload is ≤ Σ(buckets+2) cells per task — N separate
    :func:`histogram` calls would scan the table N times."""
    if not specs:
        raise ValueError("multi_histogram needs at least one spec")
    entries = []
    for c, lo, hi, buckets in specs:
        if not hi > lo:
            raise ValueError(f"{c}: need hi > lo, got [{lo}, {hi}]")
        width = (hi - lo) / buckets
        b = fixed_width_bucket(_src_col(df, c), lo, hi, buckets)
        entries.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit(float(lo)).alias("lo"),
                F.lit(float(hi)).alias("hi"),
                F.lit(int(buckets)).alias("buckets"),
                b.alias("bucket"),
                F.round(F.lit(lo) + (b - 1) * F.lit(width), 6).alias("lo_edge"),
                F.round(F.lit(lo) + b * F.lit(width), 6).alias("hi_edge"),
            )
        )
    return (
        df.select(F.explode(F.array(*entries)).alias("e"))
        .where(F.col("e.bucket").isNotNull())
        .groupBy(
            "e.column", "e.lo", "e.hi", "e.buckets",
            "e.bucket", "e.lo_edge", "e.hi_edge",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("column", "bucket")
    )


def psi_timeseries(
    df: "DataFrame",
    value_col: str,
    ts_col: str,
    lo: float,
    hi: float,
    buckets: int = 10,
    eps: float = 1e-6,
) -> "DataFrame":
    """Hourly drift monitor: PSI of each hour's value distribution vs the
    PREVIOUS observed hour — the continuous form of :func:`psi` a production
    validation run charts per partition/window.

    Shape: one (hour, bucket) aggregation (map-combined; ≤ windows×(B+2)
    result rows — bounded by the time range, never by N), the bucket grid
    completed so empty bins floor at ``eps``, shares lagged per bucket
    across hours. Hours with no rows at all simply don't appear; the lag
    then compares to the last OBSERVED hour (documented gap semantics).
    The first observed hour has no predecessor and is omitted.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    b = fixed_width_bucket(F.col(value_col), lo, hi, buckets)
    cells = (
        # null timestamps would form a phantom w=NULL window that sorts
        # first and corrupts the earliest real hour's lag (code-review r3)
        df.where(F.col(value_col).isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(F.date_trunc("hour", F.col(ts_col)).alias("w"), b.alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wins = cells.select("w").distinct()
    grid = wins.crossJoin(
        spark.range(0, buckets + 2).select(F.col("id").cast("int").alias("b"))
    )
    full = grid.join(cells, ["w", "b"], "left").na.fill({"n": 0})
    share = F.col("n") / F.sum("n").over(Window.partitionBy("w"))
    prev = F.lag("share").over(Window.partitionBy("b").orderBy("w"))
    s = F.greatest(F.col("share"), F.lit(eps))
    p = F.greatest(F.col("prev"), F.lit(eps))
    return (
        full.withColumn("share", share)
        .withColumn("prev", prev)
        .where(F.col("prev").isNotNull())
        .groupBy("w")
        .agg(F.round(F.sum((s - p) * F.log(s / p)), 6).alias("psi"))
        .select(F.col("w").cast("string").alias("window_start"), "psi")
        .orderBy("window_start")
    )
