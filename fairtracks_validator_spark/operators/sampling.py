"""Deterministic hash-based sampling — training-data pipeline operators.

A 100 TB corpus cannot be sampled with ``df.sample`` (RNG state is
partition-dependent, so re-runs and resumed checkpoints see different rows)
or ``orderBy(rand())`` (a global sort). Every operator here derives the
keep/split decision from a content hash of a stable key: map-only, zero
shuffle, reproducible across runs, cluster sizes, and engines (md5-hex is
byte-identical in Spark and DuckDB, so each query carries an exact SQL
oracle — no statistical tolerance needed).

No reference counterpart (the reference validates documents one-by-one);
these serve the north-star "training-data pipeline" surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bucket denominator — rates are exact multiples of 1e-6
DENOM = 1_000_000


def hash_bucket(key: Column, seed: str = "") -> Column:
    """Uniform bucket in [0, DENOM) from md5(key || '|' || seed).

    First 15 hex digits (60 bits) → BIGINT, engine-portable:
    Spark ``conv(substr(md5(k),1,15),16,10)`` ≡ DuckDB
    ``('0x' || substr(md5(k),1,15))::BIGINT``.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(key.cast("string"), F.lit("|" + seed))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(DENOM))


def hash_sample(
    df: DataFrame, key_col: str, rate: float, seed: str = ""
) -> DataFrame:
    """Keep rows whose key hashes below ``rate`` — an exact, re-runnable
    Bernoulli-style sample. Rows sharing a key are kept or dropped together
    (sampling is by entity, not by physical row — duplicate urls stay
    consistent)."""
    return df.where(hash_bucket(F.col(key_col), seed) < int(rate * DENOM))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: str = "",
) -> DataFrame:
    """Per-stratum hash sampling: e.g. downsample the head language while
    keeping the tail (``{"en": 0.1, "de": 1.0}``). One CASE expression over
    the stratum — still map-only; unlike ``sampleBy`` the decision is a pure
    function of (key, seed), so a resumed or re-partitioned run selects the
    identical rows."""
    thr = F.lit(int(default_rate * DENOM))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(int(rate * DENOM))
        ).otherwise(thr)
    return df.where(hash_bucket(F.col(key_col), seed) < thr)


def train_val_split(
    df: DataFrame,
    key_col: str,
    val_frac: float,
    test_frac: float = 0.0,
    seed: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Stamp each row 'val' / 'test' / 'train' by key hash. Entity-stable:
    all rows of one key land in one split (no leakage of a duplicated page
    across train and eval), invariant under repartitioning and resume."""
    b = hash_bucket(F.col(key_col), seed)
    val_cut = int(val_frac * DENOM)
    test_cut = val_cut + int(test_frac * DENOM)
    return df.withColumn(
        split_col,
        F.when(b < val_cut, F.lit("val"))
        .when(b < test_cut, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def importance_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    target_rate: float,
    seed: str = "",
    mean_weight: float | None = None,
) -> DataFrame:
    """Weighted (importance) sampling: keep probability proportional to a
    per-row weight, expected keep fraction ≈ ``target_rate`` — the DSIR /
    quality-weighted data-selection shape (Xie et al. 2023, public paper):
    upweight rows scoring high under a target distribution, downsample the
    rest, without a global sort or RNG state.

    ``p_row = min(weight · target_rate / mean_weight, 1)``; the decision is
    ``hash_bucket(key) < floor(p · DENOM)`` — deterministic, map-only,
    entity-stable, resumable, engine-portable (exact SQL oracle when the
    weight is integral and ``mean_weight`` association is preserved:
    ``(w · rate) / mean``).

    ``mean_weight`` (the normalization constant) is computed with one
    map-side-combined aggregation when not supplied; production runs at
    10^12 rows should pass the stored value from a profile run so sampling
    stays single-pass. Weights saturating at p=1 make the realized rate
    drift below ``target_rate`` — by design (nothing exceeds probability 1);
    callers chasing an exact output size should iterate on the stored mean.
    """
    if not 0.0 <= target_rate <= 1.0:
        raise ValueError(f"target_rate must be in [0, 1], got {target_rate}")
    if mean_weight is None:
        mean_weight = df.agg(
            F.avg(F.col(weight_col).cast("double"))
        ).first()[0]
    if mean_weight is None or mean_weight <= 0:
        raise ValueError(
            f"mean_weight must be positive (got {mean_weight}); "
            "weights must be non-negative with a positive mean"
        )
    p = F.least(
        F.col(weight_col).cast("double")
        * F.lit(float(target_rate))
        / F.lit(float(mean_weight)),
        F.lit(1.0),
    )
    return df.where(
        hash_bucket(F.col(key_col), seed) < F.floor(p * F.lit(DENOM))
    )


def temperature_rates(
    counts: dict[str, int], alpha: float, target_total: int
) -> dict[str, float]:
    """Per-stratum sampling rates for multilingual temperature sampling
    (mT5 / XLM-R recipe, public papers): sample stratum ``l`` proportional
    to ``count_l^alpha`` — ``alpha < 1`` flattens the head so tail languages
    survive. Driver-side arithmetic over the (tiny) per-stratum count dict;
    feed the result to :func:`stratified_sample`. Rates are capped at 1.0
    and the residual mass is NOT redistributed (a stratum cannot be
    oversampled without row duplication — use an explicit upsampling join
    for that)."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if target_total <= 0 or not counts:
        return {k: 0.0 for k in counts}
    weights = {k: (c ** alpha if c > 0 else 0.0) for k, c in counts.items()}
    total_w = sum(weights.values())
    if total_w == 0:
        return {k: 0.0 for k in counts}
    # want: sum(min(rate_k * count_k, count_k)) == target_total with
    # rate_k ∝ weight_k / count_k; solve the cap by water-filling (few
    # strata, driver-side)
    scale = target_total / total_w
    rates = {}
    capped: set[str] = set()
    for _ in range(len(counts) + 1):
        rates = {
            k: (1.0 if k in capped else min(
                weights[k] * scale / counts[k], 1.0
            ) if counts[k] > 0 else 0.0)
            for k in counts
        }
        newly = {
            k for k in counts
            if k not in capped and counts[k] > 0
            and weights[k] * scale / counts[k] >= 1.0
        }
        if not newly:
            break
        capped |= newly
        remaining = target_total - sum(counts[k] for k in capped)
        free_w = sum(weights[k] for k in counts if k not in capped)
        if remaining <= 0 or free_w == 0:
            rates = {
                k: (1.0 if k in capped else 0.0) for k in counts
            }
            break
        scale = remaining / free_w
    return rates


def cap_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    cap: int,
    seed: str = "",
) -> DataFrame:
    """Per-group document quota (the RefinedWeb/C4 per-domain cap): keep at
    most ``cap`` rows per group, chosen deterministically by
    (md5(id|seed) ASC, id ASC) — a re-runnable uniform draw, not "first
    cap rows seen" (which is partition-order-dependent).

    Returns the input columns + ``keep`` boolean (the violation-row
    convention: callers filter or report).

    Skew-aware two-phase plan: a map-combined group count first, then ONLY
    rows of groups larger than ``cap`` go through the row_number window —
    under-quota groups (the overwhelming majority of domains in a web
    corpus) skip the per-group sort entirely. The count and the window
    hash-partition on the same key, so AQE reuses the exchange; the hot
    domains that do rank are exactly the rows the window must sort anyway.
    A plain corpus-wide window would sort 10^12 rows to keep ranks the
    under-quota groups never use.
    """
    if cap < 0:
        raise ValueError(f"cap must be >= 0, got {cap}")
    from pyspark.sql import Window

    pri = F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|" + seed)))
    from ..functions.expr import null_safe_group_key

    # NULL groups are a real stratum (urls with no parseable domain); see
    # null_safe_group_key for why the rejoin needs a surrogate.
    keyed = df.withColumn("_gkey", null_safe_group_key(F.col(group_col)))
    sizes = keyed.groupBy("_gkey").agg(F.count(F.lit(1)).alias("_gsize"))
    j = keyed.join(sizes, "_gkey")

    under = j.where(F.col("_gsize") <= cap).withColumn("keep", F.lit(True))
    over = j.where(F.col("_gsize") > cap)
    # NULL ids rank LAST (their md5 priority and the id tie-break are both
    # NULL, so they'd otherwise order arbitrarily among themselves — the
    # relative order of multiple null-id rows is still unspecified; supply
    # a complete id column for a fully deterministic draw)
    w = Window.partitionBy("_gkey").orderBy(
        pri.asc_nulls_last(), F.col(id_col).asc_nulls_last()
    )
    over = over.withColumn("keep", F.row_number().over(w) <= cap)
    return under.unionByName(over).drop("_gkey", "_gsize")
