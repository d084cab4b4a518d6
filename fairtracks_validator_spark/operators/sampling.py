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
