"""Stats + drift operators vs independently computed (numpy) oracles."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fairtracks_validator_spark.operators.drift import (
    chi_square,
    chi_square_vs_reference,
    ks_2samp_exact,
    ks_2samp_quantile,
)
from fairtracks_validator_spark.operators.stats import (
    cardinality_check,
    column_profile,
    null_rate_check,
)


@pytest.fixture(scope="module")
def sample(spark):
    rows = [(i, float(i % 7), "a" if i % 3 else None, "g1" if i < 60 else "g2")
            for i in range(100)]
    return spark.createDataFrame(rows, "id INT, v DOUBLE, s STRING, grp STRING")


def test_column_profile(sample):
    prof = {r["column"]: r for r in column_profile(sample, ["v", "s"], exact_distinct=True).collect()}
    assert prof["v"]["n_rows"] == 100
    assert prof["v"]["n_nulls"] == 0
    assert prof["v"]["min_str"] == "0.0" and prof["v"]["max_str"] == "6.0"
    assert prof["v"]["n_distinct"] == 7
    # s is null for i % 3 == 0 → 34 nulls
    assert prof["s"]["n_nulls"] == 34
    assert prof["s"]["null_rate"] == pytest.approx(0.34)
    assert prof["s"]["n_distinct"] == 1


def test_null_rate_check(sample):
    assert null_rate_check(sample, "s", max_null_rate=0.5).count() == 0
    viol = null_rate_check(sample, "s", max_null_rate=0.1).collect()
    assert len(viol) == 1 and "0.34" in viol[0]["description"]


def test_cardinality_check(spark):
    uniq = spark.range(1000).withColumnRenamed("id", "k")
    assert cardinality_check(uniq, "k").count() == 0
    dup = spark.range(1000).selectExpr("id % 10 as k")
    assert cardinality_check(dup, "k").count() == 1


def _ks_numpy(a, b):
    # exact two-sample KS statistic, evaluated at all sample points
    allv = np.sort(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), allv, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), allv, side="right") / len(b)
    return np.max(np.abs(fa - fb))


def test_ks_exact_matches_numpy(spark):
    rng = np.random.RandomState(42)
    a = rng.normal(0, 1, 500)
    b = rng.normal(0.5, 1.2, 400)
    rows = [(float(x), "a") for x in a] + [(float(x), "b") for x in b]
    df = spark.createDataFrame(rows, "v DOUBLE, grp STRING")
    got = ks_2samp_exact(df, "v", "grp", "a", "b").collect()[0]
    assert got["n_a"] == 500 and got["n_b"] == 400
    assert got["ks_stat"] == pytest.approx(_ks_numpy(a, b), abs=1e-6)


def test_ks_quantile_close_to_exact(spark):
    rng = np.random.RandomState(7)
    a = rng.normal(0, 1, 2000)
    b = rng.normal(0.3, 1.0, 2000)
    rows = [(float(x), "a") for x in a] + [(float(x), "b") for x in b]
    df = spark.createDataFrame(rows, "v DOUBLE, grp STRING")
    exact = ks_2samp_exact(df, "v", "grp", "a", "b").collect()[0]["ks_stat"]
    approx = ks_2samp_quantile(df, "v", "grp", "a", "b", buckets=256).collect()[0]["ks_stat"]
    assert abs(exact - approx) < 0.02


def test_sessionize(spark):
    from fairtracks_validator_spark.operators.sessions import (
        session_stats,
        sessionize,
    )

    rows = [
        # user 1: two sessions (gap 3600s between e2 and e3)
        (1, 1, "2024-01-01 10:00:00"), (2, 1, "2024-01-01 10:10:00"),
        (3, 1, "2024-01-01 11:20:00"),
        # user 2: one session, tie on ts broken by event_id
        (4, 2, "2024-01-01 09:00:00"), (5, 2, "2024-01-01 09:00:00"),
    ]
    df = spark.createDataFrame(rows, "event_id LONG, user_id LONG, ts_s STRING") \
        .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    s = {(r["event_id"]): r["session_id"]
         for r in sessionize(df, "user_id", "ts", "event_id", 1800).collect()}
    assert s == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1}
    stats = {(r["user_id"], r["session_id"]): (r["n_events"], r["duration_s"])
             for r in session_stats(df, "user_id", "ts", "event_id", 1800).collect()}
    assert stats == {(1, 1): (2, 600), (1, 2): (1, 0), (2, 1): (2, 0)}


def test_histogram_and_psi(spark):
    from fairtracks_validator_spark.operators.stats import histogram, psi

    rows = [(float(v), "ref") for v in [1, 2, 3, 10, 11, 12, -5, 100]] + [
        (float(v), "obs") for v in [1, 1, 1, 50, 50, 99, 200]
    ]
    df = spark.createDataFrame(rows, "v DOUBLE, g STRING")
    h = {r["bucket"]: r["n"] for r in histogram(df, "v", 0.0, 100.0, 10).collect()}
    assert sum(h.values()) == len(rows)          # every non-null row lands somewhere
    assert h[0] == 1 and h[11] == 2              # underflow -5; overflow 100, 200
    assert h[1] == 3 + 3                         # values 1,2,3 + three 1s

    got = psi(df, "v", "g", "ref", "obs", lo=0.0, hi=100.0, buckets=10).collect()[0]
    assert got["n_ref"] == 8 and got["n_obs"] == 7

    # numpy replica with the same binning + epsilon smoothing
    import numpy as np

    ref = np.array([1, 2, 3, 10, 11, 12, -5, 100], dtype=float)
    obs = np.array([1, 1, 1, 50, 50, 99, 200], dtype=float)

    def bins(a):
        b = np.floor((a - 0.0) / 100.0 * 10).astype(int) + 1
        b[a < 0] = 0
        b[a >= 100] = 11
        return b

    eps = 1e-6
    cells = sorted(set(bins(ref)) | set(bins(obs)))
    p_r = np.array([max((bins(ref) == c).sum() / len(ref), eps) for c in cells])
    p_o = np.array([max((bins(obs) == c).sum() / len(obs), eps) for c in cells])
    expected = float(((p_o - p_r) * np.log(p_o / p_r)).sum())
    assert got["psi"] == pytest.approx(expected, abs=1e-5)


def test_ks_quantile_bound_vs_numpy_sf001(spark):
    """|approx − exact| bound on the real sf0.01 events table (VERDICT r1
    item 4): error ≤ sketch accuracy + 1/B, asserted at 2/B."""
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    approx = ks_2samp_quantile(
        ev, "value", "event_type", "click", "view", buckets=256
    ).collect()[0]["ks_stat"]
    pdf = (
        ev.where(F.col("event_type").isin(["click", "view"]))
        .where(F.col("value").isNotNull())
        .select("value", "event_type")
        .toPandas()
    )
    a = pdf.loc[pdf.event_type == "click", "value"].to_numpy()
    b = pdf.loc[pdf.event_type == "view", "value"].to_numpy()
    exact = _ks_numpy(a, b)
    assert abs(approx - exact) <= 2.0 / 256


def test_ks_quantile_plan_no_row_multiplication(spark):
    """The quantile-KS plan must contain NO node that multiplies input rows
    (the old form crossJoined N rows × B cuts)."""
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    out = ks_2samp_quantile(ev, "value", "event_type", "click", "view", buckets=64)
    txt = out._jdf.queryExecution().executedPlan().toString()
    # the only join is the 1-row broadcast of totals onto ≤B+1 cum rows
    assert "CartesianProduct" not in txt
    assert txt.count("NestedLoop") <= 1, txt


def _chi2_numpy(table):
    o = np.asarray(table, dtype=float)
    row = o.sum(1, keepdims=True)
    col = o.sum(0, keepdims=True)
    e = row @ col / o.sum()
    return ((o - e) ** 2 / e).sum()


def test_chi_square_matches_numpy(spark):
    # 2 groups × 3 buckets contingency
    counts = {("x", "g1"): 30, ("y", "g1"): 10, ("z", "g1"): 20,
              ("x", "g2"): 15, ("y", "g2"): 25, ("z", "g2"): 10}
    rows = [(b, g) for (b, g), n in counts.items() for _ in range(n)]
    df = spark.createDataFrame(rows, "b STRING, g STRING")
    got = chi_square(df, "b", "g").collect()[0]
    expected = _chi2_numpy([[30, 15], [10, 25], [20, 10]])
    assert got["n"] == 110 and got["dof"] == 2
    assert got["chi2"] == pytest.approx(expected, abs=1e-4)
    # salted two-stage path must agree exactly
    salted = chi_square(df, "b", "g", salt_buckets=8).collect()[0]
    assert salted["chi2"] == got["chi2"]


def test_chi_square_vs_reference(spark):
    obs = spark.createDataFrame([("en",)] * 70 + [("de",)] * 30, "lang STRING")
    ref = spark.createDataFrame([("en", 0.5), ("de", 0.5)], "lang STRING, p DOUBLE")
    got = chi_square_vs_reference(obs, ref, "lang").collect()[0]
    # chi2 = (70-50)^2/50 + (30-50)^2/50 = 16
    assert got["chi2"] == pytest.approx(16.0, abs=1e-6)
    assert got["dof"] == 1


def test_hll_partition_sketches_merge(spark):
    from fairtracks_validator_spark.operators.stats import (
        hll_merge_estimate,
        hll_partition_sketches,
    )

    df = spark.range(20000).withColumn("part", (F.col("id") % 8).cast("int"))
    sk = hll_partition_sketches(df, "id", "part")
    assert sk.count() == 8
    est = hll_merge_estimate(sk).collect()[0]["estimate"]
    assert abs(est - 20000) / 20000 < 0.05


def test_ks_per_group_pandas(spark):
    from fairtracks_validator_spark.operators.drift import ks_per_group_pandas

    rng = np.random.RandomState(3)
    rows = []
    for lang, shift in [("en", 0.0), ("de", 1.0)]:
        for half, extra in [("h1", 0.0), ("h2", shift)]:
            for x in rng.normal(extra, 1, 300):
                rows.append((lang, half, float(x)))
    df = spark.createDataFrame(rows, "lang STRING, half STRING, v DOUBLE")
    got = {r["lang"]: r for r in ks_per_group_pandas(df, "v", "lang", "half").collect()}
    assert got["en"]["n_a"] == 300 and got["en"]["n_b"] == 300
    assert got["en"]["ks_stat"] < 0.15      # same distribution
    assert got["de"]["ks_stat"] > 0.3       # shifted distribution


def test_ranked_quantiles_bit_identical_to_percentile(spark):
    """_ranked_quantiles (the parallel exact-quantile path behind
    quantile_profile) must reproduce F.percentile's interpolated doubles
    BIT for bit — duplicates, nulls, negatives, empty and 1-row inputs."""
    import struct

    import pyspark.sql.functions as F

    from fairtracks_validator_spark.operators.stats import _ranked_quantiles

    fracs = [0.0, 0.25, 0.2498, 0.333333, 0.5, 0.75, 0.9, 1.0]
    cases = {
        "dups": spark.range(5000).select((F.col("id") % 7).cast("double").alias("x")),
        "negatives": spark.range(999).select((F.col("id") * -1.37 + 3).alias("x")),
        "nulls": spark.range(5000).select(
            F.when(F.col("id") % 3 == 0, F.col("id").cast("double")).alias("x")
        ),
        "single": spark.range(1).select(F.lit(42.5).alias("x")),
        "empty": spark.range(0).select(F.col("id").cast("double").alias("x")),
    }

    def bits(v):
        return None if v is None else struct.pack("<d", v)

    for name, df in cases.items():
        ref = df.agg(F.percentile(F.col("x"), fracs).alias("p")).collect()[0]["p"]
        got = _ranked_quantiles(df, F.col("x"), fracs, "p").collect()[0]["p"]
        if ref is None:
            assert got is None or all(v is None for v in got), name
            continue
        assert [bits(a) for a in ref] == [bits(b) for b in got], name
