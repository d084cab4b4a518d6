"""Single-action observed sink: wide verdicts + nested violations.

The production sink writes verdicts AND violations in ONE Spark action with
the run counts as ``observe()`` accumulators (``runner.sink_observed``) —
the fix for the N→4N serial-residue (5 jobs / 9 stages of separate count
actions per run, BENCH/BASELINE.md r4). These tests pin:

- wide ↔ flat parity: exploding ``wide_verdicts().violations`` reproduces
  the flat violations relation exactly, on both the fused single-schema
  path (wide built inside the existing shuffle) and the general
  multi-schema path (join fallback);
- observed counts equal the per-output counts;
- the parquet sink round-trips (explode of the written table = violations);
- the job count of the observed sink stays at the AQE minimum.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fairtracks_validator_spark.plans.schema_compile import compile_schema
from fairtracks_validator_spark.runner import validate_corpus, sink_observed

from conftest import rows_set

_DOCS_SCHEMA = {
    "$id": "t/1.0",
    "required": ["name"],
    "properties": {
        "name": {"type": "string", "minLength": 2},
        "n": {"type": "integer", "minimum": 0},
    },
    "primary_key": ["name"],
}


def _corpus(spark):
    rows = [
        ("a", "alice", 1),
        ("b", "bo", -1),      # minimum violation
        ("c", None, 2),       # required violation
        ("d", "alice", 3),    # dup PK
        ("e", "x", 4),        # minLength violation
    ]
    df = spark.createDataFrame(rows, "source string, name string, n int")
    return df.withColumn("ord", F.monotonically_increasing_id())


def _explode_wide(wide):
    return wide.select(
        "source", "ord", "schema_id", F.explode("violations").alias("v")
    ).select(
        "source", "ord", "schema_id",
        "v.check_id", "v.key_str", "v.reason", "v.description",
    )


def test_fused_wide_parity_and_counts(spark, tmp_path):
    plan = compile_schema(_DOCS_SCHEMA)
    df = _corpus(spark)
    res = validate_corpus({"t/1.0": (plan, df)})
    assert res.wide is not None  # fused path built it in-plan

    flat = res.violations
    assert rows_set(_explode_wide(res.wide_verdicts())) == rows_set(flat)

    # observed counts == per-output counts, via the parquet sink round-trip
    out = str(tmp_path / "verdicts")
    m = sink_observed(res, path=out)
    assert m["docs"] == df.count() == 5
    assert m["violations"] == flat.count()
    assert m["failed_docs"] == res.verdicts.where(~F.col("validated")).count()

    written = spark.read.parquet(out)
    assert rows_set(_explode_wide(written)) == rows_set(flat)
    # every doc present exactly once, ok docs carry an EMPTY (not null) array
    assert written.count() == 5
    assert written.where(F.col("violations").isNull()).count() == 0
    assert (
        written.where(F.col("validated") & (F.size("violations") > 0)).count()
        == 0
    )


def test_general_path_wide_join_fallback(spark):
    """Multi-schema corpus exercises the non-fused path (wide is None →
    group+join reconstruction)."""
    plan_a = compile_schema(_DOCS_SCHEMA)
    plan_b = compile_schema(
        {
            "$id": "u/1.0",
            "properties": {"v": {"type": "integer", "maximum": 10}},
            "foreign_keys": [
                {"schema_id": "t/1.0", "members": ["ref"]}
            ],
        }
    )
    docs_b = spark.createDataFrame(
        [("x", 5, "alice"), ("y", 99, "nobody")],
        "source string, v int, ref string",
    ).withColumn("ord", F.monotonically_increasing_id())
    res = validate_corpus(
        {"t/1.0": (plan_a, _corpus(spark)), "u/1.0": (plan_b, docs_b)}
    )
    assert res.wide is None
    wide = res.wide_verdicts()
    assert rows_set(_explode_wide(wide)) == rows_set(res.violations)
    m = sink_observed(res)  # noop sink: computation only
    assert m["docs"] == res.verdicts.count() == 7
    assert m["violations"] == res.violations.count()
    res.release()


def test_observed_sink_job_count(spark):
    """The fused observed sink runs at the AQE minimum (map job + final
    job) — not one job per output, which was the scaling residue."""
    plan = compile_schema(_DOCS_SCHEMA)
    res = validate_corpus({"t/1.0": (plan, _corpus(spark))})
    sc = spark.sparkContext
    sc.setJobGroup("sink-jobs", "observed sink job-count probe")
    try:
        sink_observed(res)
    finally:
        sc.setJobGroup(None, None)
    tracker = sc.statusTracker()
    jobs = tracker.getJobIdsForGroup("sink-jobs")
    assert 1 <= len(jobs) <= 3, f"expected one observed action, saw {jobs}"


def test_observed_counts_exclude_ignored_from_failed(spark):
    """Orphan (status='ignored') docs carry validated=False but must NOT
    count as failed_docs — sink_observed and summary() agree (code-review
    r5: the sink previously summed ~validated, double-counting orphans)."""
    from fairtracks_validator_spark.runner import validate_routed

    plan = compile_schema(_DOCS_SCHEMA)
    df = spark.createDataFrame(
        [
            ("a", "t/1.0", "alice", 1),
            ("b", "t/1.0", "x", 2),       # minLength violation -> failed
            ("c", "ghost/9", "bob", 3),   # orphan -> ignored
            ("d", "ghost/9", "eve", 4),   # orphan -> ignored
        ],
        "source string, schema_id string, name string, n int",
    ).withColumn("ord", F.monotonically_increasing_id())
    res = validate_routed(df, {"t/1.0": plan})
    m = sink_observed(res)
    s = res.summary()
    assert m["docs"] == s["docs"] == 4
    assert m["failed_docs"] == s["failed_docs"] == 1
    assert m["ignored_docs"] == s["ignored_docs"] == 2
    res.release()


def test_invalid_dup_strategy_rejected(spark):
    plan = compile_schema(_DOCS_SCHEMA)
    import pytest

    with pytest.raises(ValueError, match="dup_strategy"):
        validate_corpus({"t/1.0": (plan, _corpus(spark))}, dup_strategy="bcast")
