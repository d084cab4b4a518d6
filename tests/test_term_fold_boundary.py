"""TERM_FOLD_MAX boundary (VERDICT r2 "do this" #10): a >100k-row terms
dimension must flip the compiler from the zero-shuffle folded expression to
the broadcast-join path, and BOTH paths must agree on the verdicts at the
threshold."""

from __future__ import annotations

from pyspark.sql import functions as F

from fairtracks_validator_spark.operators import checks as C
from fairtracks_validator_spark.plans.schema_compile import Dims, compile_schema
from fairtracks_validator_spark.runner import validate_corpus

from conftest import rows_set


def _terms(spark, n):
    """Synthetic ontology dim with n distinct IRIs (models a live-sized
    ontology rather than a vendored snapshot)."""
    return spark.range(n).select(
        F.lit("bigont").alias("ontology"),
        F.concat(F.lit("http://big.example/T"), F.col("id")).alias("iri"),
        F.concat(F.lit("label "), F.col("id")).alias("label"),
    )


def _docs(spark):
    return spark.createDataFrame(
        [("r1", 1, "http://big.example/T0"),            # in dim
         ("r2", 2, "http://big.example/T99999"),        # in dim (≤ both sizes)
         ("r3", 3, "http://other.example/NOPE"),        # violation
         ("r4", 4, None)],                               # absent ⇒ ok
        "source string, ord long, term string",
    )


SCHEMA = {
    "$id": "bigont/1.0",
    "properties": {
        "term": {"format": "term", "matchType": "exact", "ontology": "bigont"},
    },
}


def test_fold_at_cap_join_above_cap(spark):
    at_cap = _terms(spark, C.TERM_FOLD_MAX)
    over_cap = _terms(spark, C.TERM_FOLD_MAX + 1)

    plan_fold = compile_schema(SCHEMA, dims=Dims(terms=at_cap))
    assert [c.check_id for c in plan_fold.checks] == ["format:term:term"]
    assert plan_fold.join_checks == []

    plan_join = compile_schema(SCHEMA, dims=Dims(terms=over_cap))
    assert plan_join.checks == []
    assert [jc.check_id for jc in plan_join.join_checks] == ["format:term:term"]

    # end-to-end parity across the boundary: identical violations
    docs = _docs(spark)
    v_fold = rows_set(
        validate_corpus({"bigont/1.0": (plan_fold, docs)}).violations
        .select("source", "check_id")
    )
    v_join = rows_set(
        validate_corpus({"bigont/1.0": (plan_join, docs)}).violations
        .select("source", "check_id")
    )
    assert v_fold == v_join == {("r3", "format:term:term")}


def test_forced_join_path_matches_fold_at_cap(spark):
    """fold_term_dims=False forces the join path on the SAME dim that would
    fold — both code paths, same dimension, same verdicts."""
    at_cap = _terms(spark, C.TERM_FOLD_MAX)
    plan_forced = compile_schema(SCHEMA, dims=Dims(terms=at_cap,
                                                   fold_term_dims=False))
    assert plan_forced.checks == [] and len(plan_forced.join_checks) == 1
    got = rows_set(
        validate_corpus({"bigont/1.0": (plan_forced, _docs(spark))}).violations
        .select("source", "check_id")
    )
    assert got == {("r3", "format:term:term")}


def test_suffix_fold_cap_is_tighter(spark):
    """suffix folding is O(|dim|) per value, so its cap is lower: a dim over
    TERM_FOLD_MAX_SUFFIX must return None (join fallback)."""
    over = _terms(spark, C.TERM_FOLD_MAX_SUFFIX + 1)
    assert C.fold_term_check(
        "term", match_type="suffix", ontologies=["bigont"], terms=over
    ) is None
    under = _terms(spark, 50)
    assert C.fold_term_check(
        "term", match_type="suffix", ontologies=["bigont"], terms=under
    ) is not None
