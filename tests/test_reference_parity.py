"""End-to-end parity against the reference's OWN test-data corpora.

For each golden scenario under /root/reference/test-data we run the full
pipeline the way the reference CLI does (``fairGTrackJsonValidate
<schema-dir> <json-dir>``): load schemas from disk → compile → read the JSON
documents → route by @schema → two-pass validate → compare pass/fail sets.

Document order: the reference validates in directory-walk order; we stamp a
lexicographic file-path order, which matches sorted directory listings. The
*set* of failing documents is order-invariant for these corpora except for
duplicate-pair attribution, where we assert the lexicographic-first winner.
"""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

from fairtracks_validator_spark.plans.schema_compile import compile_schema
from fairtracks_validator_spark.runner import validate_corpus
from fairtracks_validator_spark.sources.catalog import (
    load_schemas,
    read_json_corpus,
    route_corpus,
    schema_id_column,
)

REF = "/root/reference/test-data"


def run_scenario(spark, scenario: str, corpus: str):
    """Returns ({source_basename: validated}, violations_df)."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        schemas = load_schemas(f"{REF}/{scenario}")
        plans = {sid: compile_schema(s) for sid, s in schemas.items()}
    df = read_json_corpus(spark, f"{REF}/{scenario}/{corpus}")
    df = df.withColumn("schema_id", schema_id_column(df))
    routed, orphans = route_corpus(df, plans)
    assert orphans.count() == 0
    res = validate_corpus(routed)
    verdicts = {
        r["source"].rsplit("/", 1)[-1]: r["validated"] for r in res.verdicts.collect()
    }
    return verdicts, res.violations


SCENARIOS_GOOD = [
    "unique_simple", "multiple_unique", "compound_unique", "compound_pk",
    "foreign_key_example", "foreignProperty_simple",
]


@pytest.mark.parametrize("scenario", SCENARIOS_GOOD)
def test_good_corpora_all_pass(spark, scenario):
    verdicts, violations = run_scenario(spark, scenario, "good_validation")
    assert verdicts and all(verdicts.values()), verdicts
    assert violations.count() == 0


BAD_EXPECTATIONS = {
    # scenario -> set of failing document basenames (lexicographic-first
    # duplicate holder wins, matching sorted directory-walk order)
    "unique_simple": {"dos.json", "uno.json"},
    "multiple_unique": {"dos.json", "trestres.json", "uno.json"},
    "compound_unique": {"trestres.json"},
    "compound_pk": {"trestres.json"},
    "foreign_key_example": {
        "trestres.json", "ref_dos_bad_2.json", "ref_dos_bad_20.json",
        "ref_siete.json",
    },
    "foreignProperty_simple": {"other_dos.json", "uno.json", "ref_diez.json"},
}


@pytest.mark.parametrize("scenario", sorted(BAD_EXPECTATIONS))
def test_bad_corpora_exact_failures(spark, scenario):
    verdicts, violations = run_scenario(spark, scenario, "bad_validation")
    failing = {s for s, ok in verdicts.items() if not ok}
    assert failing == BAD_EXPECTATIONS[scenario]


def test_fk_example_messages(spark):
    """Reference-exact message formats on the FK scenario."""
    _, violations = run_scenario(spark, "foreign_key_example", "bad_validation")
    descs = {r["description"] for r in violations.collect()}
    assert (
        'Unmatching FK (["2","veinte"]) in '
        f"file://{REF}/foreign_key_example/bad_validation/ref_dos_bad_2.json "
        "to schema compound_pk_example/1.0"
    ) in descs
    assert any(d.startswith("Duplicate PK in ") and d.endswith("trestres.json") for d in descs)
