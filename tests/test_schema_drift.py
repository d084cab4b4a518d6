"""Schema/table drift: a plan referencing columns the table lacks must
behave like the reference's "property absent" semantics (required fails,
other keywords vacuous, keys contribute nothing) — never crash with
UNRESOLVED_COLUMN. Drift is warned, not silent."""

from __future__ import annotations

import warnings

from fairtracks_validator_spark.plans.schema_compile import compile_schema
from fairtracks_validator_spark.runner import validate_corpus

from conftest import rows_set


def test_missing_flat_column(spark):
    df = spark.createDataFrame([("r1", 1, "x"), ("r2", 2, "y")],
                               "source string, ord long, a string")
    plan = compile_schema({
        "$id": "s/1",
        "required": ["missing_col"],
        "primary_key": ["gone_key"],
        "properties": {
            "a": {"minLength": 1},
            "missing_col": {"pattern": "^x", "minLength": 3},
        },
        "foreign_keys": [{"schema_id": "s/1", "members": ["gone_key"]}],
    })
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        res = validate_corpus({"s/1": (plan, df)})
        got = rows_set(res.violations.select("source", "check_id"))
    # required fails per row; pattern/minLength vacuous on the null pad;
    # PK/FK over the missing key produce no keys, hence no violations
    assert got == {("r1", "required:missing_col"), ("r2", "required:missing_col")}
    assert any("schema drift" in str(x.message) for x in w)


def test_missing_struct_field(spark):
    df = spark.createDataFrame(
        [("r1", 1, ("v1",)), ("r2", 2, ("v2",))],
        "source string, ord long, obj struct<present:string>",
    )
    plan = compile_schema({
        "$id": "s/2",
        "properties": {"obj": {"properties": {
            "present": {"minLength": 2},
            "absent": {"pattern": "^z"},
        }, "required": ["absent"]}},
    })
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        res = validate_corpus({"s/2": (plan, df)})
        got = rows_set(res.violations.select("source", "check_id"))
    assert got == {("r1", "required:obj.absent"), ("r2", "required:obj.absent")}
    assert any("schema drift" in str(x.message) for x in w)


def test_missing_array_of_struct_field(spark):
    df = spark.createDataFrame(
        [("r1", 1, [("k1",), ("k2",)])],
        "source string, ord long, items array<struct<k:string>>",
    )
    plan = compile_schema({
        "$id": "s/3",
        "properties": {"items": {"items": {"properties": {
            "k": {"minLength": 1},
            "nope": {"pattern": "^q"},
        }}}},
    })
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        res = validate_corpus({"s/3": (plan, df)})
        assert res.violations.count() == 0  # pattern vacuous on padded nulls
    assert any("schema drift" in str(x.message) for x in w)


def test_missing_field_with_deeper_sibling_path(spark):
    """advice r4: plan jpaths 'a.b' AND 'a.b.c' with field b absent — the
    pad for b must merge BOTH shapes (struct<c:string>, not string) or the
    deeper path crashes at analysis with INVALID_EXTRACT_BASE_FIELD_TYPE."""
    df = spark.createDataFrame(
        [("r1", 1, ("v1",)), ("r2", 2, ("v2",))],
        "source string, ord long, a struct<present:string>",
    )
    plan = compile_schema({
        "$id": "s/5",
        "properties": {"a": {
            "required": ["b"],
            "properties": {
                "present": {"minLength": 1},
                "b": {
                    "minLength": 3,
                    "properties": {"c": {"pattern": "^z"}},
                },
            },
        }},
    })
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        res = validate_corpus({"s/5": (plan, df)})
        got = rows_set(res.violations.select("source", "check_id"))
    # b absent: required on the (present) parent fails; minLength on b and
    # pattern on b.c are vacuous against the typed-null pad
    assert got == {("r1", "required:a.b"), ("r2", "required:a.b")}
    assert any("schema drift" in str(x.message) for x in w)


def test_no_drift_no_warning_no_change(spark):
    df = spark.createDataFrame([("r1", 1, "x")], "source string, ord long, a string")
    plan = compile_schema({"$id": "s/4", "properties": {"a": {"minLength": 1}}})
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        res = validate_corpus({"s/4": (plan, df)})
        assert res.violations.count() == 0
    assert not any("schema drift" in str(x.message) for x in w)
