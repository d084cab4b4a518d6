"""Draft-07 object-shape keywords + tuple-form items + boolean subschemas
(VERDICT r2 "do this" #3/#4, ADVICE r2 boolean-subschema finding).

everit enforces patternProperties/propertyNames/dependencies/min-max
Properties for any object (draft-07 meta-schema,
``java/src/main/resources/org/json-schema/draft-07/schema``); here they
compile against the open-object (MapType) encoding, and property
dependencies additionally against struct/flat columns.
"""

from __future__ import annotations

import warnings

from pyspark.sql import functions as F

from fairtracks_validator_spark.operators import checks as C
from fairtracks_validator_spark.plans.schema_compile import compile_schema
from fairtracks_validator_spark.runner import validate_corpus

from conftest import rows_set


def _map_df(spark, rows):
    return spark.createDataFrame(rows, "id long, m map<string,string>")


# ------------------------------------------------------------- map keywords
def test_min_max_properties(spark):
    df = _map_df(spark, [(1, {"a": "1"}), (2, {"a": "1", "b": "2", "c": "3"}),
                         (3, None)])
    lo = C.min_properties_check("m", 2)
    hi = C.max_properties_check("m", 2)
    got = rows_set(df.select("id", lo.ok.alias("lo"), hi.ok.alias("hi")))
    assert got == {(1, False, True), (2, True, False), (3, True, True)}


def test_property_names(spark):
    df = _map_df(spark, [(1, {"ok_key": "1"}), (2, {"Bad Key": "1"}), (3, None)])
    plan = compile_schema(
        {"$id": "s/1", "properties": {"m": {
            "x-encoding": "map",
            "propertyNames": {"pattern": "^[a-z_]+$"}}}}
    )
    assert [c.check_id for c in plan.checks] == ["propertyNames:m"]
    got = rows_set(df.select("id", plan.checks[0].ok.alias("ok")))
    assert got == {(1, True), (2, False), (3, True)}


def test_pattern_properties(spark):
    df = _map_df(spark, [
        (1, {"n_x": "5", "s_y": "hello"}),     # ok
        (2, {"n_x": "notanum"}),               # n_* must be integer
        (3, {"s_y": "x"}),                     # s_* minLength 2
        (4, {"other": "anything"}),            # no pattern matches → ok
    ])
    plan = compile_schema(
        {"$id": "s/1", "properties": {"m": {
            "x-encoding": "map",
            "patternProperties": {
                "^n_": {"type": "integer"},
                "^s_": {"minLength": 2},
            }}}}
    )
    ids = sorted(c.check_id for c in plan.checks)
    assert ids == ["patternProperties:m:^n_", "patternProperties:m:^s_"]
    ok_all = C.checks_pass_predicate(plan.checks)
    got = rows_set(df.select("id", ok_all.alias("ok")))
    assert got == {(1, True), (2, False), (3, False), (4, True)}


def test_map_dependencies(spark):
    df = _map_df(spark, [
        (1, {"credit_card": "1234", "billing_address": "x"}),
        (2, {"credit_card": "1234"}),
        (3, {"billing_address": "x"}),
    ])
    plan = compile_schema(
        {"$id": "s/1", "properties": {"m": {
            "x-encoding": "map",
            "dependencies": {"credit_card": ["billing_address"]}}}}
    )
    assert [c.check_id for c in plan.checks] == ["dependencies:m.credit_card"]
    got = rows_set(df.select("id", plan.checks[0].ok.alias("ok")))
    assert got == {(1, True), (2, False), (3, True)}


def test_additional_properties_with_pattern_allowance(spark):
    df = _map_df(spark, [
        (1, {"declared": "1", "x_custom": "2"}),  # x_* allowed by pattern
        (2, {"declared": "1", "rogue": "2"}),     # rogue is additional
    ])
    plan = compile_schema(
        {"$id": "s/1", "properties": {"m": {
            "x-encoding": "map",
            "additionalProperties": False,
            "properties": {"declared": {}},
            "patternProperties": {"^x_": {"minLength": 1}}}}}
    )
    ap = [c for c in plan.checks if c.check_id == "additionalProperties:m"]
    assert len(ap) == 1
    got = rows_set(df.select("id", ap[0].ok.alias("ok")))
    assert got == {(1, True), (2, False)}


def test_map_only_keywords_warn_on_struct_path():
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        plan = compile_schema(
            {"$id": "s/1", "properties": {"a": {"minProperties": 2}}}
        )
    assert any("only enforced for map-encoded" in str(x.message) for x in w)
    assert plan.checks == []


# --------------------------------------------------- struct dependencies
def test_struct_dependencies_end_to_end(spark):
    df = spark.createDataFrame(
        [("r1", 1, "cc1", "addr"), ("r2", 2, "cc2", None), ("r3", 3, None, None)],
        "source string, ord long, credit_card string, billing_address string",
    )
    plan = compile_schema(
        {"$id": "dep/1", "dependencies": {"credit_card": ["billing_address"]},
         "properties": {"credit_card": {"type": "string"}}}
    )
    res = validate_corpus({"dep/1": (plan, df)})
    got = rows_set(res.violations.select("source", "check_id"))
    assert got == {("r2", "dependencies:credit_card")}


def test_schema_form_dependencies_root(spark):
    """Schema-form dependencies (r4): presence of a property requires the
    CONTAINING object to match the dependent subschema — root level."""
    df = spark.createDataFrame(
        [("r1", 1, "x", None),        # a present, b absent -> required fails
         ("r2", 2, None, None),       # a absent -> vacuous
         ("r3", 3, "x", "okval"),     # dependent schema holds
         ("r4", 4, "x", "no")],       # b too short
        "source string, ord long, a string, b string",
    )
    plan = compile_schema({
        "$id": "dep/2",
        "properties": {"a": {"type": "string"}},
        "dependencies": {"a": {"required": ["b"],
                               "properties": {"b": {"minLength": 3}}}},
    })
    res = validate_corpus({"dep/2": (plan, df)})
    got = rows_set(res.violations.select("source", "check_id"))
    assert got == {("r1", "dependencies:a"), ("r4", "dependencies:a")}


def test_schema_form_dependencies_nested_and_boolean(spark):
    """Nested object level, plus the boolean-false form (presence of the
    trigger property is itself forbidden)."""
    df = spark.createDataFrame(
        [("r1", 1, ("cc", None)), ("r2", 2, ("cc", "addr")), ("r3", 3, (None, None))],
        "source string, ord long, o struct<credit_card:string,billing:string>",
    )
    plan = compile_schema({
        "$id": "dep/3",
        "properties": {"o": {
            "dependencies": {"credit_card": {"required": ["billing"]}},
        }},
    })
    res = validate_corpus({"dep/3": (plan, df)})
    got = rows_set(res.violations.select("source", "check_id"))
    assert got == {("r1", "dependencies:o.credit_card")}

    plan2 = compile_schema({
        "$id": "dep/4",
        "properties": {"o": {"dependencies": {"credit_card": False}}},
    })
    res2 = validate_corpus({"dep/4": (plan2, df)})
    got2 = rows_set(res2.violations.select("source", "check_id"))
    assert got2 == {("r1", "dependencies:o.credit_card"),
                    ("r2", "dependencies:o.credit_card")}


# ------------------------------------------------------- tuple-form items
def test_tuple_items(spark):
    df = spark.createDataFrame(
        [(1, ["3", "xab", "anything"]),
         (2, ["notint", "xab"]),
         (3, ["3", "nope"]),
         (4, ["3"]),            # missing positions are fine (not required)
         (5, None)],
        "id long, a array<string>",
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        plan = compile_schema(
            {"$id": "s/1", "properties": {"a": {
                "items": [{"type": "integer"}, {"pattern": "^x"}]}}}
        )
    assert not any("tuple-form" in str(x.message) for x in w)
    assert sorted(c.check_id for c in plan.checks) == ["items:a[0]", "items:a[1]"]
    ok_all = C.checks_pass_predicate(plan.checks)
    got = rows_set(df.select("id", ok_all.alias("ok")))
    assert got == {(1, True), (2, False), (3, False), (4, True), (5, True)}


def test_tuple_items_false_position(spark):
    df = spark.createDataFrame(
        [(1, ["a"]), (2, ["a", "b"])], "id long, a array<string>"
    )
    plan = compile_schema(
        {"$id": "s/1", "properties": {"a": {"items": [True, False]}}}
    )
    assert [c.check_id for c in plan.checks] == ["items:a[1]"]
    got = rows_set(df.select("id", plan.checks[0].ok.alias("ok")))
    assert got == {(1, True), (2, False)}


def test_tuple_items_fk_discovery():
    """The reference walks items[] for FK discovery
    (J/ValidatedJSONSchema.java:166-173) — positional dict subschemas must
    contribute FKSpecs at [i] paths."""
    plan = compile_schema(
        {"$id": "s/1", "properties": {"a": {
            "items": [{"foreign_keys": [
                {"schema_id": "t/1", "members": ["ref_id"]}]}]}}}
    )
    assert any(
        fk.target_schema_id == "t/1" and fk.members == ["a[0].ref_id"]
        for fk in plan.fks
    )


# -------------------------------------------------- boolean subschemas
def test_one_of_boolean_subschemas(spark):
    """oneOf: [true, {multipleOf: 2}] — even values match BOTH branches
    (violation), odd values match exactly one (pass). Dropping the boolean
    would invert both verdicts (ADVICE r2)."""
    df = spark.createDataFrame([(1, 4), (2, 3), (3, None)], "id long, v long")
    plan = compile_schema(
        {"$id": "s/1", "properties": {"v": {
            "oneOf": [True, {"multipleOf": 2}]}}}
    )
    assert [c.check_id for c in plan.checks] == ["oneOf:v"]
    got = rows_set(df.select("id", plan.checks[0].ok.alias("ok")))
    assert got == {(1, False), (2, True), (3, True)}


def test_not_true_boolean_subschema(spark):
    df = spark.createDataFrame([(1, "x"), (2, None)], "id long, v string")
    plan = compile_schema({"$id": "s/1", "properties": {"v": {"not": True}}})
    got = rows_set(df.select("id", plan.checks[0].ok.alias("ok")))
    assert got == {(1, False), (2, True)}


def test_if_boolean_then_branch(spark):
    df = spark.createDataFrame([(1, "ab"), (2, "abcdef")], "id long, v string")
    plan = compile_schema(
        {"$id": "s/1", "properties": {"v": {
            "if": True, "then": {"maxLength": 3}}}}
    )
    got = rows_set(df.select("id", plan.checks[0].ok.alias("ok")))
    assert got == {(1, True), (2, False)}


def test_jpath_numeric_index_short_array_is_absent(spark):
    """a[2] on a 1-element (or empty) array must be ABSENT, not an ANSI
    INVALID_ARRAY_INDEX crash (code-review r3): F.get semantics."""
    import pyspark.sql.functions as F

    from fairtracks_validator_spark.functions.keys import jpath_values

    df = spark.createDataFrame(
        [(1, ["x", "y", "z"]), (2, ["only"]), (3, []), (4, None)],
        "id long, a array<string>",
    )
    got = {r["id"]: r["v"] for r in df.select("id", jpath_values("a[2]").alias("v")).collect()}
    assert got == {1: ["z"], 2: [], 3: [], 4: []}


def test_jpath_nested_numeric_index_short_inner_array(spark):
    import pyspark.sql.functions as F

    from fairtracks_validator_spark.functions.keys import jpath_values

    df = spark.createDataFrame(
        [(1, [{"b": ["p", "q"]}]), (2, [{"b": []}]), (3, [{"b": None}])],
        "id long, a array<struct<b: array<string>>>",
    )
    got = {r["id"]: r["v"] for r in df.select("id", jpath_values("a[].b[1]").alias("v")).collect()}
    assert got == {1: ["q"], 2: [], 3: []}
