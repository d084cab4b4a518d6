"""F5/F6 golden scenarios — FK anti-join, empty-PK, missing-schema,
foreignProperty; plus full two-pass lifecycle via validate_corpus."""

from __future__ import annotations

from fairtracks_validator_spark.operators.fk import fk_check
from fairtracks_validator_spark.operators.uniqueness import uniqueness_check
from fairtracks_validator_spark.plans.schema_compile import compile_schema
from fairtracks_validator_spark.runner import validate_corpus

from conftest import rows_set

PK_SCHEMA_ID = "compound_pk_example/1.0"
FK_SCHEMA_ID = "foreign_key_example/1.0"

PK_SCHEMA = {
    "$id": PK_SCHEMA_ID,
    "type": "object",
    "properties": {"local_id": {"type": "string"}, "other_id": {"type": "string"}},
    "primary_key": ["local_id", "other_id"],
}
FK_SCHEMA = {
    "$id": FK_SCHEMA_ID,
    "type": "object",
    "properties": {"ref_local_id": {"type": "string"}, "ref_other_id": {"type": "string"}},
    "foreign_keys": [
        {"schema_id": PK_SCHEMA_ID, "members": ["ref_local_id", "ref_other_id"]}
    ],
}

DOCS_SCHEMA = "source STRING, ord INT, local_id STRING, other_id STRING"
REFS_SCHEMA = "source STRING, ord INT, ref_local_id STRING, ref_other_id STRING"

PK_BAD_ROWS = [
    ("uno", 1, "uno", "cincuenta"),
    ("dos", 2, "dos", "veinte"),
    ("dosdos", 3, "dosdos", "veinte"),
    ("tres", 4, "tres", "treinta"),
    ("trestres", 5, "tres", "treinta"),
    ("cinco", 6, "uno", "diez"),
]
FK_BAD_ROWS = [
    ("ref_uno", 1, "uno", "cincuenta"),
    ("ref_dos_bad_2", 2, "2", "veinte"),
    ("ref_dos_bad_20", 3, "dos", "20"),
    ("ref_tres", 4, "tres", "treinta"),
    ("ref_siete", 5, "siete", "setenta"),
]


def test_f5_fk_anti_join(spark):
    pk_docs = spark.createDataFrame(PK_BAD_ROWS, DOCS_SCHEMA)
    refs = spark.createDataFrame(FK_BAD_ROWS, REFS_SCHEMA)
    ures = uniqueness_check(pk_docs, "pk", ["local_id", "other_id"], PK_SCHEMA_ID)
    viol = fk_check(
        refs, "fk0", ["ref_local_id", "ref_other_id"], FK_SCHEMA_ID,
        PK_SCHEMA_ID, ures.pk, pk_known_empty=False,
    )
    assert rows_set(viol, ["source", "key_str"]) == {
        ("ref_dos_bad_2", '["2","veinte"]'),
        ("ref_dos_bad_20", '["dos","20"]'),
        ("ref_siete", '["siete","setenta"]'),
    }
    # ["tres","treinta"] STILL matches: first-writer-wins kept it in the registry
    d = viol.where("source = 'ref_siete'").collect()[0]["description"]
    assert d == f'Unmatching FK (["siete","setenta"]) in ref_siete to schema {PK_SCHEMA_ID}'


def test_f5_empty_pk_set(spark):
    refs = spark.createDataFrame(FK_BAD_ROWS[:2], REFS_SCHEMA)
    empty_pk = spark.createDataFrame(
        [], "schema_id string, check_id string, key_str string, first_source string"
    )
    viol = fk_check(
        refs, "fk0", ["ref_local_id", "ref_other_id"], FK_SCHEMA_ID,
        PK_SCHEMA_ID, empty_pk, pk_known_empty=True,
    )
    got = rows_set(viol, ["source", "reason", "description"])
    assert got == {
        ("ref_uno", "fk_no_docs",
         f"No available documents from {PK_SCHEMA_ID} schema, required by ref_uno"),
        ("ref_dos_bad_2", "fk_no_docs",
         f"No available documents from {PK_SCHEMA_ID} schema, required by ref_dos_bad_2"),
    }


def test_f5_missing_schema(spark):
    refs = spark.createDataFrame(FK_BAD_ROWS[:1], REFS_SCHEMA)
    viol = fk_check(
        refs, "fk0", ["ref_local_id", "ref_other_id"], FK_SCHEMA_ID,
        "nope/9.9", None,
    )
    assert rows_set(viol, ["source", "reason", "description"]) == {
        ("ref_uno", "fk_no_schema", "No available schema nope/9.9 , required by ref_uno"),
    }


def test_f5_absent_fk_component_skips(spark):
    refs = spark.createDataFrame([("r1", 1, None, "x")], REFS_SCHEMA)
    pk = spark.createDataFrame(
        [("s", "pk", '["a","b"]', "src")],
        "schema_id string, check_id string, key_str string, first_source string",
    )
    viol = fk_check(refs, "fk0", ["ref_local_id", "ref_other_id"], FK_SCHEMA_ID,
                    PK_SCHEMA_ID, pk, pk_known_empty=False)
    assert viol.count() == 0  # empty member ⇒ no key ⇒ no check


def test_f5_full_lifecycle(spark):
    """End-to-end two-pass run: pass-1 dup violation + pass-2 FK misses."""
    corpus = {
        PK_SCHEMA_ID: (compile_schema(PK_SCHEMA), spark.createDataFrame(PK_BAD_ROWS, DOCS_SCHEMA)),
        FK_SCHEMA_ID: (compile_schema(FK_SCHEMA), spark.createDataFrame(FK_BAD_ROWS, REFS_SCHEMA)),
    }
    res = validate_corpus(corpus)
    viols = rows_set(res.violations, ["source", "reason", "key_str"])
    assert viols == {
        ("trestres", "dup_pk", '["tres","treinta"]'),
        ("ref_dos_bad_2", "fk_missing", '["2","veinte"]'),
        ("ref_dos_bad_20", "fk_missing", '["dos","20"]'),
        ("ref_siete", "fk_missing", '["siete","setenta"]'),
    }
    verdicts = {r["source"]: r["validated"] for r in res.verdicts.collect()}
    assert verdicts == {
        "uno": True, "dos": True, "dosdos": True, "tres": True,
        "trestres": False, "cinco": True,
        "ref_uno": True, "ref_dos_bad_2": False, "ref_dos_bad_20": False,
        "ref_tres": True, "ref_siete": False,
    }


def test_f6_foreign_property(spark):
    """foreignProperty: 'unique_example/1.0#local_id' (FIXTURES F6)."""
    target_schema = {
        "$id": "unique_example/1.0",
        "properties": {"local_id": {"type": "string", "unique": True}},
    }
    ref_schema = {
        "$id": "fp_example/1.0",
        "properties": {
            "ref_local_id": {
                "type": "string",
                "foreignProperty": "unique_example/1.0#local_id",
            }
        },
    }
    f1_bad = [("uno", 1, "uno"), ("dos", 2, "dos"), ("tres", 3, "tres"),
              ("cuatro", 4, "uno"), ("cinco", 5, "dos")]
    refs = [("ref_uno", 1, None), ("ref_tres", 2, "tres"), ("ref_diez", 3, "diez")]
    corpus = {
        "unique_example/1.0": (
            compile_schema(target_schema),
            spark.createDataFrame(f1_bad, "source STRING, ord INT, local_id STRING"),
        ),
        "fp_example/1.0": (
            compile_schema(ref_schema),
            spark.createDataFrame(refs, "source STRING, ord INT, ref_local_id STRING"),
        ),
    }
    res = validate_corpus(corpus)
    got = rows_set(res.violations, ["source", "reason", "key_str"])
    assert got == {
        ("cuatro", "dup_pk", '["uno"]'),
        ("cinco", "dup_pk", '["dos"]'),
        ("ref_diez", "fk_missing", '["diez"]'),
    }
