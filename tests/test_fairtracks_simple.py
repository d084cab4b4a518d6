"""Full parity on the real fairtracks_simple scenario: the 433-line schema
(nested fair_tracks wrapper, pattern, format uri/curie/term, matchType
variants, ancestors) against the reference's good/bad example pair, which
differ in exactly two fields (invalid ORCID curie + term IRI outside NCIT).

The ontology dimension is built as a snapshot of the terms the good corpus
uses — the vendored-dim workflow (SURVEY S6): closure precomputed offline,
no reasoner at validation time.
"""

from __future__ import annotations

import json
import warnings

import pytest

from fairtracks_validator_spark.plans.schema_compile import Dims, compile_schema
from fairtracks_validator_spark.runner import validate_corpus
from fairtracks_validator_spark.sources.catalog import (
    load_schemas,
    read_json_corpus,
    route_corpus,
    schema_id_column,
)
from fairtracks_validator_spark.sources.dims import NAMESPACES_SNAPSHOT

SCEN = "/root/reference/test-data/fairtracks_simple"


def _collect_term_specs(schema: dict, prefix: str = "") -> list[dict]:
    """(jpath, ontologies, matchType, ancestors) for every format:term prop."""
    out = []
    if isinstance(schema.get("items"), dict):
        schema = schema["items"]
        prefix = prefix + "[]" if prefix else prefix
    props = schema.get("properties")
    if not isinstance(props, dict):
        return out
    dotted = prefix + "." if prefix else ""
    for name, sub in props.items():
        if not isinstance(sub, dict):
            continue
        path = dotted + name
        if sub.get("format") == "term":
            onts = sub.get("ontology", [])
            onts = onts if isinstance(onts, list) else [onts]
            anc = sub.get("ancestors", [])
            anc = anc if isinstance(anc, list) else [anc]
            out.append({"path": path, "onts": onts,
                        "matchType": sub.get("matchType", "exact"), "anc": anc})
        out.extend(_collect_term_specs(sub, path))
    return out


def _doc_values(doc, jpath: str) -> list[str]:
    node_list = [doc]
    for step in jpath.split("."):
        fan = step.endswith("[]")
        key = step[:-2] if fan else step
        nxt = []
        for n in node_list:
            if not isinstance(n, dict) or key not in n:
                continue
            v = n[key]
            if fan and isinstance(v, list):
                nxt.extend(v)
            else:
                nxt.append(v)
        node_list = nxt
    return [str(v) for v in node_list if not isinstance(v, (dict, list))]


@pytest.fixture(scope="module")
def scenario(spark):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        schemas = load_schemas(f"{SCEN}/schemas")
    assert len(schemas) == 1
    sid, schema = next(iter(schemas.items()))

    good_doc = json.load(open(f"{SCEN}/good_validation/basic_example-works.json"))
    specs = _collect_term_specs(schema)
    term_rows, anc_rows = [], []
    for spec in specs:
        for val in _doc_values(good_doc, spec["path"]):
            for ont in spec["onts"]:
                # snapshot row covers exact (iri), label, and suffix matches
                term_rows.append((ont, val, val))
                anc_rows.append((ont, val, val))  # reflexive closure
                for a in spec["anc"]:
                    anc_rows.append((ont, val, a))
    dims = Dims(
        namespaces=NAMESPACES_SNAPSHOT,
        terms=spark.createDataFrame(term_rows, "ontology string, iri string, label string"),
        ancestors=spark.createDataFrame(anc_rows, "ontology string, iri string, ancestor_iri string"),
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        plan = compile_schema(schema, dims=dims)
    return sid, plan


def _run(spark, sid, plan, corpus_dir):
    df = read_json_corpus(spark, corpus_dir)
    df = df.withColumn("schema_id", schema_id_column(df))
    routed, orphans = route_corpus(df, {sid: plan})
    assert orphans.count() == 0
    return validate_corpus(routed)


def test_good_example_passes(spark, scenario):
    sid, plan = scenario
    res = _run(spark, sid, plan, f"{SCEN}/good_validation")
    assert [r["validated"] for r in res.verdicts.collect()] == [True]
    assert res.violations.count() == 0


def test_bad_example_fails_on_exactly_two_fields(spark, scenario):
    sid, plan = scenario
    res = _run(spark, sid, plan, f"{SCEN}/bad_validation")
    assert [r["validated"] for r in res.verdicts.collect()] == [False]
    checks = sorted(r["check_id"] for r in res.violations.collect())
    # the two planted defects: invalid ORCID curie + term outside NCIT
    assert any("curie" in c and "contact_orcid_id" in c for c in checks), checks
    assert any(c.startswith("format:term:") and "disease_url" in c for c in checks), checks
    assert len(checks) == 2, checks
