"""Draft-07 ``format`` keyword enforcement (VERDICT r2 "do this" #1).

The reference wires everit's format validators at schema load
(``J/ValidatedJSONSchema.java:318-329``); here each format is an anchored
regex Column (``operators/checks.py::FORMAT_PATTERNS``) and ``format: regex``
is an Arrow-batched pandas UDF. Unknown format values must WARN, never
silently compile to nothing.
"""

from __future__ import annotations

import warnings

import pytest

from fairtracks_validator_spark.operators import checks as C
from fairtracks_validator_spark.plans.schema_compile import compile_schema
from fairtracks_validator_spark.runner import validate_corpus

from conftest import rows_set

GOOD = {
    "date": ["2024-02-29", "1999-12-31", "0001-01-01"],
    "time": ["23:59:59Z", "00:00:00+05:30", "12:34:56.789z", "10:00:60Z"],
    "date-time": ["2024-03-01T12:34:56Z", "2024-03-01t23:00:00-08:00",
                  "2024-03-01T12:34:56.5+00:00"],
    "email": ["a@b.co", "user.name+tag@example-host.example.org",
              "o'brien@example.org"],
    "hostname": ["example.org", "a", "sub-1.Example.COM", "x" * 63 + ".org"],
    "ipv4": ["0.0.0.0", "255.255.255.255", "192.168.1.10"],
    "ipv6": ["::", "::1", "2001:db8::7", "fe80::1:2:3",
             "1:2:3:4:5:6:7:8", "2001:db8:0:0:0:0:0:1"],
    "uri-reference": ["", "/a/b?c=d", "example.org/path", "#frag"],
    "json-pointer": ["", "/a/b", "/a~0b/~1c", "/0/1"],
    "uuid": ["123e4567-e89b-12d3-a456-426614174000",
             "00000000-0000-0000-0000-000000000000"],
}
BAD = {
    "date": ["2024-13-01", "2024-00-10", "2024-01-32", "24-01-01", "2024/01/01"],
    "time": ["24:00:00Z", "12:60:00Z", "12:00:00", "12:00:00+24:00"],
    "date-time": ["2024-03-01 12:34:56Z", "2024-03-01T12:34:56",
                  "2024-13-01T12:34:56Z"],
    "email": ["plainaddress", "a@@b.co", "a@b_c.org", "a b@c.org", "a@-b.org"],
    "hostname": ["host_1.org", "-bad.org", "bad-.org", "a..b",
                 "x" * 64 + ".org", "a.b." + "c" * 250],
    "ipv4": ["256.1.1.1", "1.2.3", "1.2.3.4.5", "01a.2.3.4", "300.10.0.1"],
    "ipv6": ["2001:db8:::5", "1:2:3:4:5:6:7:8:9", "g::1", ":::"],
    "uri-reference": ["has space", "a<b"],
    "json-pointer": ["a/b", "/a~2b", "~"],
    "uuid": ["123e4567-e89b-12d3-a456-42661417400", "not-a-uuid"],
}


@pytest.mark.parametrize("fmt", sorted(GOOD))
def test_format_golden(spark, fmt):
    vals = [(i, v, True) for i, v in enumerate(GOOD[fmt])] + [
        (100 + i, v, False) for i, v in enumerate(BAD[fmt])
    ]
    df = spark.createDataFrame(vals, "id long, v string, expect_ok boolean")
    chk = C.format_pattern_check("v", fmt)
    got = rows_set(df.select("id", chk.ok.alias("ok")))
    want = {(i, ok) for i, v, ok in vals}
    assert got == want, f"{fmt}: {got ^ want}"


def test_format_null_passes(spark):
    df = spark.createDataFrame([(1, None)], "id long, v string")
    for fmt in FORMATS_ALL:
        chk = C.format_pattern_check("v", fmt)
        assert df.select(chk.ok).first()[0] is True, fmt


FORMATS_ALL = sorted(C.FORMAT_PATTERNS)


def test_format_regex_pandas_udf(spark):
    df = spark.createDataFrame(
        [(1, "^a+[bc]{2}$"), (2, "(unclosed"), (3, "a)b"), (4, None)],
        "id long, v string",
    )
    chk = C.format_regex_check("v")
    got = rows_set(df.select("id", chk.ok.alias("ok")))
    assert got == {(1, True), (2, False), (3, False), (4, True)}


def test_format_regex_fanout_warns():
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        plan = compile_schema(
            {"$id": "s/1", "properties": {
                "a": {"items": {"properties": {"b": {"format": "regex"}}}}}}
        )
    assert any("format: regex" in str(x.message) for x in w)
    assert not any(c.check_id.startswith("format:regex") for c in plan.checks)


def test_unknown_format_warns_not_silent():
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        plan = compile_schema(
            {"$id": "s/1", "properties": {"a": {"format": "no-such-format"}}}
        )
    assert any("unknown format 'no-such-format'" in str(x.message) for x in w)
    assert plan.checks == []


def test_known_format_does_not_warn():
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        plan = compile_schema(
            {"$id": "s/1", "properties": {"a": {"format": "date-time"}}}
        )
    assert not any("format" in str(x.message) for x in w)
    assert [c.check_id for c in plan.checks] == ["format:date-time:a"]


def test_formats_end_to_end(spark):
    """Compile → validate_corpus round trip over a mixed-validity frame."""
    df = spark.createDataFrame(
        [
            ("r1", 1, "2024-01-01", "a@b.co"),
            ("r2", 2, "2024-13-01", "a@b.co"),
            ("r3", 3, "2024-01-01", "bad@@x.co"),
            ("r4", 4, None, None),
        ],
        "source string, ord long, d string, e string",
    )
    plan = compile_schema(
        {"$id": "fmt/1", "properties": {
            "d": {"format": "date"}, "e": {"format": "email"}}}
    )
    res = validate_corpus({"fmt/1": (plan, df)})
    got = rows_set(res.violations.select("source", "check_id"))
    assert got == {("r2", "format:date:d"), ("r3", "format:email:e")}
