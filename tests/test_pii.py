"""PII detection/redaction unit coverage."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from fairtracks_validator_spark.functions.pii import pii_counts, redact_pii


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "mail a.b+c@sub.example.co.uk now"),
            (2, "host 10.0.0.1 and 192.168.255.3."),
            (3, "call +4915123456789 today"),
            (4, "clean text without identifiers"),
            (5, None),
            (6, "x@y.io at 1.2.3.4 or +12345678"),
        ],
        "id long, text string",
    )


def test_counts(docs):
    rows = {
        r["id"]: r["c"]
        for r in docs.select("id", pii_counts("text").alias("c")).collect()
    }
    assert (rows[1]["n_email"], rows[1]["n_ipv4"], rows[1]["n_phone"]) == (1, 0, 0)
    assert rows[2]["n_ipv4"] == 2
    assert rows[3]["n_phone"] == 1
    assert all(v == 0 for v in rows[4].asDict().values())
    assert all(v == 0 for v in rows[5].asDict().values())
    assert (rows[6]["n_email"], rows[6]["n_ipv4"], rows[6]["n_phone"]) == (1, 1, 1)


def test_redaction_masks_every_match(docs):
    red = {
        r["id"]: r["t"]
        for r in docs.select("id", redact_pii("text").alias("t")).collect()
    }
    assert red[1] == "mail <PII> now"
    assert red[2] == "host <PII> and <PII>."
    assert red[3] == "call <PII> today"
    assert red[4] == "clean text without identifiers"
    assert red[5] == ""  # null-safe
    assert red[6] == "<PII> at <PII> or <PII>"


def test_custom_token(docs):
    out = docs.where(F.col("id") == 3).select(
        redact_pii("text", token="[MASK]").alias("t")
    ).collect()[0]["t"]
    assert out == "call [MASK] today"


def test_redact_token_with_dollar_and_backslash(spark):
    """code-review r4: replacement metacharacters in the token must be
    escaped (Matcher.quoteReplacement semantics), not crash or corrupt."""
    from fairtracks_validator_spark.functions.pii import redact_pii

    df = spark.createDataFrame([("mail a@b.com now",)], "t string")
    for token in ("[$REDACTED]", "x\\y$1"):
        got = df.select(redact_pii("t", token=token).alias("r")).collect()[0]["r"]
        assert got == f"mail {token} now"


def test_pii_counts_match_redaction_passes(spark):
    """code-review r4: a span matched by two patterns counts once — for the
    pattern whose redaction pass actually consumes it."""
    from fairtracks_validator_spark.functions.pii import pii_counts, redact_pii

    # the email pass consumes '+12345678@example.com' entirely, so the
    # phone pass sees nothing: n_phone must be 0, matching the output
    df = spark.createDataFrame([("call +12345678@example.com ok",)], "t string")
    row = df.select(pii_counts("t").alias("c"),
                    redact_pii("t").alias("r")).collect()[0]
    assert row["c"]["n_email"] == 1 and row["c"]["n_phone"] == 0
    assert row["r"] == "call <PII> ok"
