"""PII detection and redaction — pure-Column regex, zero Python.

Training-data scrubbing for web corpora: count and mask emails, IPv4
addresses, and international phone numbers. Patterns are deliberately
restricted to syntax shared by Java regex (Spark) and RE2 (DuckDB) so every
query carries an exact SQL oracle — no lookbehind, no backreferences.

No reference counterpart; north-star training-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: pattern table — ordered; redaction applies in this order
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+\d{7,15}\b",
}


def _quote_replacement(token: str) -> str:
    """Escape Java-regex replacement metacharacters (``\\`` and ``$``) —
    ``Matcher.quoteReplacement`` semantics. Without it a token like
    ``[$REDACTED]`` throws ILLEGAL group-reference at runtime
    (code-review r4)."""
    return token.replace("\\", "\\\\").replace("$", "\\$")


def pii_counts(col, token: str = "<PII>") -> Column:
    """struct(n_email, n_ipv4, n_phone) — counts AS REDACTION SEES THEM:
    each pattern is counted on the text with every earlier pattern already
    replaced by ``token``, i.e. n_X = the replacements redact_pii's pass X
    performs. Independent per-pattern counts on the original text would
    double-count spans matched by two patterns ('+123…@host.com' is both
    an email and contains a phone) and disagree with the redacted output
    (code-review r4)."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    rep = _quote_replacement(token)
    fields = []
    for name, pat in PII_PATTERNS.items():
        fields.append(F.regexp_count(c, F.lit(pat)).alias(f"n_{name}"))
        c = F.regexp_replace(c, pat, rep)
    return F.struct(*fields)


def redact_pii(col, token: str = "<PII>") -> Column:
    """Replace every PII match with ``token`` (email → ipv4 → phone order,
    matching the oracle)."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    rep = _quote_replacement(token)
    for pat in PII_PATTERNS.values():
        c = F.regexp_replace(c, pat, rep)
    return c
