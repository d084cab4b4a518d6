"""Deterministic html → text extraction (input_hint per-row invariant).

The north rule requires byte-identical extracted text per url versus the
oracle. The extractor is therefore a single canonical, version-pinned
transformation with NO environment dependence: strip tags, collapse
whitespace, trim. Implemented as an Arrow-batched pandas UDF (never a
row-at-a-time Python UDF): pandas ``.str`` ops are vectorized over the whole
Arrow batch.

EXTRACTOR_VERSION is part of the contract — bump it and all goldens together.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf

EXTRACTOR_VERSION = "1.1.0"

_TAG_RE = r"<[^>]*>"
_WS_RE = r"\s+"


def extract_text_pd(html: pd.Series) -> pd.Series:
    """Pure pandas kernel (unit-testable without Spark).

    Order matters: strip real tags FIRST, then unescape entities — so
    escaped literal markup in the source text (``&lt;b&gt;``) survives as
    text instead of being stripped as a tag (browser semantics). 1.1.0
    added the entity unescape: producers embedding text into HTML must
    escape ``& < >`` and the round trip is then byte-exact."""
    import html as _html

    s = html.map(lambda b: b.decode("utf-8", errors="replace") if b is not None else None)
    s = s.str.replace(_TAG_RE, " ", regex=True)
    # html.unescape short-circuits on '&'-free strings; NaN/None pass through
    s = s.map(lambda t: _html.unescape(t) if isinstance(t, str) else t)
    s = s.str.replace(_WS_RE, " ", regex=True)
    return s.str.strip()


# pandas_udf needs an active SparkSession at creation — build lazily, and
# re-build when the session changes: a forever-cached UDF keeps a handle to
# a stopped SparkContext after session restart (code-review r3)
_extract_udf = None
_extract_udf_ctx = None


def extract_text(html_col):
    """Column expression: extract_text(html) — Arrow-batched pandas UDF.

    The cache holds the SparkSession OBJECT and hits on identity: an
    ``id()`` key could alias a new session once the old one is collected
    (CPython reuses addresses) and serve a UDF bound to a stopped context
    (code-review r4)."""
    global _extract_udf, _extract_udf_ctx
    from pyspark.sql import SparkSession

    ctx = SparkSession.active()
    if _extract_udf is None or _extract_udf_ctx is not ctx:
        _extract_udf = pandas_udf(extract_text_pd, "string")
        _extract_udf_ctx = ctx
    return _extract_udf(html_col)
