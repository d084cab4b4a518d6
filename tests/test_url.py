"""URL canonicalization + registered-domain golden tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from fairtracks_validator_spark.functions.url import (
    canonical_url,
    registered_domain,
    url_host,
)

from conftest import rows_set

CANON_CASES = [
    # mixed case + default port + tracking params + fragment + unsorted query
    ("HTTP://WWW.Example.COM:80/Path?b=2&utm_source=x&a=1#frag",
     "http://www.example.com/Path?a=1&b=2"),
    # https default port stripped, empty path normalized
    ("HTTPS://Host.org:443", "https://host.org/"),
    # explicit non-default port kept
    ("http://h.io:8080/x", "http://h.io:8080/x"),
    # :80 NOT default for https — kept
    ("https://h.io:80/x", "https://h.io:80/x"),
    # gclid/fbclid dropped; all-tracking query collapses to no query
    ("http://a.b/p?gclid=123&fbclid=9", "http://a.b/p"),
    # non-URL values pass through trimmed
    ("  not a url  ", "not a url"),
    # path case preserved (paths are case-sensitive per RFC)
    ("http://X.Y/CaSe", "http://x.y/CaSe"),
]

DOMAIN_CASES = [
    ("www.example.com", "example.com"),
    ("a.b.c.example.com:8080", "example.com"),
    ("news.BBC.CO.UK", "bbc.co.uk"),
    ("bbc.co.uk", "bbc.co.uk"),
    ("co.uk", "co.uk"),          # bare suffix: only two labels exist
    ("localhost", "localhost"),
    ("sub.domain.com.au", "domain.com.au"),
]


def test_canonical_url_golden(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CANON_CASES)], "id long, u string"
    )
    got = rows_set(df.select("id", canonical_url(F.col("u")).alias("c")))
    want = {(i, c) for i, (_, c) in enumerate(CANON_CASES)}
    assert got == want, got ^ want


def test_registered_domain_golden(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(DOMAIN_CASES)], "id long, h string"
    )
    got = rows_set(df.select("id", registered_domain(F.col("h")).alias("d")))
    want = {(i, d) for i, (_, d) in enumerate(DOMAIN_CASES)}
    assert got == want, got ^ want


def test_canonical_is_idempotent_and_collapses_variants(spark):
    """Variants of the same resource share one canonical key, and
    canonicalizing a canonical URL is a no-op — the property URL-keyed
    dedup depends on."""
    variants = [
        "HTTP://WWW.Shop.COM:80/item?id=5&utm_campaign=c",
        "http://www.shop.com/item?id=5#reviews",
        "http://www.shop.com/item?utm_source=a&id=5",
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(variants)],
                               "id long, u string")
    canons = {r["c"] for r in
              df.select(canonical_url(F.col("u")).alias("c")).collect()}
    assert canons == {"http://www.shop.com/item?id=5"}
    df2 = spark.createDataFrame([(0, next(iter(canons)))], "id long, u string")
    again = df2.select(canonical_url(F.col("u")).alias("c")).collect()[0]["c"]
    assert again == "http://www.shop.com/item?id=5"


def test_url_host(spark):
    df = spark.createDataFrame(
        [(1, "HTTPS://A.B.C:9090/x?q=1"), (2, "no-scheme")], "id long, u string"
    )
    got = rows_set(df.select("id", url_host(F.col("u")).alias("h")))
    assert got == {(1, "a.b.c"), (2, "")}


def test_canonical_url_non_url_hash_passthrough(spark):
    """code-review r4: non-URL values keep their '#' — 'gene#exon1' and
    'gene#exon2' must stay distinct identifiers."""
    from fairtracks_validator_spark.functions.url import canonical_url

    df = spark.createDataFrame(
        [("gene#exon1",), ("gene#exon2",), ("  obo:GO#0008150 ",),
         ("https://a.example.com/p#frag",)], "u string")
    got = [r["c"] for r in df.select(canonical_url(F.col("u")).alias("c")).collect()]
    assert got == ["gene#exon1", "gene#exon2", "obo:GO#0008150",
                   "https://a.example.com/p"]


def test_registered_domain_trailing_dot(spark):
    from fairtracks_validator_spark.functions.url import registered_domain

    df = spark.createDataFrame(
        [("example.com.",), ("www.bbc.co.uk.",), ("Example.COM:8080",)],
        "h string")
    got = [r["d"] for r in
           df.select(registered_domain(F.col("h")).alias("d")).collect()]
    assert got == ["example.com", "bbc.co.uk", "example.com"]
