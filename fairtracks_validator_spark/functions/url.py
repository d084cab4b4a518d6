"""URL canonicalization + registered-domain extraction — pure Columns.

The Common-Crawl-centric ops a web-scale pipeline runs before URL-keyed
dedup/partitioning: lowercase scheme+host, strip default ports and
fragments, drop tracking params, sort the query string, normalize the empty
path — so that cosmetic URL variants collapse to one canonical key. All
expressions are regex/array built-ins (whole-stage codegen, no UDFs) and
deliberately RE2-compatible so the DuckDB oracle replicates them verbatim.

``registered_domain`` approximates the public-suffix list with a folded set
of the common two-level suffixes (``co.uk``-style); a production deployment
would fold the full vendored PSL the same way (it is ~9k entries — well
inside the CURIE-registry folding pattern this repo already uses).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?]*)"
# host = authority after the last '@' (userinfo stripped — code-review r3:
# 'alice@example.com' is not a host, and registered_domain of it is garbage)
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/?@]*@)?([^/?@]*)"
_TRACKING_RE = r"^(utm_|gclid(=|$)|fbclid(=|$))"

# common 2-level public suffixes (PSL subset; see module docstring)
TWO_LEVEL_SUFFIXES = [
    "ac.uk", "co.in", "co.jp", "co.kr", "co.uk", "co.za", "com.ar",
    "com.au", "com.br", "com.cn", "com.mx", "com.tr", "gov.uk", "net.au",
    "org.au", "org.uk",
]


def canonical_url(u: Column) -> Column:
    """Canonical form of an absolute http(s)/ftp URL; non-URL values pass
    through trimmed (opaque identifiers validate elsewhere).

    Steps: drop fragment → lowercase scheme+host → strip the scheme's
    default port (``:80`` http, ``:443`` https) → path ``''`` → ``/`` →
    query params split, tracking params (``utm_*``/``gclid``/``fbclid``)
    dropped, remainder SORTED and rejoined.
    """
    u = F.trim(u)
    # fragment-strip applies to the URL branch ONLY — the pass-through
    # fallback must return non-URL values untouched ('gene#exon1' is an
    # opaque identifier, not a URL with a fragment; code-review r4)
    nofrag = F.regexp_replace(u, "#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, _SCHEME_RE, 1))
    # _HOST_RE skips any userinfo: credentials are neither part of the
    # canonical identity nor case-insensitive (code-review r3)
    host = F.lower(F.regexp_extract(nofrag, _HOST_RE, 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    rest = F.regexp_replace(nofrag, _AUTH_RE, "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    q2 = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(q2 == "", F.lit("")).otherwise(F.concat(F.lit("?"), q2)),
    )
    return F.when(scheme != "", canon).otherwise(u)


def registered_domain(host: Column) -> Column:
    """eTLD+1 of a (possibly ``host:port``) authority string, lowercased.
    Hosts on a known two-level suffix keep three labels (``bbc.co.uk``);
    everything else keeps two; bare single-label hosts pass through."""
    h = F.lower(F.regexp_replace(host, ":[0-9]+$", ""))
    # trailing-dot FQDNs ('example.com.') are legal in crawled URLs; the
    # empty last label would otherwise make every such host collapse to a
    # per-TLD pseudo-domain like 'com.' (code-review r4)
    h = F.regexp_replace(h, r"\.$", "")
    parts = F.split(h, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(
        ".", F.try_element_at(parts, F.lit(-2)), F.try_element_at(parts, F.lit(-1))
    )
    dom3 = F.concat_ws(
        ".",
        F.try_element_at(parts, F.lit(-3)),
        F.try_element_at(parts, F.lit(-2)),
        F.try_element_at(parts, F.lit(-1)),
    )
    use3 = F.lit(TWO_LEVEL_SUFFIXES)
    return (
        F.when((n >= 3) & F.array_contains(use3, last2), dom3)
        .when(n >= 2, last2)
        .otherwise(h)
    )


def url_host(u: Column) -> Column:
    """The (lowercased, port-stripped) host of an absolute URL, '' if none.

    Trims and strips the fragment FIRST: ``https://host#frag`` has no path,
    so ``_HOST_RE``'s ``[^/?@]*`` would otherwise swallow ``#frag`` into the
    host — a blocklist bypass (code-review r5)."""
    u2 = F.regexp_replace(F.trim(u), "#.*$", "")
    return F.lower(F.regexp_replace(F.regexp_extract(u2, _HOST_RE, 1),
                                    ":[0-9]+$", ""))
