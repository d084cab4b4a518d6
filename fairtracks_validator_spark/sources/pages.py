"""Synthetic Common-Crawl-style ``pages`` table (FIXTURES.md F8).

``pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)``
per ``BASELINE.json.input_hint``. Generated INSIDE Spark from ``spark.range``
— fully distributed and deterministic (xxhash64-seeded, no RNG state), so the
same (n_rows, seed) produces identical bytes at any parallelism. That is what
lets the scaling-efficiency benchmark run the *same* input at local[8] and
local[32].

Planted anomalies (rates are deterministic hash buckets, so expected counts
are exact):
- ``dup_rate`` of rows reuse an earlier row's url → uniqueness violations;
- ``null_text_rate`` of rows have NULL text (html kept) → null-rate checks;
- ``bad_lang_rate`` of rows carry an out-of-enum lang code;
- ``lang`` is Zipfian (en-dominant) → skewed-aggregation exercises;
- per-lang text length distributions differ → KS / chi-square fixtures.

The invariant ``extract_text(html) == text`` holds byte-for-byte for every
non-null text row (tested by golden hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["en", "de", "es", "fr", "it", "pt", "nl", "pl"]
# cumulative permille cut-points — Zipfian-ish, en-dominant
_LANG_CUM = [550, 730, 830, 900, 940, 970, 990, 1000]
_BAD_LANG = "xx"

_WORDS = [
    "data", "web", "page", "crawl", "text", "spark", "scale", "index", "token",
    "link", "site", "batch", "query", "table", "shard", "merge", "fetch",
    "parse", "store", "cache", "frame", "graph", "model", "train", "valid",
]


def pages(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    dup_rate: float = 0.01,
    null_text_rate: float = 0.02,
    bad_lang_rate: float = 0.005,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic distributed generator — O(n) work, no driver data."""
    df = spark.range(
        0, n_rows, 1,
        partitions if partitions is not None
        else spark.sparkContext.defaultParallelism,
    )
    h = F.xxhash64(F.col("id"), F.lit(seed))
    hmod = F.pmod(h, F.lit(1000))

    # duplicates: a hash bucket of rows copies the url of id-1 (never id 0).
    # A row whose SOURCE is itself in the dup bucket is excluded — it would
    # copy the source's BASE url, which nobody displays, so ~dup_rate of
    # planted duplicates collided with nothing and "expected counts are
    # exact" (the module contract) was off by the chained-dup fraction
    # (code-review r3: 10,192 planted vs 9,668 real collisions at n=200k).
    thr = int(dup_rate * 1000)
    prev_h = F.pmod(F.xxhash64(F.col("id") - 1, F.lit(seed)), F.lit(1000))
    prev_is_dup = (prev_h < thr) & (F.col("id") - 1 > 0)
    is_dup = (hmod < thr) & (F.col("id") > 0) & ~prev_is_dup
    src_id = F.when(is_dup, F.col("id") - 1).otherwise(F.col("id"))

    # lang from an independent hash; a small bucket gets an invalid code
    h_lang = F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 1)), F.lit(1000))
    lang = F.lit(_BAD_LANG)
    for code, cut in zip(reversed(LANGS), reversed(_LANG_CUM)):
        lang = F.when(h_lang < cut, F.lit(code)).otherwise(lang)
    is_bad_lang = F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 2)), F.lit(1000)) < int(
        bad_lang_rate * 1000
    )
    lang = F.when(is_bad_lang, F.lit(_BAD_LANG)).otherwise(lang)

    # per-lang word-count regime: en pages longer (shifts length distributions)
    lang_rank = F.array_position(F.array(*[F.lit(c) for c in LANGS + [_BAD_LANG]]), lang)
    n_words = (
        F.lit(20)
        + F.pmod(F.xxhash64(src_id, F.lit(seed + 3)), F.lit(30))
        + F.when(lang == "en", F.lit(15)).otherwise(F.lit(0))
        + lang_rank  # small deterministic per-lang shift
    ).cast("int")

    words_arr = F.array(*[F.lit(w) for w in _WORDS])
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda i: F.element_at(
                words_arr,
                (F.pmod(F.xxhash64(src_id * F.lit(131) + i.cast("long"), F.lit(seed + 4)),
                        F.lit(len(_WORDS))) + 1).cast("int"),
            ),
        ),
    )

    # escape & < > when embedding (extract_text 1.1.0 unescapes on the way
    # out) — the round trip stays byte-exact for ANY word list, not just
    # entity-free ones; '&' must escape first
    esc_text = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(text, "&", "&amp;"), "<", "&lt;"),
        ">",
        "&gt;",
    )
    html = F.concat(
        F.lit('<html><head><meta charset="utf-8" data-p="'), src_id.cast("string"),
        F.lit('"/></head><body><p>'), esc_text, F.lit("</p></body></html>"),
    ).cast("binary")

    null_text = F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 5)), F.lit(1000)) < int(
        null_text_rate * 1000
    )

    url = F.concat(
        F.lit("https://site"), F.pmod(src_id, F.lit(97)).cast("string"),
        F.lit(".example/"), F.md5(F.concat(src_id.cast("string"), F.lit(f"#{seed}"))),
    )
    warc_ts = F.timestamp_seconds(F.lit(1700000000) + F.col("id"))

    return df.select(
        F.col("id").alias("page_id"),
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        F.when(null_text, F.lit(None).cast("string")).otherwise(text).alias("text"),
        lang.alias("lang"),
    )


def pages_schema_dict() -> dict:
    """The validation schema applied to ``pages`` (FIXTURES F8 constraints)."""
    return {
        "$id": "pages/1.0",
        "type": "object",
        "required": ["url", "warc_ts"],
        "primary_key": ["url"],
        "properties": {
            "url": {"type": "string", "pattern": "^https?://"},
            "lang": {"enum": LANGS},
            "text": {"type": "string", "minLength": 1},
        },
    }
