"""Deduplication suite for web-scale training data.

Five detectors, all deterministic and shuffle-conscious:

- :func:`exact_duplicates` — md5(content) hash-groupBy. One shuffle on the
  16-byte digest, never on the content itself.
- :func:`minhash_signature` / :func:`minhash_lsh_candidates` — bottom-hash
  MinHash (k independent hash slots via md5(i|shingle); lexicographic min of
  hex digests) banded into LSH buckets; candidate pairs share ≥1 band. The
  signature is computed row-local with higher-order functions (no explode of
  the shingle set across the cluster); only (band_key → id) rows shuffle.
- :func:`simhash` / :func:`simhash_candidates` — 60-bit SimHash over token
  hashes, chunk-blocked (4×15-bit bands ⇒ catches any pair within Hamming
  distance 3 in expectation); verification = exact Hamming via xor+popcount.
- :func:`ngram_jaccard_pairs` — exact word-n-gram Jaccard for candidate
  verification (shared-shingle inverted index join; prune hopeless pairs by
  size ratio before counting).
- :func:`embedding_neardup_pairs` — cosine ≥ τ pairs over an embedding
  column; brute within id-blocks at test scale, sign-LSH blocking at scale.

All hashes are md5-hex (same bytes in DuckDB), so every detector has an
exact SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles


# --------------------------------------------------------------------- exact
def exact_duplicates(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """(dup_id, canonical_id, content_hash): every row whose content equals an
    earlier (lower-id) row. One digest shuffle; content never moves."""
    hashed = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.md5(F.col(content_col)).alias("content_hash"),
    ).where(F.col("content_hash").isNotNull())
    groups = hashed.groupBy("content_hash").agg(
        F.min("id").alias("canonical_id"), F.count(F.lit(1)).alias("n")
    )
    return (
        hashed.join(F.broadcast(groups.where(F.col("n") > 1)), "content_hash")
        .where(F.col("id") != F.col("canonical_id"))
        .select(F.col("id").alias("dup_id"), "canonical_id", "content_hash")
    )


# ------------------------------------------------------------------- minhash
def minhash_signature(content_col, num_hashes: int = 8, shingle_n: int = 3):
    """array<string> MinHash signature: slot i = min(md5(i || '|' || s)).

    Bottom-hash MinHash: md5 restricted to slot-salted inputs is an
    independent uniform hash per slot; the lexicographic min of hex digests
    is the min-hash. Row-local (higher-order functions only).
    """
    sh = shingles(content_col, shingle_n)

    def slot(i):
        return F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(i.cast("string"), F.lit("|"), s)))
        )

    return F.transform(F.sequence(F.lit(0), F.lit(num_hashes - 1)), slot)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    content_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b, band-collision count).

    rows-per-band = num_hashes/bands; pair probability ≈ 1-(1-j^r)^b for
    Jaccard j. Only (band_key, id) rows shuffle — the signature itself never
    leaves its partition.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signature(content_col, num_hashes, shingle_n)
    banded = df.select(
        F.col(id_col).cast("long").alias("id"), sig.alias("sig")
    ).where(F.size("sig") > 0).select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(
                        F.concat_ws(
                            "|", F.slice("sig", b * rows_per_band + 1, rows_per_band)
                        )
                    ).alias("band_key"),
                ),
            )
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))

    pairs = (
        banded.alias("l")
        .join(banded.alias("r"), ["band", "band_key"])
        .where(F.col("l.id") < F.col("r.id"))
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared_bands"))
    )
    return pairs


# ------------------------------------------------------------------- simhash
_SIMHASH_BITS = 60  # 15 hex chars of md5 → fits a signed 64-bit integer


def simhash(content_col) -> object:
    """60-bit SimHash over whitespace tokens (duplicate tokens weighted).

    token_hash = first 15 hex chars of md5(token) as bigint; bit i of the
    output = 1 iff sum over tokens of ±1 (by bit i of token_hash) > 0.
    Pure higher-order functions; one pass over the token array.
    """
    from ..functions.text import tokens

    th = F.transform(
        tokens(content_col),
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
    )

    # bit positions are compile-time constants — unroll in Python so the
    # shift amounts are literals (F.shiftright requires an int), keeping a
    # SINGLE pass over the token array with a 60-wide zip_with accumulator.
    def bits(h):
        return F.array(
            *[
                (F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1).cast("long")
                for i in range(_SIMHASH_BITS)
            ]
        )

    zeros = F.array(*[F.lit(0).cast("long")] * _SIMHASH_BITS)
    votes = F.aggregate(th, zeros, lambda acc, h: F.zip_with(acc, bits(h), lambda a, b: a + b))
    return F.aggregate(
        F.reverse(votes),
        F.lit(0).cast("long"),
        lambda acc, v: acc * 2 + F.when(v > 0, 1).otherwise(0),
    )


def hamming64(a, b):
    return F.bit_count(a.bitwiseXOR(b))


def simhash_candidates(
    df: DataFrame,
    id_col: str,
    content_col: str,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash: block on 15-bit chunks (a pair within
    Hamming distance < bands shares ≥1 unchanged chunk), verify exact
    Hamming ≤ max_hamming."""
    bits_per_band = _SIMHASH_BITS // bands
    sigs = df.select(
        F.col(id_col).cast("long").alias("id"), simhash(content_col).alias("sh")
    )
    blocked = sigs.select(
        "id", "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sh"), b * bits_per_band)
                        .bitwiseAND(F.lit((1 << bits_per_band) - 1))
                        .alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sh", F.col("bk.band").alias("band"), F.col("bk.chunk").alias("chunk"))
    return (
        blocked.alias("l")
        .join(blocked.alias("r"), ["band", "chunk"])
        .where(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
            hamming64(F.col("l.sh"), F.col("r.sh")).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ------------------------------------------------------------- exact jaccard
def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    content_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word-n-gram Jaccard ≥ threshold pairs via inverted-index join.

    |A∩B| from the shared-shingle join; |A∪B| = |A|+|B|-|A∩B|. Size-ratio
    prune: J ≥ t ⇒ |A|/|B| ∈ [t, 1/t], applied before the expensive count.
    At web scale, run AFTER minhash_lsh_candidates as the verifier.
    """
    sh = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.explode(shingles(content_col, n)).alias("shingle"),
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        sh.alias("l").join(sh.alias("r"), "shingle")
        .where(F.col("l.id") < F.col("r.id"))
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(F.broadcast(sizes.withColumnRenamed("id", "id_a")
                   .withColumnRenamed("sz", "sz_a")), "id_a")
        .join(F.broadcast(sizes.withColumnRenamed("id", "id_b")
              .withColumnRenamed("sz", "sz_b")), "id_b")
        .where(F.col("sz_a") * threshold <= F.col("sz_b"))
        .where(F.col("sz_b") * threshold <= F.col("sz_a"))
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ------------------------------------------------------- embedding near-dup
def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    block_planes: int = 0,
) -> DataFrame:
    """Cosine-similarity ≥ threshold pairs over array<float> embeddings.

    block_planes=0: all-pairs (test scale / within a partition block).
    block_planes=P: sign-LSH blocking — pairs must share the P-bit
    hyperplane-sign key (deterministic planes from md5(plane,dim)); recall
    <1 by design, the standard scale path.
    """
    v = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    norm = F.sqrt(F.aggregate("vec", F.lit(0.0), lambda a, x: a + x * x))
    v = v.withColumn("norm", norm).where(F.col("norm") > 0)

    if block_planes > 0:
        key = _sign_lsh_key(F.col("vec"), block_planes)
        v = v.withColumn("block", key)
        join_on = ["block"]
        l, r = v.alias("l"), v.alias("r")
        joined = l.join(r, join_on)
    else:
        l, r = v.alias("l"), v.alias("r")
        joined = l.crossJoin(r)

    dot = F.aggregate(
        F.zip_with(F.col("l.vec"), F.col("r.vec"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        joined.where(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
            F.round(dot / (F.col("l.norm") * F.col("r.norm")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def _sign_lsh_key(vec, planes: int):
    """P-bit sign key under deterministic pseudo-random hyperplanes:
    plane p component d = ±1 by parity of xxhash64(p, d)."""
    def bit(p):
        s = F.aggregate(
            F.zip_with(
                vec,
                F.transform(
                    F.sequence(F.lit(0), F.size(vec) - 1),
                    lambda d: F.when(
                        F.pmod(F.xxhash64(p.cast("string"), d.cast("string")), F.lit(2)) == 0,
                        F.lit(1.0),
                    ).otherwise(F.lit(-1.0)),
                ),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        return F.when(s > 0, 1).otherwise(0)

    return F.aggregate(
        F.transform(F.sequence(F.lit(0), F.lit(planes - 1)), bit),
        F.lit(0).cast("long"),
        lambda acc, b: acc * 2 + b,
    )
