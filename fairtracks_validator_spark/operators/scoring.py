"""Corpus-trained scoring — n-gram language models and linear classifiers.

The cheapest corpus-level "perplexity-ish" quality signals used by the
public web-corpus recipes (CCNet, Gopher, Llama):

- ``unigram_logprob`` — train unigram frequencies on the corpus itself
  (one groupBy over the exploded token stream — the (token) key self-salts
  skewed langs exactly like ``distinct_count_per_group``), then score each
  document as the mean log probability of its tokens.
- ``bigram_logprob`` — bigram LM with *stupid backoff* (Brants et al. 2007,
  "Large Language Models in Machine Translation" §4): the backoff scheme
  built FOR distributed map-reduce training — no discounting pass, scores
  are not normalized probabilities, which is exactly why it scales.
- ``ccnet_buckets`` — CCNet's head/middle/tail split (Wenzek et al. 2019
  §4.3): per-language perplexity terciles; downstream recipes keep head(+
  middle) and drop tail.
- ``hashed_linear_score`` — the fastText-shaped linear quality classifier
  (Joulin et al. 2016): hashed bag of word uni+bigrams × a weight vector,
  sigmoid; the classifier CCNet/Llama use for quality filtering, with the
  hashing trick making the feature space fixed-size.

The vocabulary total is read back as ONE driver scalar (a bounded action,
like the centroid counts in ``similarity.kmeans_fit``); the vocab join is
left unhinted so AQE broadcasts it when it fits and shuffle-joins a web
corpus's 10^8-term vocabulary otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

# above this many vocabulary entries the folded map literal stops being the
# scale path: GetMapValue on a map literal is a LINEAR key scan per token
# (no hash index — code-review r4), so large top-K vocabularies go through
# a broadcast hash join instead.
UNIGRAM_FOLD_MAX = 1024


def unigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    round_digits: int = 4,
    max_vocab: int | None = None,
    oov_logprob: float | None = None,
) -> DataFrame:
    """(id, logprob, n_tokens) for every doc with ≥1 token.

    ``logprob`` = mean over tokens of ln(count(token) / total_tokens),
    rounded to ``round_digits`` (float sum order varies across partitions;
    4 digits absorbs it — same contract as the windowed event sums).

    Two execution shapes:

    - ``max_vocab=None`` (exact): joins the exploded token stream against
      the full vocabulary and re-aggregates per doc — two shuffles OF THE
      TOKEN STREAM. Right for oracle parity and moderate corpora; at
      10^12 docs the token stream is ~10^15 rows and both shuffles hurt.
    - ``max_vocab=K ≤ UNIGRAM_FOLD_MAX``: the top-K vocabulary (count
      desc, token asc — deterministic) folds into a ``map_from_arrays``
      literal and each doc scores ITSELF with one ``aggregate`` over its
      token array — zero shuffle, zero Python. The cap matters: a map
      LITERAL lookup is a linear key scan per token, so folding is only
      the fast path while K is small (code-review r4).
    - ``max_vocab=K > UNIGRAM_FOLD_MAX``: top-K vocabulary broadcast
      hash-joined against the exploded token stream, re-aggregated per
      doc — one shuffle of the token stream, O(1) lookups.
      Out-of-vocabulary tokens take ``oov_logprob`` in both shapes
      (default: uniform mass ln(1/total)). Identical to exact when
      K ≥ |vocab|.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )
    # lazy localCheckpoint: the total-sum action below materializes the
    # vocabulary ONCE; the top-K collect / scoring join then read the
    # materialized counts instead of re-tokenizing and re-shuffling the
    # whole corpus per consumer (code-review r4). Storage is reclaimed by
    # the ContextCleaner when the relation goes out of scope.
    vocab = (
        toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    total = vocab.agg(F.sum("cnt").alias("t")).collect()[0]["t"] or 0
    totf = float(max(total, 1))

    if max_vocab is not None and max_vocab > UNIGRAM_FOLD_MAX:
        import math

        oov = float(oov_logprob if oov_logprob is not None else math.log(1.0 / totf))
        top = vocab.orderBy(F.desc("cnt"), F.asc("token")).limit(max_vocab)
        top = top.select(
            "token", F.round(F.log(F.col("cnt") / F.lit(totf)), 10).alias("_lp")
        )
        scored = toks.join(F.broadcast(top), "token", "left")
        return (
            scored.groupBy("id")
            .agg(
                F.round(
                    F.avg(F.coalesce(F.col("_lp"), F.lit(oov))), round_digits
                ).alias("logprob"),
                F.count(F.lit(1)).alias("n_tokens"),
            )
            .select(F.col("id").alias(id_col), "logprob", "n_tokens")
        )

    if max_vocab is not None:
        import math

        top = vocab.orderBy(F.desc("cnt"), F.asc("token")).limit(max_vocab).collect()
        keys = [r["token"] for r in top]
        vals = [round(math.log(r["cnt"] / totf), 10) for r in top]
        oov = float(oov_logprob if oov_logprob is not None else math.log(1.0 / totf))
        from ..functions.expr import let_

        lp_map = F.map_from_arrays(
            F.lit(keys).cast("array<string>"), F.lit(vals).cast("array<double>")
        )

        def score(t):
            # one tokenization, shared by the sum and the count (let_ +
            # explode barrier below — CollapseProject would otherwise
            # re-tokenize per reference, code-review r3)
            s = F.aggregate(
                F.transform(
                    t,
                    lambda x: F.coalesce(F.try_element_at(lp_map, x), F.lit(oov)),
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            return F.struct(s.alias("s"), F.size(t).alias("n"))

        r = df.select(
            F.col(id_col),
            F.explode(F.array(let_(tokens(F.col(text_col)), score))).alias("r"),
        )
        return (
            r.where(F.col("r.n") > 0)
            .select(
                F.col(id_col),
                F.round(F.col("r.s") / F.col("r.n"), round_digits).alias("logprob"),
                F.col("r.n").cast("long").alias("n_tokens"),
            )
        )

    scored = toks.join(vocab, "token")
    return (
        scored.groupBy("id")
        .agg(
            F.round(
                F.avg(F.log(F.col("cnt") / F.lit(totf))),
                round_digits,
            ).alias("logprob"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        .select(F.col("id").alias(id_col), "logprob", "n_tokens")
    )


def _position_stream(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, prev, cur) per token position; ``prev`` NULL at position 0.

    One tokenization per row (let_-bound), pairs built row-locally with an
    indexed ``transform`` — the shifted-self-join alternative would shuffle
    the token stream before training even starts."""
    from ..functions.expr import let_

    def pairs(t):
        return F.transform(
            t,
            lambda x, i: F.struct(
                # element_at is 1-based, i is 0-based: element_at(t, i) IS
                # the previous token; the WHEN guards the ANSI 0-index error.
                F.when(i > 0, F.element_at(t, i)).alias("prev"),
                x.alias("cur"),
            ),
        )

    return df.select(
        F.col(id_col).alias("id"),
        F.explode(let_(tokens(F.col(text_col)), pairs)).alias("p"),
    ).select("id", "p.prev", "p.cur")


def bigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    alpha: float = 0.4,
    round_digits: int = 4,
    max_vocab: int | None = None,
    max_bigrams: int | None = None,
    train_df: DataFrame | None = None,
) -> DataFrame:
    """Bigram LM with *stupid backoff* (Brants et al. 2007 §4) —
    (id, logprob, n_tokens) where ``logprob`` is the mean over positions of

    - position 0:                 ln(c(w)/T)            (unigram)
    - c(prev,cur) in the model:   ln(c(prev,cur)/c(prev))
    - otherwise (backoff):        ln(alpha) + ln(c(cur)/T)

    Stupid backoff is the n-gram scheme *designed for* distributed
    map-reduce training: raw relative frequencies, no discounting pass, a
    single constant ``alpha`` — scores are not normalized probabilities,
    which is exactly what makes it a one-shuffle-per-order job at web scale.

    Shapes:

    - ``max_vocab/max_bigrams=None`` (exact): model = every observed
      n-gram, scored via joins OF THE TOKEN STREAM (3 shuffle joins + the
      2 count shuffles). Oracle-parity tool; note self-trained exact mode
      never backs off (every corpus bigram is in its own model).
    - ``max_vocab=K, max_bigrams=M``: model truncated to the top-K
      unigrams / top-M bigrams (count desc, token asc — deterministic),
      both BROADCAST; scoring is then map-side and the only shuffles are
      the two training counts + the per-doc mean. This is the 10^12-doc
      shape — K and M bound executor memory regardless of corpus size.
    - ``train_df``: train on a different relation than the one scored
      (held-out LM, the CCNet shape: train on the target-domain sample,
      score the crawl).

    OOV ``cur`` takes the uniform mass ln(1/T) inside both the unigram and
    backoff branches.
    """
    import math

    pos = _position_stream(df, id_col, text_col)
    train = pos if train_df is None else _position_stream(train_df, id_col, text_col)
    # lazy localCheckpoint: the total-sum action materializes the counted
    # stream once; top-K/limit consumers then skip re-tokenizing the corpus.
    uni = (
        train.groupBy("cur").agg(F.count(F.lit(1)).alias("c_cur"))
        .localCheckpoint(eager=False)
    )
    total = uni.agg(F.sum("c_cur").alias("t")).collect()[0]["t"] or 0
    totf = float(max(total, 1))
    oov = math.log(1.0 / totf)
    big = train.where(F.col("prev").isNotNull()).groupBy("prev", "cur").agg(
        F.count(F.lit(1)).alias("c_big")
    )

    if max_vocab is not None:
        uni = uni.orderBy(F.desc("c_cur"), F.asc("cur")).limit(max_vocab)
        uni = F.broadcast(uni)
    if max_bigrams is not None:
        big = big.orderBy(
            F.desc("c_big"), F.asc("prev"), F.asc("cur")
        ).limit(max_bigrams)
        big = F.broadcast(big)

    prev_uni = uni.select(
        F.col("cur").alias("prev"), F.col("c_cur").alias("c_prev")
    )
    s = (
        pos.join(uni, "cur", "left")
        .join(prev_uni, "prev", "left")
        .join(big, ["prev", "cur"], "left")
    )
    unigram_lp = F.coalesce(F.log(F.col("c_cur") / F.lit(totf)), F.lit(oov))
    lp = (
        F.when(F.col("prev").isNull(), unigram_lp)
        .when(
            F.col("c_big").isNotNull() & F.col("c_prev").isNotNull(),
            F.log(F.col("c_big") / F.col("c_prev")),
        )
        .otherwise(F.lit(math.log(alpha)) + unigram_lp)
    )
    return (
        s.groupBy("id")
        .agg(
            F.round(F.avg(lp), round_digits).alias("logprob"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        .select(F.col("id").alias(id_col), "logprob", "n_tokens")
    )


def ccnet_buckets(
    scored: DataFrame,
    id_col: str,
    score_col: str,
    lang_col: str,
    cuts: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
) -> DataFrame:
    """CCNet head/middle/tail split (Wenzek et al. 2019 §4.3): per-language
    score terciles. ``score_col`` is a log-probability (HIGHER = lower
    perplexity = better), so ``head`` = the top tercile of ``score_col`` —
    the same ordering CCNet gets from ascending perplexity.

    Scale shape: one map-combined aggregation computes the per-language
    cutoffs (output = #languages rows, broadcast back), then bucket
    assignment is pure map-side — no per-language window sort, which at
    10^12 docs would shuffle-sort the dominant language onto one key range.
    Cutoffs are Spark's exact interpolated ``percentile`` (= DuckDB
    ``quantile_cont``), rounded to 6dp so a boundary doc buckets
    identically across engines.

    Returns (id, lang, score, bucket) with bucket ∈ head|middle|tail:
    ``head``  : score ≥ cutoff(cuts[1]); ``middle``: ≥ cutoff(cuts[0]).
    """
    lo, hi = cuts
    from ..functions.expr import null_safe_group_key

    # NULL-language docs form their own stratum; see null_safe_group_key.
    keyed = scored.withColumn("_lkey", null_safe_group_key(F.col(lang_col)))
    cutoffs = keyed.groupBy("_lkey").agg(
        F.round(F.percentile(F.col(score_col), F.lit(lo)), 6).alias("_c_lo"),
        F.round(F.percentile(F.col(score_col), F.lit(hi)), 6).alias("_c_hi"),
    )
    out = keyed.join(F.broadcast(cutoffs), "_lkey")
    bucket = (
        F.when(F.col(score_col) >= F.col("_c_hi"), F.lit("head"))
        .when(F.col(score_col) >= F.col("_c_lo"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return out.select(
        F.col(id_col),
        F.col(lang_col),
        F.col(score_col),
        bucket.alias("bucket"),
    )


# above this dimension the folded weight-array literal stops being the scale
# path (the literal is serialized into every task binary); larger models go
# through a broadcast hash join on the bucket id instead.
HASH_WEIGHTS_FOLD_MAX = 4096


def make_hash_weights(dim: int, seed: str = "w") -> list[float]:
    """Deterministic pseudo-trained weight vector in [-1, 1]: bucket b gets
    ((md5int15(seed|b) % 2001) - 1000)/1000. Stands in for a trained
    fastText/logistic model the way the IVF pretrained codebook does for a
    trained index — byte-replicable in ANSI SQL for the oracle."""
    import hashlib

    return [
        ((int(hashlib.md5(f"{seed}|{b}".encode()).hexdigest()[:15], 16) % 2001)
         - 1000) / 1000.0
        for b in range(dim)
    ]


def _md5_long(col):
    """First 60 bits of md5 as a non-negative BIGINT — engine-portable:
    Spark ``conv(substr(md5(x),1,15),16,10)`` ≡ DuckDB
    ``('0x' || substr(md5(x),1,15))::BIGINT`` (same trick as sampling)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hashed_linear_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: list[float] | DataFrame,
    dim: int | None = None,
    bias: float = 0.0,
    bigrams: bool = True,
    round_digits: int = 4,
    hash_fn: str = "md5",
) -> DataFrame:
    """fastText-shaped linear quality classifier (Joulin et al. 2016):
    features = word unigrams (+ adjacent bigrams, the fastText
    ``wordNgrams=2`` default for classification), hashed into ``dim``
    buckets with the hashing trick; score = sigmoid(mean(w[h(f)]) + bias).
    This is the quality-classifier shape in the CCNet / Llama data recipes.

    (id, score, n_features) for every doc with ≥1 token.

    Two execution shapes:

    - ``weights`` a list (``len(weights)`` = dim): the vector folds into an
      ARRAY literal and each row scores itself with one ``aggregate`` over
      its feature array — ``element_at(arr, idx)`` is an O(1) index (unlike
      a map literal's linear key scan), so this is ZERO-shuffle, zero-UDF,
      map-only at any corpus size. Capped at ``HASH_WEIGHTS_FOLD_MAX``.
    - ``weights`` a DataFrame (bucket:long, weight:double) with ``dim``
      given: features explode map-side and broadcast-hash-join the weight
      table; one shuffle (the per-doc mean) regardless of model size.

    ``hash_fn`` picks the feature hash: ``'md5'`` (default) is
    engine-portable — the DuckDB oracle rebuilds the identical buckets —
    while ``'xxhash64'`` is the JVM-native scale option (~2× docs/s
    measured at 10^6 pages: the md5 hex + base-16 conv per feature
    dominates the fold path). The two produce DIFFERENT bucketings, so a
    model's weights are bound to the hash it was trained with.
    """
    from ..functions.expr import let_

    if isinstance(weights, DataFrame):
        if dim is None:
            raise ValueError("dim is required with a weights DataFrame")
    else:
        if dim is None:
            dim = len(weights)
        if len(weights) != dim:
            raise ValueError(f"len(weights)={len(weights)} != dim={dim}")
        if dim > HASH_WEIGHTS_FOLD_MAX:
            raise ValueError(
                f"dim={dim} > fold cap {HASH_WEIGHTS_FOLD_MAX}; pass the "
                "weights as a (bucket, weight) DataFrame instead"
            )
    if dim <= 0:
        # the bucket modulo would DIVIDE_BY_ZERO mid-job under ANSI mode
        raise ValueError(f"dim must be > 0, got {dim}")

    def feats(t):
        grams = F.filter(
            F.transform(
                t,
                lambda x, i: F.when(
                    i > 0, F.concat(F.element_at(t, i), F.lit(" "), x)
                ),
            ),
            lambda g: g.isNotNull(),
        )
        return F.concat(t, grams) if bigrams else t

    if hash_fn == "md5":
        bucket_of = lambda f: _md5_long(f) % F.lit(dim)  # noqa: E731
    elif hash_fn == "xxhash64":
        bucket_of = lambda f: F.pmod(F.xxhash64(f), F.lit(dim))  # noqa: E731
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")

    if isinstance(weights, DataFrame):
        ex = df.select(
            F.col(id_col).alias("id"),
            F.explode(let_(tokens(F.col(text_col)), feats)).alias("f"),
        ).select("id", bucket_of(F.col("f")).alias("bucket"))
        joined = ex.join(F.broadcast(weights), "bucket", "left")
        z = F.avg(F.coalesce(F.col("weight"), F.lit(0.0))) + F.lit(bias)
        return (
            joined.groupBy("id")
            .agg(
                F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), round_digits)
                .alias("score"),
                F.count(F.lit(1)).alias("n_features"),
            )
            .select(F.col("id").alias(id_col), "score", "n_features")
        )

    warr = F.lit(weights).cast("array<double>")

    def score(fs):
        s = F.aggregate(
            fs,
            F.lit(0.0),
            lambda a, f: a + F.element_at(warr, (bucket_of(f) + 1).cast("int")),
        )
        return F.struct(s.alias("s"), F.size(fs).alias("n"))

    r = df.select(
        F.col(id_col),
        F.explode(
            F.array(let_(tokens(F.col(text_col)), lambda t: let_(feats(t), score)))
        ).alias("r"),
    )
    z = F.col("r.s") / F.col("r.n") + F.lit(bias)
    return r.where(F.col("r.n") > 0).select(
        F.col(id_col),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), round_digits).alias("score"),
        F.col("r.n").cast("long").alias("n_features"),
    )
