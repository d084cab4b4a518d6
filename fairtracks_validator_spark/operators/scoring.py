"""Corpus-trained scoring — unigram language-model log-probability.

The cheapest corpus-level "perplexity-ish" quality signal: train unigram
frequencies on the corpus itself (one groupBy over the exploded token
stream — the (token) key self-salts skewed langs exactly like
``distinct_count_per_group``), then score each document as the mean log
probability of its tokens. Two shuffles total: token counts, per-doc mean.

The vocabulary total is read back as ONE driver scalar (a bounded action,
like the centroid counts in ``similarity.kmeans_fit``); the vocab join is
left unhinted so AQE broadcasts it when it fits and shuffle-joins a web
corpus's 10^8-term vocabulary otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def unigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    round_digits: int = 4,
) -> DataFrame:
    """(id, logprob, n_tokens) for every doc with ≥1 token.

    ``logprob`` = mean over tokens of ln(count(token) / total_tokens),
    rounded to ``round_digits`` (float sum order varies across partitions;
    4 digits absorbs it — same contract as the windowed event sums).
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("t")).collect()[0]["t"] or 0
    scored = toks.join(vocab, "token")
    return (
        scored.groupBy("id")
        .agg(
            F.round(
                F.avg(F.log(F.col("cnt") / F.lit(float(max(total, 1))))),
                round_digits,
            ).alias("logprob"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        .select(F.col("id").alias(id_col), "logprob", "n_tokens")
    )
