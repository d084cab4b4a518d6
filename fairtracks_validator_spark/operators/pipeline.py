"""End-to-end training-corpus preparation — the composed pipeline.

One declarative chain over a web corpus: Gopher quality gate → exact
content dedup (keep the smallest id per normalized hash) → deterministic
hash downsample → entity-stable train/val split. Everything is a pure
DataFrame transformation:

- the quality gate is a zero-shuffle Column predicate;
- dedup is ONE hash shuffle keyed by the 32-hex content digest (same shape
  as the uniqueness check — balanced by construction);
- sampling and splitting are map-only.

So the whole pipeline costs a single shuffle over the surviving rows — at
10^12 docs the gate runs map-side during the scan, and only quality
survivors reach the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import gopher_metrics, gopher_pass
from .sampling import hash_sample, train_val_split


def prepare_training_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 25,
    sample_rate: float = 0.5,
    val_frac: float = 0.2,
    seed: str = "pipe",
) -> DataFrame:
    """Filter → dedup → sample → split; returns surviving rows with a
    ``split`` column. Deterministic end-to-end: re-runs, resumes, and
    different partitionings produce byte-identical output."""
    passed = df.where(
        gopher_pass(gopher_metrics(F.col(text_col)), min_words=min_words)
    )
    h = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    w = Window.partitionBy("_h").orderBy(F.col(id_col).asc())
    kept = (
        passed.withColumn("_h", h)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_h", "_rn")
    )
    sampled = hash_sample(kept, id_col, sample_rate, seed=seed)
    return train_val_split(sampled, id_col, val_frac, seed=seed + "-split")
