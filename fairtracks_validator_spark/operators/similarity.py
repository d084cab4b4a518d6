"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — brute-force exact top-k against one query vector.
  The dot product is a ``zip_with``/``aggregate`` fold (JVM codegen); the
  top-k is ``ORDER BY score LIMIT k``, which Spark executes as TakeOrdered
  (per-partition heaps + driver merge — no global sort shuffle).
- :func:`ivf_topk` — IVF-style two-stage search: deterministic centroids
  (first ``n_clusters`` vectors by id), assign every vector to its nearest
  centroid (broadcast loop over centroids, constant-folded), probe the
  ``n_probe`` clusters nearest to the query. Exact within probed clusters;
  recall < 1 by design — the 10^12-row path (scan shrinks by
  n_probe/n_clusters).
- :func:`cosine_topk_all_pairs` — k-NN join for every row (test scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int = 10,
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query``. Deterministic ties:
    (score DESC, id ASC)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = sum(x * x for x in query) ** 0.5
    v = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    if exclude_id is not None:
        v = v.where(F.col("id") != exclude_id)
    scored = v.select(
        "id",
        F.round(_dot(F.col("vec"), q) / (_norm(F.col("vec")) * F.lit(qn)), 6).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc("id")).limit(k)


# above this many centroids the constant-folded expression chain outgrows
# codegen; the Arrow-batched numpy matmul takes over (the real-IVF path,
# where codebooks have thousands of centroids)
ASSIGN_FOLD_MAX = 64


def assign_clusters(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[tuple[int, list[float]]],
    use_pandas: bool | None = None,
) -> DataFrame:
    """Nearest-centroid assignment by cosine (ties → smallest centroid id).

    Small codebooks fold the centroids into a pure Column expression (zero
    Python, broadcast in its cheapest form); codebooks past
    ``ASSIGN_FOLD_MAX`` switch to one vectorized pandas UDF doing a single
    numpy matmul per Arrow batch — O(batch × k × d) BLAS work instead of a
    k-deep codegen expression. Both paths produce identical assignments.
    """
    if use_pandas is None:
        use_pandas = len(centroids) > ASSIGN_FOLD_MAX
    if use_pandas:
        return _assign_clusters_pandas(df, id_col, vec_col, centroids)
    v = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).withColumn("_n", _norm(F.col("vec")))
    best = None
    for cid, cvec in centroids:
        cn = sum(x * x for x in cvec) ** 0.5 or 1.0
        score = _dot(F.col("vec"), F.array(*[F.lit(float(x)) for x in cvec])) / (
            F.col("_n") * F.lit(cn)
        )
        cand = F.struct(score.alias("s"), F.lit(-cid).cast("long").alias("nc"))
        best = cand if best is None else F.greatest(best, cand)
    return v.withColumn("cluster", (-best.getField("nc")).cast("int")).drop("_n")


def _assign_clusters_pandas(
    df: DataFrame, id_col: str, vec_col: str,
    centroids: list[tuple[int, list[float]]],
) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # sort by centroid id so np.argmax's first-occurrence tie-break matches
    # the expression path's smallest-id rule
    cent = sorted(centroids)
    cids = np.array([cid for cid, _ in cent], dtype=np.int64)
    cmat = np.asarray([c for _, c in cent], dtype=np.float64)
    cmat = cmat / np.maximum(np.linalg.norm(cmat, axis=1, keepdims=True), 1e-300)

    # no type hints: the local pd import can't resolve string annotations,
    # so the udf type is declared via the returnType argument instead
    def _nearest(vecs):
        v = np.asarray(vecs.tolist(), dtype=np.float64)
        v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-300)
        return pd.Series(cids[np.argmax(v @ cmat.T, axis=1)].astype("int32"))

    nearest = pandas_udf(_nearest, "int")

    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).withColumn("cluster", nearest(F.col("vec")))


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    exclude_id: int | None = None,
) -> DataFrame:
    """IVF two-stage ANN. Centroids = the ``n_clusters`` lowest-id vectors
    (deterministic; a production build would k-means these offline)."""
    cent_rows = (
        df.select(F.col(id_col).cast("long").alias("id"),
                  F.col(vec_col).cast("array<double>").alias("vec"))
        .orderBy("id").limit(n_clusters).collect()
    )
    centroids = [(i, list(r["vec"])) for i, r in enumerate(cent_rows)]

    qn = sum(x * x for x in query) ** 0.5 or 1.0

    def cos_to_query(cvec):
        cn = sum(x * x for x in cvec) ** 0.5 or 1.0
        return sum(a * b for a, b in zip(query, cvec)) / (cn * qn)

    probe = sorted(centroids, key=lambda c: (-cos_to_query(c[1]), c[0]))[:n_probe]
    probe_ids = [c[0] for c in probe]

    assigned = assign_clusters(df, id_col, vec_col, centroids)
    cand = assigned.where(F.col("cluster").isin(probe_ids))
    if exclude_id is not None:
        cand = cand.where(F.col("id") != exclude_id)
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = cand.select(
        "id",
        F.round(_dot(F.col("vec"), q) / (_norm(F.col("vec")) * F.lit(qn)), 6).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc("id")).limit(k)


def cosine_topk_all_pairs(
    df: DataFrame, id_col: str, vec_col: str, k: int = 5
) -> DataFrame:
    """k nearest neighbours for EVERY row (brute N²; test scale only —
    blocked/LSH variants take over at scale)."""
    v = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).withColumn("_n", _norm(F.col("vec")))
    pairs = (
        v.alias("l").crossJoin(v.alias("r"))
        .where(F.col("l.id") != F.col("r.id"))
        .select(
            F.col("l.id").alias("id"),
            F.col("r.id").alias("nbr"),
            F.round(
                _dot(F.col("l.vec"), F.col("r.vec")) / (F.col("l._n") * F.col("r._n")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("nbr"))
    return pairs.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)
