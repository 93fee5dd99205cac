"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline, plus a hyperplane-LSH
bucketed variant as the scale path — the ANN analog of the dedup pipeline's
MinHash/LSH staging (cheap blocking first, exact scoring after; reference
staging principle X3, src/cloud_duplicate_analyzer.py:245-258).

The cosine arithmetic is spelled out with zip_with/aggregate (not a UDF and
not a black-box builtin) so the DuckDB oracle can reproduce the identical
formula and summation order (__spark_entry__.py).

Scale notes: brute force is O(Q·N) — fine when Q (query set) is small and
broadcast; the LSH variant prunes N to a bucket. For 100 TB-scale ANN the
round-2 path is IVF: k-means coarse centroids (Spark ML), partition by
nearest centroid, search nprobe partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def cosine_col(a, b) -> F.Column:
    """Cosine similarity of two array<float/double> columns, as double.

    Expression form (interpreted lambda per element) — right for small pair
    counts; use ``cosine_udf`` for large self-joins (Arrow-vectorized,
    ~50× faster per pair)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / (F.sqrt(_dot(ad, ad)) * F.sqrt(_dot(bd, bd)))


def cosine_udf(a, b) -> F.Column:
    """Arrow-vectorized cosine: whole batch as two (rows, dim) matrices.

    numpy's pairwise summation differs from the sequential fold only at
    ~1e-16 relative error — far inside the 4dp rounding used by callers.
    (Constructed lazily: pandas_udf registration needs an active session.)
    """

    @F.pandas_udf("double")
    def _cos(xa: pd.Series, xb: pd.Series) -> pd.Series:
        ma = np.vstack(xa.to_numpy()).astype(np.float64)
        mb = np.vstack(xb.to_numpy()).astype(np.float64)
        dots = np.einsum("ij,ij->i", ma, mb)
        norms = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        return pd.Series(dots / norms)

    return _cos(a, b)


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbours for each query vector.

    ``queries`` is expected to be small → broadcast; the corpus side streams.
    Ties broken by neighbour id for determinism (reference X9: deterministic
    ordering before any output).  Output: query_id, neighbor_id, rank, score.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", F.round(cosine_col(F.col("q_vec"), F.col("c_vec")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def cosine_near_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (a < b) with cosine ≥ threshold — embedding near-dup channel."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("score", F.round(cosine_udf(F.col("vec_a"), F.col("vec_b")), 4))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )


def hyperplane_signature_udf(dim: int, n_planes: int = 16, seed: int = 42):
    """Vectorized random-hyperplane SimHash over embeddings → int bucket.

    Arrow-batched (input_hint: no per-row Python); the projection matrix is
    seed-deterministic so buckets are stable across runs and cluster sizes.
    """
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((dim, n_planes))

    @F.pandas_udf("long")
    def signature(batch: pd.Series) -> pd.Series:
        mat = np.vstack(batch.to_numpy())  # (rows, dim)
        bits = (mat @ planes) >= 0  # (rows, n_planes)
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        return pd.Series(bits.astype(np.int64) @ weights)

    return signature


def lsh_bucketed_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int | None = None,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine but only within the query's LSH bucket.

    Recall < 1 by construction (bucket pruning); the scale win is turning the
    crossJoin into an equi-join on ``bucket``.  Multi-probe (flip one bit)
    would raise recall — left for the IVF upgrade.
    """
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    sig = hyperplane_signature_udf(dim, n_planes)
    emb_b = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        sig(F.col(vec_col)).alias("bucket"),
    )
    q_b = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        sig(F.col(vec_col)).alias("bucket"),
    )
    scored = (
        q_b.join(emb_b, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", F.round(cosine_col(F.col("q_vec"), F.col("c_vec")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )
