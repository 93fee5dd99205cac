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

import math

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
    ~50× faster per pair).

    Zero-norm vectors score -1.0 (similar to nothing), matching
    ``cosine_udf``: the unguarded division returned NULL here but NaN in the
    UDF — and Spark treats NaN as GREATER than every number, so a zero
    vector passed every ``score >= threshold`` filter and ranked FIRST in
    top-k, while the NULL path ranked it last (round-4 review)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    denom = F.sqrt(_dot(ad, ad)) * F.sqrt(_dot(bd, bd))
    return F.when(denom == 0.0, F.lit(-1.0)).otherwise(_dot(ad, bd) / denom)


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
        # zero-norm → -1.0, never NaN: Spark's total ordering puts NaN above
        # every number, so an unguarded 0/0 made the zero vector pass every
        # >= threshold filter and outrank every real neighbour
        zero = norms == 0.0
        return pd.Series(np.where(zero, -1.0, dots / np.where(zero, 1.0, norms)))

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

    Scoring goes through ``cosine_udf`` (Arrow-vectorized): the expression
    form re-evaluated three interpreted aggregate lambdas per pair — on the
    Q×N crossJoin that was the whole stage cost (round-6 measurement:
    ann_topk 3.2 s → sub-second with identical 4dp scores; rounding stays
    JVM-side either way).
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
        .withColumn("score", F.round(cosine_udf(F.col("q_vec"), F.col("c_vec")), 4))
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
    block_size: int = 256,
) -> DataFrame:
    """All pairs (a < b) with cosine ≥ threshold — embedding near-dup channel.

    Blocked execution (round-6; guide §4 "shuffle keys and metadata, not
    payloads" applied to the Arrow boundary): the old crossJoin shipped BOTH
    full vectors of every one of the N²/2 pairs through Arrow — ~100× the
    corpus bytes.  Here vectors are packed into ~``block_size``-row hash
    blocks; the G(G+1)/2 block pairs join (G ≈ N/block_size rows — a trivial
    nested-loop join of packed rows), and ONE Arrow batch per block pair
    scores every cross pair with the IDENTICAL per-pair arithmetic as
    ``cosine_udf`` (same float64 einsum row-dot, same norm product, same
    zero-norm → -1.0 guard), so each vector crosses the boundary G times
    instead of N times.  Only pairs within one conservative rounding step of
    the threshold leave Python; the AUTHORITATIVE round(4dp)-then-filter
    stays JVM-side exactly as before, so results are identical to the
    crossJoin form (equality pinned in tests/test_similarity.py).
    """
    import math

    n = emb.select(id_col).count()
    n_blocks = max(1, math.ceil(n / block_size))
    packed = (
        emb.select(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("gid"),
            F.struct(
                F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
            ).alias("item"),
        )
        .groupBy("gid")
        .agg(F.collect_list("item").alias("items"))
    )
    # conservative Python-side prefilter: round-half-up at 4dp keeps a pair
    # iff raw >= threshold - 5e-5 (threshold is a 4dp value); the extra 1e-9
    # covers double representation of the boundary.  No pair the JVM filter
    # would keep can be dropped here.
    margin = threshold - 5e-5 - 1e-9

    @F.pandas_udf("array<struct<id_a:long,id_b:long,score:double>>")
    def _block_scores(
        items_a: pd.Series, items_b: pd.Series, same: pd.Series
    ) -> pd.Series:
        out = []
        for ia, ib, s in zip(items_a, items_b, same):
            ids_a = np.array([r["id"] for r in ia], dtype=np.int64)
            ma = np.vstack([r["vec"] for r in ia]).astype(np.float64)
            if s:
                ids_b, mb = ids_a, ma
                iu, ju = np.triu_indices(len(ids_a), k=1)
            else:
                ids_b = np.array([r["id"] for r in ib], dtype=np.int64)
                mb = np.vstack([r["vec"] for r in ib]).astype(np.float64)
                iu = np.repeat(np.arange(len(ids_a)), len(ids_b))
                ju = np.tile(np.arange(len(ids_b)), len(ids_a))
            if len(iu) == 0:
                out.append([])
                continue
            pa, pb = ma[iu], mb[ju]
            dots = np.einsum("ij,ij->i", pa, pb)
            norms = np.linalg.norm(pa, axis=1) * np.linalg.norm(pb, axis=1)
            zero = norms == 0.0
            score = np.where(zero, -1.0, dots / np.where(zero, 1.0, norms))
            keep = score >= margin
            id_lo = np.minimum(ids_a[iu], ids_b[ju])[keep]
            id_hi = np.maximum(ids_a[iu], ids_b[ju])[keep]
            sc = score[keep]
            out.append(
                [
                    {"id_a": int(x), "id_b": int(y), "score": float(v)}
                    for x, y, v in zip(id_lo, id_hi, sc)
                ]
            )
        return pd.Series(out)

    x, y = packed.alias("x"), packed.alias("y")
    joined = x.join(y, F.col("x.gid") <= F.col("y.gid"))
    return (
        joined.select(
            F.explode(
                _block_scores(
                    F.col("x.items"),
                    F.col("y.items"),
                    F.col("x.gid") == F.col("y.gid"),
                )
            ).alias("p")
        )
        .select(
            F.col("p.id_a").alias("id_a"),
            F.col("p.id_b").alias("id_b"),
            F.round(F.col("p.score"), 4).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def rescore_pairs(
    emb: DataFrame,
    cand: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_size: int = 256,
) -> DataFrame:
    """Exact 4dp cosine rescoring of an ``(id_a, id_b)`` candidate frame.

    The shared tail of the LSH/IVF near-pair operators (round-6).  The old
    tail joined both full vectors onto EVERY candidate row and shipped them
    through Arrow — at low thresholds the candidate set approaches N²/2 and
    the rescore pays the same boundary flood ``cosine_near_pairs`` used to.
    Here candidates cross the boundary as 16-byte id pairs grouped by
    (block_a, block_b), vectors once per touched block pair, and the scores
    use the IDENTICAL per-pair float64 einsum arithmetic as ``cosine_udf``
    (same zero-norm → -1.0 guard); the authoritative round(4dp)+filter stays
    JVM-side, so outputs equal the old join-per-pair form exactly (pinned in
    tests/test_similarity.py).  Orientation of (id_a, id_b) is preserved.
    """
    import math

    n = emb.select(id_col).count()
    n_blocks = max(1, math.ceil(n / block_size))

    def _gid(c):
        return F.pmod(F.xxhash64(F.col(c)), F.lit(n_blocks))

    packed = (
        emb.select(
            _gid(id_col).alias("gid"),
            F.struct(
                F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
            ).alias("item"),
        )
        .groupBy("gid")
        .agg(F.collect_list("item").alias("items"))
    )
    grouped = (
        cand.select(
            "id_a", "id_b", _gid("id_a").alias("ga"), _gid("id_b").alias("gb")
        )
        .groupBy("ga", "gb")
        .agg(F.collect_list(F.struct("id_a", "id_b")).alias("pairs"))
    )
    margin = threshold - 5e-5 - 1e-9

    @F.pandas_udf("array<struct<id_a:long,id_b:long,score:double>>")
    def _score(
        pairs_s: pd.Series, items_a_s: pd.Series, items_b_s: pd.Series
    ) -> pd.Series:
        out = []
        for prs, ia, ib in zip(pairs_s, items_a_s, items_b_s):
            pos_a = {r["id"]: i for i, r in enumerate(ia)}
            ma = np.vstack([r["vec"] for r in ia]).astype(np.float64)
            pos_b = {r["id"]: i for i, r in enumerate(ib)}
            mb = np.vstack([r["vec"] for r in ib]).astype(np.float64)
            idx_a = np.fromiter(
                (pos_a[p["id_a"]] for p in prs), dtype=np.int64, count=len(prs)
            )
            idx_b = np.fromiter(
                (pos_b[p["id_b"]] for p in prs), dtype=np.int64, count=len(prs)
            )
            pa, pb = ma[idx_a], mb[idx_b]
            dots = np.einsum("ij,ij->i", pa, pb)
            norms = np.linalg.norm(pa, axis=1) * np.linalg.norm(pb, axis=1)
            zero = norms == 0.0
            score = np.where(zero, -1.0, dots / np.where(zero, 1.0, norms))
            keep = score >= margin
            out.append(
                [
                    {"id_a": int(p["id_a"]), "id_b": int(p["id_b"]), "score": float(v)}
                    for p, v in zip(
                        (p for p, k in zip(prs, keep) if k), score[keep]
                    )
                ]
            )
        return pd.Series(out)

    joined = grouped.join(
        packed.select(F.col("gid").alias("ga"), F.col("items").alias("items_a")),
        "ga",
    ).join(
        packed.select(F.col("gid").alias("gb"), F.col("items").alias("items_b")),
        "gb",
    )
    return (
        joined.select(
            F.explode(
                _score(F.col("pairs"), F.col("items_a"), F.col("items_b"))
            ).alias("p")
        )
        .select(
            F.col("p.id_a").alias("id_a"),
            F.col("p.id_b").alias("id_b"),
            F.round(F.col("p.score"), 4).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def hyperplane_signature_udf(dim: int | None = None, n_planes: int = 16, seed: int = 42):
    """Vectorized random-hyperplane SimHash over embeddings → int bucket.

    Arrow-batched (input_hint: no per-row Python); the projection matrix is
    seed-deterministic so buckets are stable across runs and cluster sizes.
    When ``dim`` is None the plane matrix is built lazily from the first
    Arrow batch's width inside the UDF (every batch has the same dim — it is
    a column type property), so no driver-side ``.first()`` action is needed
    to use this inside an operator.
    """
    state: dict = {"planes": None if dim is None else
                   np.random.RandomState(seed).standard_normal((dim, n_planes))}

    @F.pandas_udf("long")
    def signature(batch: pd.Series) -> pd.Series:
        mat = np.vstack(batch.to_numpy())  # (rows, dim)
        if state["planes"] is None:
            state["planes"] = np.random.RandomState(seed).standard_normal(
                (mat.shape[1], n_planes)
            )
        bits = (mat @ state["planes"]) >= 0  # (rows, n_planes)
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        return pd.Series(bits.astype(np.int64) @ weights)

    return signature


def lsh_band_params(
    threshold: float, target_recall: float = 0.98, max_bands: int = 48
) -> tuple[int, int]:
    """Solve (rows_per_band r, n_bands b) for banded hyperplane LSH.

    Collision model (Charikar SimHash): a pair at cosine s agrees on one
    hyperplane bit with p = 1 − arccos(s)/π; a band of r planes collides with
    p^r; recall over b bands = 1 − (1 − p^r)^b.  We pick the LARGEST r whose
    required b stays ≤ max_bands — larger r means exponentially more
    selective bands (2^r buckets each), i.e. better pruning per unit recall.

    Honest regime note: pruning power is the gap between p^r for near pairs
    and 0.5^r for random pairs.  At s ≥ 0.8 (p ≥ 0.80) this gap is large and
    LSH prunes hard; at s ≈ 0.4 (p ≈ 0.63) no (r, b) prunes much — blocked
    candidate volume stays a large fraction of N², and the win over the
    crossJoin is bounded.  Low-threshold all-pairs similarity is inherently
    near-quadratic; use a higher threshold or top-k IVF (operators/ivf.py)
    at scale.
    """
    p = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
    best = (2, max_bands)
    for r in (2, 3, 4, 6, 8, 10, 12, 16):
        pr = p**r
        # pr == 0 (threshold -1) or pr underflowing so 1-pr rounds to 1.0
        # made log(1-pr) == 0 → ZeroDivisionError; such r values simply
        # cannot reach the target recall with finite bands — skip them
        if pr >= 1.0 or 1.0 - pr >= 1.0:
            continue
        b = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - pr))
        if b <= max_bands:
            best = (r, b)
    return best


def hyperplane_band_keys_udf(
    n_bands: int, rows_per_band: int, seed: int = 42, dim: int | None = None
):
    """Arrow-batched UDF: embedding → array of ``n_bands`` band keys.

    Band key = (band_idx << rows_per_band) | bucket_bits, so keys are unique
    across bands and a single explode + equi-join does the multi-band
    blocking.  Plane matrix is seed-deterministic and lazily sized from the
    first batch (same contract as hyperplane_signature_udf).
    """
    total = n_bands * rows_per_band
    state: dict = {"planes": None if dim is None else
                   np.random.RandomState(seed).standard_normal((dim, total))}
    weights = 1 << np.arange(rows_per_band, dtype=np.int64)
    band_offsets = (np.arange(n_bands, dtype=np.int64) << rows_per_band)

    @F.pandas_udf("array<long>")
    def band_keys(batch: pd.Series) -> pd.Series:
        mat = np.vstack(batch.to_numpy())
        if state["planes"] is None:
            state["planes"] = np.random.RandomState(seed).standard_normal(
                (mat.shape[1], total)
            )
        bits = ((mat @ state["planes"]) >= 0).astype(np.int64)
        # (rows, n_bands, rows_per_band) @ (rows_per_band,) → (rows, n_bands)
        keys = bits.reshape(len(mat), n_bands, rows_per_band) @ weights
        keys += band_offsets  # disjoint key spaces per band
        return pd.Series(list(keys))

    return band_keys


def cosine_near_pairs_lsh(
    emb: DataFrame,
    threshold: float = 0.95,
    target_recall: float = 0.98,
    n_bands: int | None = None,
    rows_per_band: int | None = None,
    bucket_cap: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-blocked near pairs: multi-band hyperplane buckets → exact cosine.

    The scale twin of ``cosine_near_pairs`` (which stays as the small-N
    oracle): candidates come from an equi-join on band keys (shuffle join,
    NO cartesian in the plan), then every candidate is exactly re-scored and
    thresholded, so precision is 1.0 by construction and recall follows the
    banded-LSH model in ``lsh_band_params`` (pinned ≥ 0.95 vs the exact twin
    in tests/test_similarity.py).

    ``bucket_cap``: optional skew guard — band buckets holding more than cap
    vectors are dropped from candidate generation (boilerplate-direction
    buckets at scale), trading bounded recall loss for a hard O(cap²) bound
    per bucket, the same contract as candidates.py's hot-bucket handling.
    """
    if rows_per_band is None and n_bands is None:
        rows_per_band, n_bands = lsh_band_params(threshold, target_recall)
    elif rows_per_band is None or n_bands is None:
        raise ValueError("pass both rows_per_band and n_bands, or neither")
    keys = hyperplane_band_keys_udf(n_bands, rows_per_band, seed)
    # materialize the keyed frame once: it feeds the bucket-size branch and
    # BOTH sides of the self-join, and without the cut each subtree re-runs
    # the full-corpus hyperplane GEMM UDF (2-3× the projection work per
    # invocation — round-4 review).  Narrow rows (id, key): cheap to store.
    keyed = emb.select(
        F.col(id_col).alias("vid"),
        F.explode(keys(F.col(vec_col))).alias("band_key"),
    ).localCheckpoint()
    if bucket_cap is not None:
        sizes = keyed.groupBy("band_key").agg(F.count(F.lit(1)).alias("n"))
        keyed = keyed.join(
            sizes.filter(F.col("n") <= bucket_cap).select("band_key"),
            "band_key",
            "left_semi",
        )
    cand = (
        keyed.alias("x")
        .join(keyed.alias("y"), "band_key")
        .filter(F.col("x.vid") < F.col("y.vid"))
        .select(F.col("x.vid").alias("id_a"), F.col("y.vid").alias("id_b"))
        .distinct()
    )
    # blocked rescore (round-6): at low thresholds banded LSH prunes weakly
    # (docstring regime note), so the candidate set approaches N²/2 and the
    # old per-pair vector join re-created the Arrow flood the exact twin
    # had — rescore_pairs ships id pairs, not vector pairs.
    return rescore_pairs(
        emb, cand, threshold, id_col=id_col, vec_col=vec_col
    )


def lsh_bucketed_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int | None = None,
    n_planes: int = 12,
    multi_probe: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine but only within the query's LSH bucket.

    Recall < 1 by construction (bucket pruning); the scale win is turning the
    crossJoin into an equi-join on ``bucket``.

    ``multi_probe=True`` additionally probes every bucket at Hamming
    distance 1 from the query's bucket (flip each plane bit) — the classic
    multi-probe LSH recall lift (n_planes+1 probes per query) at zero extra
    index cost: only the small query side fans out, the corpus stays
    single-bucketed, and the probe expansion is a pure Column expression
    (no extra Python).
    """
    # dim=None → the UDF sizes its plane matrix from the first Arrow batch;
    # no driver-side .first() action inside the operator (round-1 review).
    sig = hyperplane_signature_udf(dim, n_planes)
    emb_b = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        sig(F.col(vec_col)).alias("bucket"),
    )
    q_base = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        sig(F.col(vec_col)).alias("bucket"),
    )
    if multi_probe:
        probes = F.expr(
            "array_union(array(bucket), "
            f"transform(sequence(0, {n_planes - 1}), "
            "i -> bucket ^ shiftleft(cast(1 as bigint), i)))"
        )
        q_b = q_base.select(
            "query_id", "q_vec", F.explode(probes).alias("bucket")
        )
    else:
        q_b = q_base
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
