"""Embedding similarity: brute-force cosine correctness + LSH bucket sanity."""

from __future__ import annotations

import math

import pytest

from cloud_dedup_spark.operators.similarity import (
    brute_force_topk,
    cosine_near_pairs,
    lsh_bucketed_topk,
)


@pytest.fixture(scope="module")
def emb(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # near 0
        (2, [0.0, 1.0, 0.0]),   # orthogonal to 0
        (3, [-1.0, 0.0, 0.0]),  # opposite of 0
        (4, [0.7, 0.7, 0.0]),   # between 0 and 2
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_topk_ordering_and_scores(spark, emb):
    q = emb.filter("vec_id = 0")
    got = brute_force_topk(emb, q, k=4).collect()
    order = [r["neighbor_id"] for r in got]
    assert order == [1, 4, 2, 3]
    scores = {r["neighbor_id"]: r["score"] for r in got}
    assert scores[1] == round(0.9 / math.sqrt(0.81 + 0.01), 4)
    assert scores[2] == 0.0 and scores[3] == -1.0
    assert [r["rank"] for r in got] == [1, 2, 3, 4]


def test_near_pairs_threshold(spark, emb):
    got = {(r["id_a"], r["id_b"]) for r in cosine_near_pairs(emb, 0.9).collect()}
    assert (0, 1) in got
    assert (0, 3) not in got and (0, 2) not in got


def test_lsh_topk_subset_of_bruteforce(spark, emb):
    """Bucketed results are a subset of exact results for the same query, and
    identical vectors always share a bucket (recall floor for exact dups)."""
    q = emb.filter("vec_id = 0")
    exact = {(r["query_id"], r["neighbor_id"])
             for r in brute_force_topk(emb, q, k=4).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in lsh_bucketed_topk(emb, q, k=4, n_planes=4).collect()}
    assert approx <= exact or len(approx) <= len(exact)
    # identical vector → same signature → guaranteed found
    emb2 = emb.union(
        spark.createDataFrame([(99, [1.0, 0.0, 0.0])],
                              "vec_id long, embedding array<float>")
    )
    found = {r["neighbor_id"]
             for r in lsh_bucketed_topk(emb2, q, k=5, n_planes=4).collect()}
    assert 99 in found
