"""Connected components (hash-to-min): explicit graphs with known components.

Analog of the reference's group-building assertions
(tests/test_cloud_duplicate_analyzer.py:171-243 assert exact group routing)."""

from __future__ import annotations

import pyspark.sql.functions as F

from cloud_dedup_spark.operators.cluster import (
    cluster_assignments,
    cluster_summary,
    connected_components,
)


def _labels(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = connected_components(df).collect()
    return {r["file_id"]: r["cluster_id"] for r in rows}


def test_single_edge(spark):
    assert _labels(spark, [(1, 2)]) == {1: 1, 2: 1}


def test_chain_converges_to_min(spark):
    # a path graph exercises multi-iteration propagation (diameter 5)
    got = _labels(spark, [(5, 4), (4, 3), (3, 2), (2, 1), (1, 0)])
    assert got == {i: 0 for i in range(6)}


def test_two_components(spark):
    got = _labels(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_triangle_plus_bridge(spark):
    got = _labels(spark, [(7, 8), (8, 9), (7, 9), (9, 20)])
    assert set(got.values()) == {7}


def test_assignments_include_singletons(spark):
    files = spark.createDataFrame(
        [(1, "a", "p1"), (2, "a", "p2"), (3, "b", "p3")],
        "file_id long, repo string, path string",
    )
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    rows = cluster_assignments(files, edges).collect()
    got = {r["file_id"]: r["cluster_id"] for r in rows}
    assert got == {1: 1, 2: 1, 3: 3}  # 3 is a singleton = own label


def test_cluster_summary_fields(spark):
    files = spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p2"), (3, "b", "p3")],
        "file_id long, repo string, path string",
    )
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    summ = cluster_summary(cluster_assignments(files, edges)).collect()
    assert len(summ) == 1
    row = summ[0]
    assert row["n_files"] == 3 and row["n_repos"] == 2
    assert row["representative"]["file_id"] == 1
    assert len(row["members"]) == 3
