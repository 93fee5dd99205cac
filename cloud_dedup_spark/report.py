"""Run report: the JSON summary + metrics sink (reference S5/S6).

The reference serializes one result dict to JSON (src/cloud_duplicate_analyzer.py:1450-1459)
and prints a stdout summary (:1464-1496).  Here the big artifacts are the
checkpointed stage tables (pipeline.py); the report is the small collected
summary — totals, per-repo stats, pairwise counts, cluster-size histogram,
relationship histogram, stage lineage/skew metrics — built from aggregate
DataFrames and collected only at the very end (everything driver-side here is
a few hundred rows, never the raw data).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloud_dedup_spark.metrics import RunMetrics
from cloud_dedup_spark.operators.rollup import (
    folder_comparisons,
    pairwise_repo_counts,
    relationship_histogram,
    safe_dedup_roots,
    subtree_rollup,
    unique_file_counts,
)


def build_report(result: dict) -> dict:
    """Collect the run summary from pipeline outputs (run_pipeline's dict)."""
    identity: DataFrame = result["identity"]
    assignments: DataFrame = result["assignments"]
    clusters: DataFrame = result["clusters"]
    edges: DataFrame = result["edges"]
    metrics: RunMetrics = result["metrics"]

    per_repo = {
        r["repo"]: r["n"] for r in
        identity.groupBy("repo").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    cluster_hist = {
        int(r["n_files"]): r["n"] for r in
        clusters.groupBy("n_files").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    edge_kinds = {
        r["edge_kind"]: r["n"] for r in
        edges.groupBy("edge_kind").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    pairwise = {
        f"{r['repo_a']}+{r['repo_b']}": r["n_clusters"]
        for r in pairwise_repo_counts(clusters).collect()
    }
    uniques = {
        r["repo"]: r["n_unique_files"]
        for r in unique_file_counts(assignments).collect()
    }
    fc = folder_comparisons(identity.select("repo", "path"))
    rel_hist = {
        r["relationship"]: r["n_folders"]
        for r in relationship_histogram(fc).collect()
    }
    roots = [r["folder"] for r in
             safe_dedup_roots(subtree_rollup(fc)).orderBy("folder").collect()]

    return {
        "total_files": int(identity.count()),
        "per_repo_files": per_repo,
        "n_clusters": int(clusters.count()),
        "cluster_size_histogram": cluster_hist,
        "edge_kinds": edge_kinds,
        "pairwise_duplicate_clusters": pairwise,
        "unique_files_per_repo": uniques,
        "folder_relationship_histogram": rel_hist,
        "safe_dedup_roots": roots,
        "stages": metrics.to_dict(),
    }


def write_report(result: dict, path: str) -> dict:
    report = build_report(result)
    with open(path, "w") as f:
        json.dump(report, f, indent=2, sort_keys=True, default=str)
    return report
