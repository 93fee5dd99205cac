"""Exact-duplicate channel: byte-identical content across files.

Reference analog: the MD5-equality confirm path of ``classify_pair``
(src/cloud_duplicate_analyzer.py:257-265 — "MD5 equal → identical") plus the
empty-file fast path (:250-252, empty files are identical without hashing).
In the scaled engine this runs FIRST, before any shingling, for two reasons:

 1. It is the cheap-before-expensive staging the reference uses
    (name+size before MD5, SURVEY.md §4 X3): ``sha2(content, 256)`` is one
    JVM-side pass, no Python.
 2. It collapses every byte-identical family to ONE representative before
    MinHash/LSH, which is the single biggest skew reducer: the hot-band
    problem (thousands of identical license/boilerplate files landing in one
    LSH bucket) mostly disappears when identical bodies enter LSH once
    (SURVEY.md §7.4 item 1).

Scale notes: one shuffle on ``content_sha256`` (a high-cardinality,
well-distributed key — no salting needed); aggregation is map-side partial;
columns are pruned to (hash, id, repo, path) before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def exact_duplicate_clusters(files: DataFrame) -> DataFrame:
    """Group byte-identical files; one row per file with its exact-group id.

    Input: identity frame from ``with_identity`` (needs file_id,
    content_sha256, repo, path).
    Output columns: ``content_sha256, file_id, repo, path, exact_group_id,
    exact_group_size, is_exact_rep`` where ``exact_group_id`` is the min
    file_id of the group (deterministic representative — reference analog of
    first-hit-per-key selection, src/cloud_duplicate_analyzer.py:323-325) and
    ``is_exact_rep`` marks the representative row that proceeds to the
    near-dup stages.
    """
    w = Window.partitionBy("content_sha256")
    return (
        files.select("content_sha256", "file_id", "repo", "path")
        .withColumn("exact_group_id", F.min("file_id").over(w))
        .withColumn("exact_group_size", F.count(F.lit(1)).over(w))
        .withColumn("is_exact_rep", F.col("file_id") == F.col("exact_group_id"))
    )


def exact_duplicate_groups(files: DataFrame) -> DataFrame:
    """Cluster-level view: one row per byte-identical group with ≥ 2 members.

    Reference analog: duplicate groups with ``content_match='identical'``
    (built at src/cloud_duplicate_analyzer.py:412-428) and the ≥2-services
    presence predicate (:326-327) — here ≥2 *files*, with the cross-repo span
    as a column (`n_repos`) instead of a filter, so single-repo exact dups
    remain visible to the rollups.
    """
    return (
        files.groupBy("content_sha256")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.countDistinct("repo").alias("n_repos"),
            F.min("file_id").alias("exact_group_id"),
            F.sort_array(F.collect_list(F.struct("repo", "path"))).alias("members"),
            F.min("n_bytes").alias("n_bytes"),
        )
        .filter(F.col("n_files") >= 2)
    )


def exact_pair_edges(clusters: DataFrame) -> DataFrame:
    """Edges (id_a < id_b) linking each member to its group representative.

    A star over the representative — not all-pairs — is enough for connected
    components and keeps edge count linear in group size (an n-member
    identical family yields n-1 edges, not n*(n-1)/2).
    """
    return (
        clusters.filter(~F.col("is_exact_rep"))
        .select(
            F.least("exact_group_id", "file_id").alias("src"),
            F.greatest("exact_group_id", "file_id").alias("dst"),
            F.lit("exact").alias("edge_kind"),
            F.lit(1.0).alias("score"),
        )
    )
