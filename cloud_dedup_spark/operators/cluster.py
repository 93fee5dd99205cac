"""Iterative connected-components (hash-to-min) clustering over verified edges.

Reference analog: duplicate-group building — the reference walks each
candidate key and folds pair verdicts into one group
(src/cloud_duplicate_analyzer.py:400-433).  Its groups are one-key islands;
ours are true graph components because near-dup/substring edges chain across
blocks, so we need a fixed point: every file's cluster label converges to the
minimum file_id reachable through accepted edges (hash-to-min, SURVEY.md §4
"iterative connected components").

Catalyst has no fixed-point operator, so the loop is driver-side:
  label(v) ← min(label(v), min over neighbours u of label(u))
iterated until no label changes.  Converges in O(diameter) rounds — dup
clusters are near-cliques plus short substring chains, so diameter is small
(single digits) even at 10^12-file scale.

Scale notes per iteration: one shuffle (groupBy id after the edge-label
join).  Lineage is cut every round with ``localCheckpoint`` — without it the
plan doubles each iteration and the job dies on plan-compile time long before
data size matters (SURVEY.md §7.4 item 2).  On a durable cluster run, swap
localCheckpoint for a checkpoint/Iceberg stage-table write (plans/pipeline.py
does this when given a checkpoint location).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iterations: int = 50,
    check_every: int = 2,
) -> DataFrame:
    """Label every vertex with the min file_id of its component.

    ``edges``: (src, dst) long pairs.  ``vertices``: optional (file_id) frame;
    vertices absent from any edge keep themselves as their label (singleton
    clusters).  Returns (file_id, cluster_id).

    Edge endpoints are always unioned into the vertex set: a ``vertices``
    frame missing a bridge endpoint silently split its component (the inner
    join dropped the bridge's edges) — the touched-component caller upholds
    "members cover every endpoint" only by construction across many joins,
    and one future edit there must not corrupt labels (round-4 review).
    Extra endpoint labels are harmless to callers that join labels back onto
    their own member list.
    """
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    endpoints = sym.select(F.col("src").alias("file_id"))
    if vertices is None:
        verts = endpoints.distinct()
    else:
        verts = vertices.select("file_id").unionByName(endpoints).distinct()

    # lazy checkpoints: the per-round lineage cut is what matters (without it
    # the plan doubles each iteration); materialization rides the next driver
    # action (the convergence count every ``check_every`` rounds) instead of
    # costing its own job per round — at most check_every rounds of plan ever
    # stack before a cut (round-4 verdict item 3, job-floor audit)
    labels = verts.withColumn("cluster_id", F.col("file_id")).localCheckpoint(
        eager=False
    )
    sym = sym.localCheckpoint(eager=False)

    for it in range(max_iterations):
        # hash-to-min step: min over own label and neighbours' labels
        nbr_min = (
            sym.join(labels, sym["dst"] == labels["file_id"])
            .groupBy(sym["src"].alias("file_id"))
            .agg(F.min("cluster_id").alias("nbr_label"))
        )
        stepped = labels.join(nbr_min, "file_id", "left").select(
            "file_id",
            F.least(
                F.col("cluster_id"), F.coalesce("nbr_label", F.col("cluster_id"))
            ).alias("cluster_id"),
            F.col("cluster_id").alias("_old"),
        )
        # pointer-jumping step: label ← label(label), collapsing chains in
        # O(log diameter) total iterations instead of O(diameter) — matters
        # for the path-shaped components the salted-chain buckets produce
        parents = stepped.select(
            F.col("file_id").alias("cluster_id"),
            F.col("cluster_id").alias("_grand"),
        )
        new_labels = (
            stepped.join(parents, "cluster_id", "left")
            .select(
                "file_id",
                F.least(
                    F.col("cluster_id"), F.coalesce("_grand", F.col("cluster_id"))
                ).alias("cluster_id"),
                "_old",
            )
            .localCheckpoint(eager=False)
        )
        # the convergence count is a full extra job; with pointer jumping the
        # loop converges in O(log diameter) rounds, so probing every
        # ``check_every``-th round trades at most one surplus iteration for
        # half the count jobs (part of the small-stage latency floor,
        # BENCH/ANALYSIS.md)
        labels = new_labels.drop("_old")
        if (it + 1) % check_every == 0 or it == max_iterations - 1:
            changed = new_labels.filter(
                F.col("cluster_id") != F.col("_old")
            ).count()
            if changed == 0:
                break
    return labels


def cluster_assignments(
    files: DataFrame, edges: DataFrame, max_iterations: int = 50
) -> DataFrame:
    """Attach cluster ids to every file (singletons = own file_id).

    ``files`` needs (file_id, repo, path); ``edges`` is the union of exact /
    near / substring accepted edges.  Output: file_id, repo, path,
    cluster_id, with cluster_id = min file_id in the component.
    """
    labels = connected_components(edges, vertices=None, max_iterations=max_iterations)
    return files.select("file_id", "repo", "path").join(
        labels, "file_id", "left"
    ).withColumn("cluster_id", F.coalesce("cluster_id", F.col("file_id")))


def cluster_summary(assignments: DataFrame, member_cap: int = 1000) -> DataFrame:
    """Per-cluster aggregates — reference group fields analog
    (size, repo span, representative; src/cloud_duplicate_analyzer.py:412-428
    builds rel_path/matches/service_details per group).

    Quarantined rows (id-collision singletons, plans/pipeline.py) are excluded
    BEFORE grouping: their labels live in the file_id2 hash space, which is
    not structurally disjoint from the min-file_id label space, so grouping
    them together could alias a quarantined file into a real cluster's row.
    Dropping them here makes that aliasing impossible — a quarantined file is
    by construction never a member of any duplicate cluster.

    ``members`` holds at most ``member_cap`` members (first by (repo, path));
    counts and the ``repos`` set always cover the full cluster.  Uncapped,
    a mega-cluster (millions of identical lockfiles arriving through the
    exact star edges) materialized an unbounded single-buffer array — the
    fan-in shape exact_duplicate_groups caps one stage earlier (round-4
    review).  ``repos`` is a distinct-set column (bounded by repo count, not
    file count) so rollups never need the full member list.
    """
    if "quarantined" in assignments.columns:
        assignments = assignments.filter(~F.col("quarantined"))
    w = Window.partitionBy("cluster_id").orderBy("repo", "path")
    capped = assignments.withColumn("_rn", F.row_number().over(w))
    return (
        capped.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.countDistinct("repo").alias("n_repos"),
            F.min(F.struct("file_id", "repo", "path")).alias("representative"),
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("_rn") <= member_cap, F.struct("repo", "path")
                    )
                )
            ).alias("members"),
            F.sort_array(F.collect_set("repo")).alias("repos"),
        )
        .filter(F.col("n_files") >= 2)
    )
