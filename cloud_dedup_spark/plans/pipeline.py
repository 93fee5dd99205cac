"""End-to-end dedup pipeline with resumable stage checkpoints.

Reference analog: ``analyze()`` (src/cloud_duplicate_analyzer.py:273-713),
the reference's single-pass engine core, restructured into the target
lifecycle (SURVEY.md §3):

    files → identity/normalize → exact channel → signatures → LSH candidates
          → verification → substring channel → connected components
          → cluster summary

Checkpointing (north_rule "resumable from checkpoint"): each starred stage
writes a stage table; a re-run with the same checkpoint location skips every
stage whose output already exists (detected via the parquet ``_SUCCESS``
marker).  Locally the stage tables are parquet directories; on a cluster
point ``table_format='iceberg'`` at a catalog-qualified namespace and the
same logic writes Iceberg tables (Iceberg jars are a spark-submit --packages
concern, not a code change).

The reference holds everything in RAM in one process
(docs/how-it-works.md:104); here every arrow is a DataFrame and every stage
boundary is spill-safe and restartable.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloud_dedup_spark.config import DedupConfig
from cloud_dedup_spark.functions.normalize import with_identity
from cloud_dedup_spark.metrics import RunMetrics
from cloud_dedup_spark.operators.candidates import lsh_candidate_pairs
from cloud_dedup_spark.operators.cluster import cluster_assignments, cluster_summary
from cloud_dedup_spark.operators.exact import (
    exact_duplicate_clusters,
    exact_pair_edges,
)
from cloud_dedup_spark.operators.signatures import compute_signatures
from cloud_dedup_spark.operators.substring import substring_edge_list, substring_edges
from cloud_dedup_spark.operators.verify import accepted_edges, verify_pairs


class CheckpointStore:
    """Stage-table store: write-once, read-back, skip-if-present."""

    def __init__(
        self,
        spark: SparkSession,
        location: str | None,
        table_format: str = "parquet",
    ) -> None:
        self.spark = spark
        self.location = location.rstrip("/") if location else None
        self.table_format = table_format

    def _path(self, name: str) -> str:
        assert self.location is not None
        return f"{self.location}/{name}"

    def exists(self, name: str) -> bool:
        if self.location is None:
            return False
        # parquet success marker; Iceberg would use catalog tableExists
        jvm = self.spark._jvm
        hconf = self.spark._jsc.hadoopConfiguration()
        path = jvm.org.apache.hadoop.fs.Path(self._path(name) + "/_SUCCESS")
        return path.getFileSystem(hconf).exists(path)

    def materialize(self, name: str, build: Callable[[], DataFrame]) -> DataFrame:
        """Build → write → read back (or just read if already checkpointed).

        Reading back makes every downstream plan start from a scan instead of
        the full upstream lineage — the same lineage-cutting role as the
        reference re-deriving later stages from its in-memory lists.
        """
        if self.location is None:
            # no checkpointing requested: cut lineage in-memory instead
            return build().localCheckpoint()
        if not self.exists(name):
            build().write.mode("overwrite").format(self.table_format).save(
                self._path(name)
            )
        return self.spark.read.format(self.table_format).load(self._path(name))


def run_pipeline(
    spark: SparkSession,
    files: DataFrame,
    cfg: DedupConfig | None = None,
    checkpoint_dir: str | None = None,
    table_format: str = "parquet",
    collect_partition_stats: bool = False,
    track_rows: bool = True,
) -> dict:
    """Run the full dedup pipeline; returns stage DataFrames + metrics.

    Returns dict with keys: identity, exact, signatures, candidate_edges,
    substring_edges, edges, assignments, clusters, metrics (RunMetrics).
    """
    cfg = cfg or DedupConfig()
    store = CheckpointStore(spark, checkpoint_dir, table_format)
    metrics = RunMetrics()

    # Parallelism guard: a narrow input (few parquet splits, small
    # createDataFrame) would serialize the normalize + signature stages —
    # measured as a hard scaling ceiling (the whole pipeline inherited 2
    # partitions from a 250 MB corpus file).  One up-front round-robin
    # shuffle is cheap next to the per-file CPU work it unlocks; skipped
    # when the source is already wide (the 100 TB case).
    par = spark.sparkContext.defaultParallelism
    if files.rdd.getNumPartitions() < par:
        files = files.repartition(par * 2)

    def stage(name: str, build: Callable[[], DataFrame]) -> DataFrame:
        t0 = time.time()
        df = store.materialize(name, build)
        metrics.record(name, time.time() - t0, df if track_rows else None,
                       with_partitions=collect_partition_stats)
        return df

    identity = stage("identity", lambda: with_identity(files))

    exact = stage("exact", lambda: exact_duplicate_clusters(identity))

    # only exact representatives proceed to the similarity stages — the
    # pre-collapse that defuses boilerplate skew (operators/exact.py)
    reps = identity.join(
        exact.filter("is_exact_rep").select("file_id"), "file_id", "inner"
    )

    # Round-robin widen before the Python stage: the UDF cost is per-token,
    # and file sizes cluster (vendored trees, generated code), so inherited
    # scan splits give straggler tasks — measured as 3-4 workers grinding
    # for 3× the median task time while the rest idle.  par*4 partitions
    # give the scheduler slack to balance; the extra shuffle is row-narrow.
    sigs = stage(
        "signatures",
        lambda: compute_signatures(reps.repartition(par * 4), cfg),
    )

    verified = stage(
        "candidate_edges",
        lambda: verify_pairs(lsh_candidate_pairs(sigs, cfg), sigs, cfg),
    )

    sub_edges = stage("substring_edges", lambda: substring_edges(reps, sigs, cfg))

    edges = stage(
        "edges",
        lambda: exact_pair_edges(exact)
        .unionByName(
            accepted_edges(verified).select("src", "dst", "edge_kind", "score")
        )
        .unionByName(substring_edge_list(sub_edges))
        .select("src", "dst", "edge_kind", "score"),
    )

    assignments = stage(
        "cluster_labels", lambda: cluster_assignments(identity, edges)
    )

    clusters = cluster_summary(assignments)

    return {
        "identity": identity,
        "exact": exact,
        "signatures": sigs,
        "candidate_edges": verified,
        "substring_edges": sub_edges,
        "edges": edges,
        "assignments": assignments,
        "clusters": clusters,
        "metrics": metrics,
    }


def invariant_violations(identity: DataFrame) -> DataFrame:
    """Rows where stored content_sha256 ≠ recomputed sha2(content, 256).

    The per-row invariant from BASELINE.json ``input_hint`` — reference
    analog: MD5 re-verification of candidate content (:257-258).  Empty
    result = invariant holds.
    """
    return identity.filter(
        F.col("content_sha256") != F.sha2(F.col("content"), 256)
    ).select("repo", "path", "content_sha256")
