"""Stage-table maintenance: compaction of append-grown checkpoint tables.

Incremental ingest (streaming/incremental.py) appends one parquet slice per
micro-batch to identity / signatures / norm / bands / shingle_index.  At
streaming cadence that is the classic small-file problem: a year of hourly
deltas is ~10^4 files per table, every scan pays open/footer costs per file,
and scan task counts stop tracking data size.  On Iceberg this is `rewrite
data files`; for the plain-parquet store this module provides the same
operation: coalesce each table back to ~target-sized files, atomically.

Atomicity on a filesystem without transactions: write the compacted copy to
`<table>.compact.tmp`, then swap via two renames (table → .old, tmp → table)
and drop the old directory.  A reader racing the swap can lose — acceptable
for a maintenance window, documented; Iceberg's snapshot-based rewrite is
the concurrent-safe variant on clusters (same writer surface,
table_format='iceberg').
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession

# tables the incremental path appends to (cluster_labels/edges are rewritten
# whole each update, so they never fragment)
APPEND_TABLES = (
    "identity", "signatures", "norm", "bands", "anchors", "quarantine",
    "shingle_index",
)


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def repair_swap(spark: SparkSession, path: str, suffix: str = ".swap") -> None:
    """Entry repair for the two-rename swap protocol (run BEFORE reading).

    A crash between the two renames leaves the data parked at
    ``<path><suffix>.old`` with the main path missing — rename it back.  A
    crash after the second rename but before cleanup leaves a stale full
    copy at ``.old`` — drop it.  A stale ``.tmp`` is always safe to drop
    (the swap re-writes it from scratch).
    """
    fs, hpath, jvm = _fs(spark, path)
    P = jvm.org.apache.hadoop.fs.Path
    old_p, tmp_p = P(f"{path}{suffix}.old"), P(f"{path}{suffix}.tmp")
    if not fs.exists(hpath) and fs.exists(old_p):
        if not fs.rename(old_p, hpath):
            raise IOError(f"swap crash repair failed for {path}")
    elif fs.exists(hpath):
        fs.delete(old_p, True)
    fs.delete(tmp_p, True)


def swap_overwrite(
    spark: SparkSession,
    df,
    path: str,
    table_format: str = "parquet",
    suffix: str = ".swap",
    partition_by: str | None = None,
) -> None:
    """Atomically replace a table with ``df`` — safe when ``df`` READS the
    table it replaces.

    Spark's ``mode("overwrite")`` deletes the target before writing, so a
    self-referential rewrite loses data, and materializing the frame first
    (localCheckpoint) holds the whole table in executor memory — O(corpus)
    per call, the exact cost the incremental fold exists to avoid.  Instead:
    stream df → ``<path><suffix>.tmp`` (main still readable), then swap via
    two renames with :func:`repair_swap` covering every crash window (the
    same discipline as compaction below; Iceberg's snapshot commit is the
    cluster-native equivalent behind the same table_format switch).
    """
    tmp, old = f"{path}{suffix}.tmp", f"{path}{suffix}.old"
    fs, hpath, jvm = _fs(spark, path)
    P = jvm.org.apache.hadoop.fs.Path
    fs.delete(P(tmp), True)
    w = df.write.mode("overwrite").format(table_format)
    if partition_by:
        w = w.partitionBy(partition_by)
    w.save(tmp)
    fs.delete(P(old), True)
    if fs.exists(hpath) and not fs.rename(hpath, P(old)):
        raise IOError(f"swap failed for {path} (main → .old)")
    if not fs.rename(P(tmp), hpath):
        # roll back so the table never disappears; if even the rollback
        # rename fails, fail LOUD with the recovery path — repair_swap also
        # restores from .old on the next run
        if fs.exists(P(old)) and not fs.rename(P(old), hpath):
            raise IOError(
                f"swap rollback ALSO failed for {path}; data is intact at "
                f"{old} — rename it back manually or rerun (entry repair "
                f"restores it)"
            )
        raise IOError(f"swap failed for {path} (.tmp → main)")
    fs.delete(P(old), True)


def _dir_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) of a table directory; (0, 0) if absent."""
    fs, hpath, _ = _fs(spark, path)
    if not fs.exists(hpath):
        return 0, 0
    n, size = 0, 0
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        n += 1
        size += st.getLen()
    return n, size


def compact_stage_tables(
    spark: SparkSession,
    checkpoint_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 8,
    tables: tuple[str, ...] = APPEND_TABLES,
) -> dict:
    """Rewrite fragmented stage tables to ~target-sized parquet files.

    Only tables whose data-file count exceeds both ``min_files`` and the
    size-implied file count are rewritten (an already-compact table is left
    untouched — compaction must be idempotent and cheap to schedule).
    Returns {table: {"files_before": n, "files_after": m, "bytes": b}} for
    the tables that were rewritten.
    """
    from pyspark.sql import functions as F

    loc = checkpoint_dir.rstrip("/")
    report: dict = {}
    for name in tables:
        path = f"{loc}/{name}"
        # crash repair BEFORE the skip checks: a kill between the two swap
        # renames leaves the data parked in <table>.compact.old with the
        # main path missing — without this, the next run would see
        # n_files == 0, skip, and the table would be silently lost forever
        repair_swap(spark, path, suffix=".compact")
        n_files, total = _dir_stats(spark, path)
        if n_files == 0:
            continue
        want = max(1, math.ceil(total / target_file_bytes))
        if n_files <= max(min_files, want):
            continue
        df = spark.read.parquet(path)
        # coalesce, not repartition: compaction must not shuffle the data it
        # rewrites — each output task concatenates whole input files.
        # Batch-partitioned tables (shingle_index writes one partition per
        # ingest batch) are folded into a single `compacted` partition so
        # the layout stays partitioned and future per-batch dynamic
        # overwrites keep working; their rows are also DE-DUPLICATED here
        # (index rows are unique by construction — (dst, sh) per doc — so a
        # full-row distinct only removes crash artifacts).  That dedup is
        # the one shuffle compaction performs, and it makes the index
        # self-healing: duplicate rows from a violated write discipline are
        # removed by the next compaction instead of accumulating.
        if "ingest_batch" in df.columns:
            # live-ingest guard (round-4): a batch partition whose fold has
            # NOT reached its identity commit yet is still subject to a
            # replay's per-partition dynamic overwrite — folding it into
            # `compacted` would strand a stale copy the replay cannot
            # replace (duplicated rows until the next self-healing dedup).
            # In-flight detection is observational, not a lock: a partition
            # is in-flight iff it carries a key (dst = file_id) absent from
            # the committed identity table; those partitions are carried
            # through compaction byte-identical, under their own names.
            inflight: list[str] = []
            id_fs, id_hpath, _ = _fs(spark, f"{loc}/identity")
            if "dst" in df.columns and id_fs.exists(id_hpath):
                ids = (
                    spark.read.parquet(f"{loc}/identity")
                    .select(F.col("file_id").alias("dst"))
                    .distinct()
                )
                inflight = [
                    r["ingest_batch"]
                    for r in df.join(ids, "dst", "left_anti")
                    .select("ingest_batch")
                    .distinct()
                    .collect()
                ]
            committed = (
                df.filter(~F.col("ingest_batch").isin(inflight))
                if inflight
                else df
            )
            out = (
                committed.drop("ingest_batch")
                .dropDuplicates()
                .withColumn("ingest_batch", F.lit("compacted"))
                .coalesce(want)
            )
            if inflight:
                out = out.unionByName(
                    df.filter(F.col("ingest_batch").isin(inflight))
                )
            swap_overwrite(
                spark, out, path, suffix=".compact",
                partition_by="ingest_batch",
            )
        else:
            swap_overwrite(
                spark, df.coalesce(want), path, suffix=".compact"
            )
        after, _ = _dir_stats(spark, path)
        report[name] = {
            "files_before": n_files,
            "files_after": after,
            "bytes": total,
        }
    return report
