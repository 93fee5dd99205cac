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
APPEND_TABLES = ("identity", "signatures", "norm", "bands", "shingle_index")


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


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
    loc = checkpoint_dir.rstrip("/")
    report: dict = {}
    for name in tables:
        path = f"{loc}/{name}"
        # crash repair BEFORE the skip checks: a kill between the two swap
        # renames leaves the data parked in <table>.compact.old with the
        # main path missing — without this, the next run would see
        # n_files == 0, skip, and the table would be silently lost forever
        fs, hpath, jvm = _fs(spark, path)
        P = jvm.org.apache.hadoop.fs.Path
        old_p, tmp_p = P(f"{path}.compact.old"), P(f"{path}.compact.tmp")
        if not fs.exists(hpath) and fs.exists(old_p):
            if not fs.rename(old_p, hpath):
                raise IOError(f"crash repair failed for {path}")
        elif fs.exists(hpath):
            # crash AFTER the tmp→main rename but before the .old cleanup
            # leaves a full stale copy behind — drop it here so it cannot
            # linger for the lifetime of a rarely-fragmenting table
            fs.delete(old_p, True)
        fs.delete(tmp_p, True)  # a stale tmp is always safe to drop
        n_files, total = _dir_stats(spark, path)
        if n_files == 0:
            continue
        want = max(1, math.ceil(total / target_file_bytes))
        if n_files <= max(min_files, want):
            continue
        df = spark.read.parquet(path)
        tmp = f"{path}.compact.tmp"
        old = f"{path}.compact.old"
        # coalesce, not repartition: compaction must not shuffle the data it
        # rewrites — each output task concatenates whole input files.
        # Batch-partitioned tables (shingle_index writes one partition per
        # ingest batch) are folded into a single `compacted` partition so
        # the layout stays partitioned and future per-batch dynamic
        # overwrites keep working; their rows are also DE-DUPLICATED here
        # (index rows are unique by construction — (dst, sh) per doc — so a
        # full-row distinct only removes crash artifacts, e.g. a batch that
        # replayed after its partition was folded away).  That dedup is the
        # one shuffle compaction performs, and it makes the index
        # self-healing: run compaction while ingest is drained AND the last
        # batch's identity append committed; if that discipline is ever
        # violated, the duplicate rows it can create are removed by the
        # next compaction instead of accumulating.
        if "ingest_batch" in df.columns:
            from pyspark.sql import functions as F

            (
                df.drop("ingest_batch")
                .dropDuplicates()
                .withColumn("ingest_batch", F.lit("compacted"))
                .coalesce(want)
                .write.mode("overwrite")
                .partitionBy("ingest_batch")
                .parquet(tmp)
            )
        else:
            df.coalesce(want).write.mode("overwrite").parquet(tmp)
        fs.delete(P(old), True)
        if not fs.rename(hpath, P(old)):
            raise IOError(f"compaction swap failed for {path}")
        if not fs.rename(P(tmp), hpath):
            # roll back so the table never disappears; if even the rollback
            # rename fails, fail LOUD with the recovery path — the entry
            # repair above also restores from .compact.old on the next run
            if not fs.rename(P(old), hpath):
                raise IOError(
                    f"compaction rollback ALSO failed for {path}; data is "
                    f"intact at {old} — rename it back manually or rerun "
                    f"compact_stage_tables (entry repair restores it)"
                )
            raise IOError(f"compaction swap failed for {path}")
        fs.delete(P(old), True)
        after, _ = _dir_stats(spark, path)
        report[name] = {
            "files_before": n_files,
            "files_after": after,
            "bytes": total,
        }
    return report
