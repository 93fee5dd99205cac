"""Stage-table compaction (plans/maintenance.py): append-grown checkpoint
tables are rewritten to few files with identical content, idempotently."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cloud_dedup_spark.plans.maintenance import (
    _MANIFEST,
    _dir_stats,
    _fs,
    _list_children,
    _write_manifest,
    compact_stage_tables,
    repair_swap,
    swap_overwrite,
)


def _write_fragmented(spark, path: str, n_slices: int = 12) -> None:
    for i in range(n_slices):
        spark.range(i * 100, (i + 1) * 100).select(
            F.col("id").alias("file_id"),
            F.sha2(F.col("id").cast("string"), 256).alias("content_sha256"),
        ).coalesce(1).write.mode("append").parquet(path)


def test_compaction_preserves_content_and_reduces_files(spark, tmp_path):
    loc = str(tmp_path / "state")
    _write_fragmented(spark, f"{loc}/identity")
    before = spark.read.parquet(f"{loc}/identity")
    n_before, _ = _dir_stats(spark, f"{loc}/identity")
    assert n_before >= 12
    before_rows = sorted(r["file_id"] for r in before.collect())

    report = compact_stage_tables(spark, loc, min_files=4)
    assert report["identity"]["files_before"] == n_before
    assert report["identity"]["files_after"] < n_before

    after = spark.read.parquet(f"{loc}/identity")
    assert sorted(r["file_id"] for r in after.collect()) == before_rows
    # no leftover tmp/old directories
    assert not os.path.exists(f"{loc}/identity.compact.tmp")
    assert not os.path.exists(f"{loc}/identity.compact.old")


def test_compaction_is_idempotent_and_skips_compact_tables(spark, tmp_path):
    loc = str(tmp_path / "state")
    _write_fragmented(spark, f"{loc}/signatures")
    first = compact_stage_tables(spark, loc, min_files=4)
    assert "signatures" in first
    # second run: already compact → untouched, empty report
    second = compact_stage_tables(spark, loc, min_files=4)
    assert second == {}


def test_compaction_ignores_missing_tables(spark, tmp_path):
    assert compact_stage_tables(spark, str(tmp_path / "nope")) == {}


def test_swap_restores_concurrent_append(spark, tmp_path):
    """A slice appended AFTER the rewrite pinned its snapshot (i.e. while the
    compaction ran) travels into `.old` with the swap and is moved back into
    the new table by the manifest restore instead of being deleted."""
    loc = str(tmp_path / "state")
    path = f"{loc}/identity"
    _write_fragmented(spark, path, n_slices=6)
    fs, _, jvm = _fs(spark, path)
    snapshot = _list_children(fs, jvm, path)
    pinned = spark.read.parquet(*[f"{path}/{c}" for c in snapshot]).coalesce(2)
    # concurrent append: lands after the snapshot listing, so it is provably
    # not inside `pinned` (explicit file list) — the race the manifest closes
    spark.range(10_000, 10_100).select(
        F.col("id").alias("file_id"),
        F.sha2(F.col("id").cast("string"), 256).alias("content_sha256"),
    ).coalesce(1).write.mode("append").parquet(path)
    swap_overwrite(spark, pinned, path, suffix=".compact", snapshot=snapshot)
    after = sorted(r["file_id"] for r in spark.read.parquet(path).collect())
    assert after == list(range(600)) + list(range(10_000, 10_100))
    # restore fully cleaned up: no manifest, no .old left behind
    assert not os.path.exists(f"{path}/{_MANIFEST}")
    assert not os.path.exists(f"{path}.compact.old")
    assert not os.path.exists(f"{path}.compact.tmp")


def test_repair_swap_finishes_interrupted_restore(spark, tmp_path):
    """Crash window: second rename done, restore not — the new table carries
    a manifest and `.old` still exists.  Entry repair must move the
    concurrently-written (unlisted) children in, drop the listed ones, and
    clean up the manifest."""
    loc = str(tmp_path / "state")
    path = f"{loc}/identity"
    _write_fragmented(spark, path, n_slices=3)
    fs, _, jvm = _fs(spark, path)
    old = f"{path}.compact.old"
    # `.old` holds two slices; pretend the compaction READ the first one
    # (listed in the manifest → dropped) but not the second (concurrent
    # write → restored)
    spark.range(500, 550).select(
        F.col("id").alias("file_id"),
        F.sha2(F.col("id").cast("string"), 256).alias("content_sha256"),
    ).coalesce(1).write.mode("append").parquet(old)
    listed_children = set(_list_children(fs, jvm, old))
    spark.range(550, 600).select(
        F.col("id").alias("file_id"),
        F.sha2(F.col("id").cast("string"), 256).alias("content_sha256"),
    ).coalesce(1).write.mode("append").parquet(old)
    _write_manifest(
        fs, jvm, path, _list_children(fs, jvm, path) + sorted(listed_children)
    )
    repair_swap(spark, path, suffix=".compact")
    after = sorted(r["file_id"] for r in spark.read.parquet(path).collect())
    assert after == list(range(300)) + list(range(550, 600))
    assert not os.path.exists(f"{path}/{_MANIFEST}")
    assert not os.path.exists(old)
    # idempotent: a second repair pass is a no-op
    repair_swap(spark, path, suffix=".compact")
    assert sorted(
        r["file_id"] for r in spark.read.parquet(path).collect()
    ) == after


def _write_index_slice(spark, path: str, batch: str, dsts: list[int]) -> None:
    rows = [(d, 10, f"sh_{d}_{i}") for d in dsts for i in range(3)]
    (
        spark.createDataFrame(rows, "dst long, hay_tokens int, sh string")
        .coalesce(1)
        .write.mode("append")
        .parquet(f"{path}/ingest_batch={batch}")
    )


def test_compaction_mid_stream_preserves_inflight_batch(spark, tmp_path):
    """VERDICT round-3 item 6: compacting WHILE ingest is live must not
    strand a batch partition whose fold has not committed identity yet —
    a replay of that fold dynamic-overwrites its own partition, and a copy
    folded into `compacted` would be unreachable to that overwrite
    (duplicate rows).  The guard keeps in-flight partitions under their own
    names; committed partitions fold into `compacted` (deduplicated)."""
    loc = str(tmp_path / "state")
    idx = f"{loc}/shingle_index"
    # committed corpus: identity knows dst 1..6
    spark.createDataFrame(
        [(d,) for d in range(1, 7)], "file_id long"
    ).write.mode("overwrite").parquet(f"{loc}/identity")
    # fragmented committed partitions — incl. a planted duplicate slice in
    # `base` (crash artifact) that the self-healing dedup must remove
    _write_index_slice(spark, idx, "base", [1, 2])
    _write_index_slice(spark, idx, "base", [1, 2])
    _write_index_slice(spark, idx, "base", [3])
    _write_index_slice(spark, idx, "b_1", [4])
    _write_index_slice(spark, idx, "b_1", [5, 6])
    # in-flight fold: index written, identity commit NOT yet — dst 99 is
    # absent from the identity table
    _write_index_slice(spark, idx, "b_2x", [99])
    report = compact_stage_tables(
        spark, loc, min_files=2, tables=("shingle_index",)
    )
    assert "shingle_index" in report
    # in-flight partition survived under its own name
    assert os.path.exists(f"{idx}/ingest_batch=b_2x")
    after = spark.read.parquet(idx)
    parts = {
        r["ingest_batch"]
        for r in after.select("ingest_batch").distinct().collect()
    }
    assert parts == {"compacted", "b_2x"}
    # committed rows deduplicated into `compacted`; in-flight rows intact
    assert after.filter(F.col("ingest_batch") == "compacted").count() == 18
    assert after.filter(F.col("dst") == 99).count() == 3
    # the replayed fold dynamic-overwrites ITS OWN partition — must replace
    # the carried-through copy wholesale (no duplicates), exactly as the
    # incremental path writes it
    replay = spark.createDataFrame(
        [(99, 10, f"sh_99_{i}", "b_2x") for i in range(3)],
        "dst long, hay_tokens int, sh string, ingest_batch string",
    )
    (
        replay.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_batch")
        .parquet(idx)
    )
    final = spark.read.parquet(idx)
    assert final.count() == 18 + 3
    assert final.filter(F.col("dst") == 99).count() == 3


def test_repair_skips_under_fresh_lock_and_clears_stale(spark, tmp_path):
    """The advisory compaction lock: a fold's entry repair must NOT race a
    live compaction's swap (fresh lock → no-op), but a crash-leftover lock
    past the TTL is cleared and repair proceeds."""
    from cloud_dedup_spark.plans.maintenance import _LOCK_TTL_MS, _take_lock

    loc = str(tmp_path / "state")
    path = f"{loc}/identity"
    _write_fragmented(spark, path, n_slices=3)
    fs, _, jvm = _fs(spark, path)
    P = jvm.org.apache.hadoop.fs.Path
    # park the table in the mid-swap crash state: main gone, data in `.old`
    assert fs.rename(P(path), P(f"{path}.compact.old"))
    _take_lock(fs, jvm, path, ".compact")
    repair_swap(spark, path, suffix=".compact")
    # fresh lock → repair refused to touch the live protocol
    assert not os.path.exists(path)
    assert os.path.exists(f"{path}.compact.old")
    # backdate the lock past the TTL → stale: cleared, repair proceeds
    old_ms = jvm.java.lang.System.currentTimeMillis() - _LOCK_TTL_MS - 60_000
    fs.setTimes(P(f"{path}.compact.lock"), old_ms, -1)
    repair_swap(spark, path, suffix=".compact")
    assert os.path.exists(path)
    assert not os.path.exists(f"{path}.compact.old")
    assert not os.path.exists(f"{path}.compact.lock")
    assert spark.read.parquet(path).count() == 300


def test_compaction_skips_foreign_locked_table(spark, tmp_path):
    from cloud_dedup_spark.plans.maintenance import _take_lock

    loc = str(tmp_path / "state")
    path = f"{loc}/signatures"
    _write_fragmented(spark, path)
    fs, _, jvm = _fs(spark, path)
    _take_lock(fs, jvm, path, ".compact")
    # another compactor owns the table → left alone this run
    assert compact_stage_tables(spark, loc, min_files=4) == {}
