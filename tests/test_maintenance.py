"""Stage-table compaction (plans/maintenance.py): append-grown checkpoint
tables are rewritten to few files with identical content, idempotently."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cloud_dedup_spark.plans.maintenance import compact_stage_tables, _dir_stats


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
