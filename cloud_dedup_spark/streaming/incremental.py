"""Incremental ingest: Structured Streaming front-end for the batch pipeline.

The reference is strictly batch (one analyze() pass, SURVEY.md §2.9 — no
streaming anywhere), and the scaled engine keeps batch semantics: the
north_rule's resumability comes from checkpointed stage tables, not streaming
state.  What a corpus lake *does* need is incremental ingest — new files
appearing in the source location should update the exact-duplicate index
without recomputing the world.  That is a natural fit for
``readStream`` + ``foreachBatch``: each micro-batch runs the same
deterministic batch operators over the delta and MERGEs into the stage
tables (append-only parquet here; Iceberg MERGE INTO on a cluster).

Full near-dup incrementality (delta LSH join against the existing signature
index) is the designed extension: new files' band hashes join the existing
``signatures`` checkpoint — an equi-join, no rescan of old content.  Batch
operators are reused verbatim either way, which is the point: streaming here
is an ingestion mode, not a second engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cloud_dedup_spark.functions.normalize import with_identity
from cloud_dedup_spark.sources.files_source import FILES_SCHEMA


def stream_files(spark: SparkSession, location: str) -> DataFrame:
    """readStream over the files location (new parquet files = new rows)."""
    return (
        spark.readStream.schema(FILES_SCHEMA)
        .format("parquet")
        .load(location)
    )


def incremental_exact_index(
    spark: SparkSession,
    source_location: str,
    index_location: str,
    checkpoint_location: str,
    trigger_available_now: bool = True,
):
    """Maintain an append-only (content_sha256, file_id, repo, path) index.

    Each micro-batch computes identity columns for the delta only and appends
    to the index; exact-duplicate groups are then a groupBy over the index —
    the same computation as operators/exact.py, arriving incrementally.
    Returns the started StreamingQuery.
    """

    def upsert(batch: DataFrame, _batch_id: int) -> None:
        (
            with_identity(batch)
            .select("content_sha256", "file_id", "repo", "path")
            .write.mode("append")
            .parquet(index_location)
        )

    writer = (
        stream_files(spark, source_location)
        .writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_location)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
