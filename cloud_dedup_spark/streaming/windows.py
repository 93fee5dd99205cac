"""Event-time windowed ingest statistics with watermarked late-data handling.

The ingest monitoring companion to the stateful dup counter: per event-time
window and language, how many files arrived and roughly how many distinct
content hashes they carried.  Structured Streaming's canonical
watermark + window pattern:

  * event-time column (ingest/commit timestamp from the source), NOT
    processing time — results are replay-deterministic;
  * ``withWatermark`` bounds state: a window's aggregation state is dropped
    once the watermark (max event time − delay) passes its end, so state
    size is O(active windows), not O(history) — the property that lets this
    run forever at 10^12-file scale;
  * late rows within the delay still merge into their window; rows later
    than the delay are dropped by contract (the batch pipeline picks them up
    at the next full run — streaming stats are operational telemetry, not
    the source of truth);
  * ``approx_count_distinct`` (HLL) for the hash cardinality — exact
    distinct inside a streaming window would hold every hash in state.

Output modes: ``append`` emits each window once, when the watermark closes
it (the mode a downstream alerting sink wants); ``update`` emits running
refinements.  Tests drive availableNow micro-batches through both the
on-time and the too-late path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloud_dedup_spark.functions.agg import money_sum
from cloud_dedup_spark.functions.normalize import with_identity


def windowed_ingest_profile(
    stream: DataFrame,
    ts_col: str = "ingest_ts",
    window_duration: str = "10 minutes",
    watermark_delay: str = "20 minutes",
) -> DataFrame:
    """Per (event-time window, lang): arrivals + approximate distinct hashes.

    ``stream``: streaming files frame carrying an event-time column
    ``ts_col`` (timestamp).  Returns an aggregated streaming frame with
    columns (window_start, window_end, lang, n_files, approx_uniq_hashes);
    pair with ``outputMode("append")`` for emit-once-per-closed-window.
    """
    identified = with_identity(stream).select(
        F.col(ts_col), "lang", "content_sha256"
    )
    return (
        identified.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(ts_col, window_duration).alias("w"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.approx_count_distinct("content_sha256").alias(
                "approx_uniq_hashes"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_files",
            "approx_uniq_hashes",
        )
    )


def streaming_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of :func:`operators.events.sessionize`: per-user
    gap-based sessions via Spark's native ``session_window`` — the dynamic-
    width event-time window that EXTENDS while events keep arriving within
    ``gap`` and closes after ``gap`` of silence.

    The engine merges overlapping session fragments across micro-batches in
    the state store, so a session spanning many batches still emits as ONE
    row; the watermark closes (and emits, in append mode) a session once no
    in-gap event can still arrive, and bounds state to open sessions —
    O(active users), not O(history).  Batch/stream parity: on a static
    frame the same expression computes the identical sessions (pinned
    against ``sessionize`` in tests/test_streaming.py — the window-function
    batch operator and the session-window streaming operator agree on
    boundaries, counts, and sums) **for non-NULL event times**.  NULL-ts
    events are dropped EXPLICITLY here (watermark semantics are undefined
    without an event time; session_window silently discarded them anyway —
    round-4 review made the drop visible), whereas the batch ``sessionize``
    gives each NULL-ts event its own session — a consumer reconciling the
    two must exclude NULL-ts rows on the batch side.

    Returns (user_id, session_start, session_end, n_events, sum_value);
    pair with ``outputMode("append")`` for emit-once-per-closed-session.
    """
    return (
        events.filter(F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value").alias("sum_value"),
        )
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
