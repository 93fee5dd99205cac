"""Event-stream operators: gap-based sessionization + JSON-prop extraction.

The reference engine is file-corpus-only, but the engine's `events` table
(TESTDATA.md) models the other half of a training-data lake: append-only
interaction/telemetry logs.  Two operators a 100 TB log pipeline needs:

``sessionize`` — classic gap-based sessionization (a session ends after
``gap_seconds`` of user inactivity).  Pure window functions: one shuffle on
the session key (``user_id``), then lag → boundary flag → running sum →
group.  No state store and no UDF; at scale the single hash-partition by
user_id is the minimum possible data movement for this computation, and
skew (a bot user with millions of events) is bounded because the window is
a linear scan per key, not a self-join.

``json_prop_buckets`` — schema-on-read extraction from a JSON string
column (``get_json_object``, JVM-side Jackson; no Python) straight into an
aggregate.  The common "pull one field out of a props blob" log query,
kept entirely inside whole-stage codegen.

Both are ANSI-SQL-expressible, so the driver hash-checks them against
DuckDB twins (__spark_entry__.py) — unlike the dedup channels, these have
full value-level oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Per-user gap-based sessions: a new session starts when the time since
    the user's previous event exceeds ``gap_seconds``.

    Timestamps are compared at MICROSECOND precision (``unix_micros``) so
    the arithmetic is exact integer math — identical in any engine (the
    DuckDB oracle uses ``epoch_us``); float epoch seconds would make the
    boundary flag engine-dependent for sub-second gaps.

    Output: one row per (user, session) with
    ``session_seq`` (1-based per-user ordinal), ``start_us``/``end_us``
    (microsecond epochs), ``n_events``, ``sum_value``.

    Plan shape: one exchange on ``user_col``, two window passes over the
    sorted partition (lag + running sum reuse the same sort), one partial
    aggregation.  The running sum uses ``rowsBetween(unboundedPreceding,
    currentRow)`` explicitly — the default RANGE frame would tie identical
    timestamps together.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    # TIMESTAMP_NTZ (the lake's storage type): pure wall-clock microsecond
    # arithmetic against the NTZ epoch — no session-timezone dependence, and
    # exactly DuckDB's epoch_us semantics for naive timestamps.  Regular
    # TIMESTAMP: unix_micros is the absolute instant.
    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        us = F.expr(
            f"timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
        )
    else:
        us = F.unix_micros(F.col(ts_col))
    gap_us = F.lit(int(gap_seconds) * 1_000_000)
    new_sess = F.when(
        (us - F.lag(us).over(w)).isNull() | ((us - F.lag(us).over(w)) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    seq = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.withColumn("_us", us)
        .withColumn("session_seq", seq)
        .groupBy(user_col, "session_seq")
        .agg(
            F.min("_us").alias("start_us"),
            F.max("_us").alias("end_us"),
            F.count(F.lit(1)).alias("n_events"),
            # decimal sum: order-independent to the cent regardless of the
            # engine's partial-aggregation order (the supplier_part_span
            # double-sum lesson)
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
    )


def json_prop_buckets(
    events: DataFrame,
    prop_path: str = "$.k",
    n_buckets: int = 10,
) -> DataFrame:
    """Extract one numeric field from the ``props`` JSON column and roll up
    (event_type, field % n_buckets) — count + value sum per bucket.

    ``get_json_object`` runs JVM-side (Jackson) inside codegen; a malformed
    or missing field yields NULL, which lands in its own NULL bucket rather
    than dropping the row (auditable, not silent).
    """
    k = F.get_json_object("props", prop_path).cast("bigint")
    return (
        events.withColumn("k_bucket", k % n_buckets)
        .groupBy("event_type", "k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
    )
