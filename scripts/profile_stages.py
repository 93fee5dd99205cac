"""Decompose the pipeline's fixed-floor stages into timed sub-steps.

Usage: PYTHONPATH=/root/repo python scripts/profile_stages.py [cpus] [corpus]

Times each sub-materialization of the candidate_edges and substring_edges
stages (and the identity/signature inputs they depend on) so the
parallelism-independent floor (BENCH/ANALYSIS.md) can be attributed to
specific jobs rather than guessed at.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cloud_dedup_spark.config import DedupConfig
from cloud_dedup_spark.functions.normalize import with_identity
from cloud_dedup_spark.operators.candidates import explode_bands, lsh_candidate_pairs
from cloud_dedup_spark.operators.exact import exact_duplicate_clusters
from cloud_dedup_spark.operators.signatures import compute_signatures
from cloud_dedup_spark.operators.substring import substring_edges
from cloud_dedup_spark.operators.verify import verify_pairs
from cloud_dedup_spark.session import build_session


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    corpus = sys.argv[2] if len(sys.argv) > 2 else "/tmp/cloud_dedup_bench_corpus_v4_240000_42"
    spark = build_session(
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    cfg = DedupConfig()
    par = spark.sparkContext.defaultParallelism

    t_all = time.time()

    def step(name, thunk):
        t0 = time.time()
        out = thunk()
        print(f"  {name}: {time.time() - t0:.2f}s")
        return out

    files = spark.read.parquet(corpus)
    files.count()

    # warm-up
    from cloud_dedup_spark.corpus import corpus_df
    warm, _ = corpus_df(spark, 300, seed=7)
    from cloud_dedup_spark.plans.pipeline import run_pipeline
    run_pipeline(spark, warm, track_rows=False)["assignments"].write.format(
        "noop"
    ).mode("overwrite").save()
    print(f"warmup done ({time.time()-t_all:.1f}s), cpus={cpus}")

    t0 = time.time()
    files_w = files.repartition(par * 2)
    identity = step("identity build+ckpt", lambda: with_identity(files_w).localCheckpoint())
    exact = step("exact build+ckpt", lambda: exact_duplicate_clusters(identity).localCheckpoint())
    reps = identity.join(exact.filter("is_exact_rep").select("file_id"), "file_id")
    sigs = step(
        "signatures build+ckpt",
        lambda: compute_signatures(reps.repartition(par * 4), cfg).localCheckpoint(),
    )

    # --- candidate_edges decomposition ---
    print("candidate_edges:")
    bands = explode_bands(sigs)
    sizes = step("  band sizes (groupBy count)", lambda: bands.groupBy("band_key").agg(
        F.count(F.lit(1)).alias("bucket_n")).localCheckpoint())
    pairs = step("  lsh_candidate_pairs full", lambda: lsh_candidate_pairs(sigs, cfg).localCheckpoint())
    print(f"    (pairs rows: {pairs.count()})")
    verified = step("  verify_pairs", lambda: verify_pairs(pairs, sigs, cfg).localCheckpoint())

    # --- substring decomposition ---
    print("substring_edges:")
    base = sigs.select("file_id", "shingles", "n_shingles", "n_tokens").filter(
        F.col("n_shingles") > 0)
    inverted = base.select(F.col("file_id").alias("dst"),
                           F.col("n_tokens").alias("hay_tokens"),
                           F.explode("shingles").alias("sh"))
    K = 8
    cand_anchors = base.filter(F.col("n_tokens") >= cfg.substring_min_tokens).select(
        F.col("file_id").alias("src"), F.col("n_tokens").alias("needle_tokens"),
        F.explode(F.slice(F.array_sort("shingles"), 1, K)).alias("sh"))
    anchor_values = step("  anchor_values distinct", lambda: cand_anchors.select("sh").distinct().localCheckpoint())
    doc_freq = step("  doc_freq (index scan 1)", lambda: inverted.join(
        F.broadcast(anchor_values), "sh", "left_semi").groupBy("sh").agg(
        F.count(F.lit(1)).alias("df")).localCheckpoint())
    anchors = step("  anchors argmin", lambda: cand_anchors.join(F.broadcast(doc_freq), "sh")
        .groupBy("src", "needle_tokens").agg(F.min(F.struct("df", "sh")).alias("m"))
        .filter(F.col("m.df") <= cfg.substring_max_anchor_df)
        .select("src", "needle_tokens", F.col("m.sh").alias("sh")).localCheckpoint())
    sub = step("  full substring_edges", lambda: substring_edges(
        identity.join(exact.filter("is_exact_rep").select("file_id"), "file_id"),
        sigs, cfg).localCheckpoint())
    print(f"total decomposed: {time.time()-t0:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
