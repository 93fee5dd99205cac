"""Benchmark runner: headline queries + the dedup pipeline, one JSON line.

Env:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] parallelism (default 32)
  BENCH_FILES          synthetic corpus size for the pipeline bench (default 4000)

Prints exactly one JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "files_per_sec": ...,
   "parallelism": N}

Each query is forced end-to-end with the noop sink (full computation, no
driver collect).  The scaling-efficiency protocol (BASELINE.md) runs this
twice — SPARK_GRAFT_CPUS=8 then 32 — on identical input; see
scripts/bench_scaling.py which records BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from cloud_dedup_spark import run_pipeline  # noqa: E402
from cloud_dedup_spark.corpus import bench_corpus_df  # noqa: E402
from cloud_dedup_spark.session import build_session  # noqa: E402

# headline subset: the scale-relevant queries (full list in queries())
HEADLINE = (
    "lineitem_pricing",
    "latest_order_per_customer",
    "supplier_part_span",
    "events_rollup",
    "user_sessions",
    "text_profile",
    "prefix_fp_groups",
    "substring_doc_pairs",
    "ngram_jaccard_pairs",
    "contaminated_docs",
    "vocab_topk",
    "lang_quality_rollup",
    "unique_docs",
    "dedup_keepers_quality",
    "media_dup_groups",
    "media_near_pairs",
    "ann_topk",
    "emb_near_pairs",
    "emb_near_pairs_lsh",
    "emb_near_pairs_ivf",
    "ann_topk_ivf",
)


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _all_job_ids(spark) -> set[int]:
    """Every Spark job id the UI store has seen (fold job-floor evidence)."""
    spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
    store = spark._jsc.sc().statusStore()
    it = store.jobsList(None).iterator()
    ids = set()
    while it.hasNext():
        ids.add(it.next().jobId())
    return ids


def _burn(n: int) -> int:
    x = 0
    for _ in range(n):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFF
    return x


def _calibrate(spark, cpus: int) -> dict:
    """In-band host/Spark window probes (round-3 verdict item 3).

    BENCH_r03's headline landed in a degraded host window (±4× swings on
    unchanged code, BENCH/ANALYSIS.md) and nothing in the artifact itself
    said so.  These two probes — a no-Spark busy loop at the bench's
    concurrency and a pure-codegen sha2 job in the live session — are
    load-invariant software-wise, so their absolute seconds calibrate the
    window: compare them across rounds before reading any query delta.
    Run once before and once after the timed section (the contamination
    observed in round 3 drifted over ~90 minutes)."""
    import multiprocessing

    from pyspark.sql import functions as F

    t0 = time.time()
    with multiprocessing.Pool(cpus) as p:
        p.map(_burn, [20_000_000] * cpus)
    busy = round(time.time() - t0, 3)

    df = spark.range(30_000_000).select(
        F.sha2(F.col("id").cast("string"), 256).alias("h")
    )
    _force(df)  # JIT warm
    codegen = float("inf")
    # min-of-2: one timed run can eat a transient stall (a 106 s outlier was
    # observed right at session start against 0.49 s steady-state) and then
    # misreport the whole window as degraded; sustained degradation still
    # shows in both runs
    for _ in range(2):
        t0 = time.time()
        _force(df)
        codegen = min(codegen, round(time.time() - t0, 3))
    return {"busy_loop_sec": busy, "codegen_sha2_sec": codegen}


def main() -> None:
    # bench sessions opt into the measurement-grade config regardless of the
    # caller's environment: pre-sized heap and tmpfs shuffle scratch (its
    # own explicit flag; library users on small-/dev/shm hosts keep the safe
    # /tmp default — a bare `python bench.py` must not silently measure the
    # jittery-disk configuration)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    os.environ.setdefault("SPARK_GRAFT_TMPFS", "1")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # large enough that pipeline throughput reflects compute, not the
    # per-stage latency floor (48k under-reports by ~2×: checkpoint round
    # trips dominate when the stage tables are tiny — BENCH/ANALYSIS.md);
    # distributed generation makes the bigger corpus cheap to materialize
    bench_files = int(os.environ.get("BENCH_FILES", "240000"))

    spark = build_session(
        app_name="cloud-dedup-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    try:
        queries = entrymod.queries()
        only_pipeline = os.environ.get("BENCH_ONLY_PIPELINE") == "1"
        # Full untimed warm pass over the headline list: a fresh 48 GB JVM
        # runs ~6-14× slow for its first minute or two (heap growth + JIT;
        # the pre/post calibration pair below showed 6.7 s vs 0.47 s for the
        # same probe), and with only a single-query warm-up that cold window
        # was charged to whichever queries ran first.
        for name in () if only_pipeline else HEADLINE:
            _force(queries[name](spark, sf_dir))
        calib_pre = _calibrate(spark, cpus)
        timings: dict[str, float] = {}
        # best-of-2 per query: single-shot headline numbers on this shared
        # box swing ±30% with neighbor load (a round-3 preview measured the
        # embedding queries 3-4× slower inside one bad window than in
        # isolation minutes later); the pipeline below already takes the
        # best of BENCH_REPEATS for the same reason
        q_repeats = int(os.environ.get("BENCH_QUERY_REPEATS", "2"))
        for name in () if only_pipeline else HEADLINE:
            best = float("inf")
            for _ in range(q_repeats):
                t0 = time.time()
                _force(queries[name](spark, sf_dir))
                best = min(best, round(time.time() - t0, 3))
            timings[name] = best

        # dedup pipeline throughput on the synthetic planted corpus.
        # The corpus is generated once and cached as parquet so repeat runs
        # (and both parallelism levels of the scaling protocol) read the
        # identical input bytes.
        corpus_path = f"/tmp/cloud_dedup_bench_corpus_v4_{bench_files}_42"
        if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
            # distributed generation (mapInPandas over seed blocks): 10^6-file
            # corpora materialize in ~20 s instead of ~10 min driver-side
            gen = bench_corpus_df(spark, bench_files, seed=42)
            gen.write.mode("overwrite").parquet(corpus_path)
        files = spark.read.parquet(corpus_path)
        n_files = files.count()

        # warm-up: run the full pipeline on a mid-size corpus first.  A tiny
        # (300-file) warmup JIT-compiles nothing past C1: measured 16-core
        # repeats then ramp 241 s → 133 s → 120 s as C2 keeps tiering up the
        # generated stage code DURING the timed runs — and the penalty is
        # parallelism-dependent (fewer rows per core at high N → later
        # tier-up), which systematically depresses measured scaling.  24k
        # files (~10 s) pushes every codegen'd stage past the C2 thresholds.
        warm = bench_corpus_df(spark, 24_000, seed=7)
        _force(run_pipeline(spark, warm, track_rows=False)["assignments"])

        # best-of-N: single-run noise on a shared box is ±30%; the best run
        # is the steady-state capability (BENCH_REPEATS=1 for quick checks)
        # Stage tables go to parquet on tmpfs (the production-faithful
        # resumable mode): columnar + compressed + column-prunable, so stage
        # scans read only the columns they need and the JVM heap never holds
        # deserialized shingle rows.  The in-memory localCheckpoint mode is
        # fine at test scale but measurably superlinear ≥10^6 files (boxed
        # array rows → GC thrash).  Wiped per repeat so no stage is skipped.
        import gc
        import shutil

        ckpt_base = os.environ.get(
            "BENCH_CKPT_DIR",
            "/dev/shm/cloud_dedup_bench_ckpt"
            if os.path.isdir("/dev/shm")
            else "/tmp/cloud_dedup_bench_ckpt",
        )
        # 3 repeats: this host's parallel capacity swings with neighbor load
        # (hardware-ceiling calibration measured 0.70-0.98 across windows,
        # BENCH/ANALYSIS.md); the best repeat is the steady-state capability
        repeats = int(os.environ.get("BENCH_REPEATS", "3"))
        pipe_sec = float("inf")
        for _ in range(repeats):
            shutil.rmtree(ckpt_base, ignore_errors=True)
            t0 = time.time()
            res = run_pipeline(
                spark, files, track_rows=False, checkpoint_dir=ckpt_base
            )
            _force(res["assignments"])
            pipe_sec = min(pipe_sec, round(time.time() - t0, 3))
            # drop per-repeat state (cluster-stage localCheckpoints) before
            # the next run: accumulated storage poisons later repeats
            del res
            gc.collect()
            spark._jvm.System.gc()
        # the last repeat's checkpoint is kept: the fold below ingests into it
        timings["dedup_pipeline"] = pipe_sec

        # incremental fold throughput: the O(delta) path folding a 1% delta
        # into the checkpoint the last pipeline repeat left behind.  Paths
        # are prefixed so natural keys never collide with the base corpus
        # (a colliding key would be dropped by the fold's idempotency guard
        # and the measurement would silently shrink).
        # BENCH_SKIP_FOLD=1 omits this section (and its JSON keys): the
        # scaling protocol's fold numbers are non-gating context, and on a
        # host whose measurement windows flip every ~15-30 min the ~6-8 min
        # of fold exposure per two-leg run is the difference between
        # fitting a quiet window and being rejected by it.
        skip_fold = os.environ.get("BENCH_SKIP_FOLD") == "1"
        from pyspark.sql import functions as _F

        from cloud_dedup_spark.streaming.incremental import (
            incremental_dedup_update,
        )

        fold_metrics: dict = {}
        delta_n = max(1_000, bench_files // 100)
        if skip_fold:
            delta = None
        else:
            delta = bench_corpus_df(spark, delta_n, seed=4242).withColumn(
                "path", _F.concat(_F.lit("inc/"), _F.col("path"))
            ).localCheckpoint()  # materialize: generation is not the fold
        # untimed bootstrap fold: the FIRST fold on a batch-pipeline
        # checkpoint pays the one-time O(corpus) shingle_index build (the
        # batch pipeline keeps no inverted index); timing that would report
        # corpus index construction as "fold throughput".  A 1-file fold
        # triggers the bootstrap so the timed fold below is the steady-state
        # O(delta) path.
        if not skip_fold:
            boot = bench_corpus_df(spark, 1, seed=555).withColumn(
                "path", _F.concat(_F.lit("boot/"), _F.col("path"))
            )
            incremental_dedup_update(spark, boot, ckpt_base)
            jobs_before = _all_job_ids(spark)
            t0 = time.time()
            inc = incremental_dedup_update(spark, delta, ckpt_base)
            fold_sec = round(time.time() - t0, 3)
            # n_delta should equal delta_n (unique prefixed keys); a
            # shortfall means key collisions shrank the fold — flag, don't
            # crash the bench
            if inc["n_delta"] != delta_n:
                print(f"WARNING: fold ingested {inc['n_delta']}/{delta_n} rows")
            timings["incremental_fold"] = fold_sec
            fold_metrics = {
                "fold_files_per_sec": round(delta_n / fold_sec, 1),
                "fold_delta_files": delta_n,
                # every DAG job the fold schedules, including AQE-stage and
                # broadcast-build materializations (~30 of these are driver
                # actions; see BENCH/ANALYSIS.md round-5 decomposition —
                # per-job scheduling is milliseconds, not the latency story)
                "fold_jobs": len(_all_job_ids(spark) - jobs_before),
            }
        shutil.rmtree(ckpt_base, ignore_errors=True)

        calib_post = _calibrate(spark, cpus)
        total = round(sum(timings.values()), 3)
        print(
            json.dumps(
                {
                    "metric": "headline queries + dedup pipeline wall time",
                    "value": total,
                    "unit": "sec",
                    "queries": timings,
                    "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
                    "files_per_sec": round(n_files / pipe_sec, 1),
                    **fold_metrics,
                    "bench_files": n_files,
                    "parallelism": cpus,
                    # window self-calibration (pre/post the timed section):
                    # absolute probe seconds comparable across rounds — if
                    # these drift vs prior BENCH_rN, the window was degraded
                    # and query deltas are host noise, not code (round-3
                    # verdict item 3; BENCH/ANALYSIS.md has the evidence)
                    "calibration": {"pre": calib_pre, "post": calib_post},
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
