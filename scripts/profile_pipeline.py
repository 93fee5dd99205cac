"""Per-stage wall-time profile of the full pipeline, bench-faithful.

Usage: PYTHONPATH=/root/repo python scripts/profile_pipeline.py [cpus] [files]

Runs exactly what bench.py times (parquet stage checkpoints on tmpfs, 24k-file
JIT warmup, repeats with wiped checkpoints) but prints the per-stage second
breakdown from RunMetrics, so scaling work attacks measured seconds instead of
guessed ones.  Run it at two parallelism levels and diff the columns: stages
whose seconds don't shrink 4→16 are the scaling gap.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloud_dedup_spark.corpus import bench_corpus_df
from cloud_dedup_spark.plans.pipeline import run_pipeline
from cloud_dedup_spark.session import build_session


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    repeats = int(os.environ.get("BENCH_REPEATS", "2"))
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    os.environ.setdefault("SPARK_GRAFT_TMPFS", "1")
    spark = build_session(
        app_name="profile-pipeline",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    corpus_path = f"/tmp/cloud_dedup_bench_corpus_v4_{n_files}_42"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        bench_corpus_df(spark, n_files, seed=42).write.mode("overwrite").parquet(
            corpus_path
        )
    files = spark.read.parquet(corpus_path)
    files.count()

    warm = bench_corpus_df(spark, 24_000, seed=7)
    run_pipeline(spark, warm, track_rows=False)["assignments"].write.format(
        "noop"
    ).mode("overwrite").save()

    ckpt = "/dev/shm/cloud_dedup_profile_ckpt" if os.path.isdir("/dev/shm") else "/tmp/cloud_dedup_profile_ckpt"
    best: dict | None = None
    for i in range(repeats):
        shutil.rmtree(ckpt, ignore_errors=True)
        t0 = time.time()
        res = run_pipeline(spark, files, track_rows=False, checkpoint_dir=ckpt)
        res["assignments"].write.format("noop").mode("overwrite").save()
        wall = round(time.time() - t0, 3)
        stages = {s.name: s.seconds for s in res["metrics"].stages}
        stages["_force_assignments"] = round(
            wall - sum(stages.values()), 3
        )
        print(f"repeat {i}: wall={wall}s  " + json.dumps(stages))
        if best is None or wall < best["wall"]:
            best = {"wall": wall, "stages": stages}
        # same repeat hygiene as bench.py: drop per-repeat state (cluster-
        # stage localCheckpoints) so accumulated storage doesn't poison the
        # next repeat
        import gc

        del res
        gc.collect()
        spark._jvm.System.gc()
    shutil.rmtree(ckpt, ignore_errors=True)
    print(json.dumps({"cpus": cpus, "files": n_files, **(best or {})}))
    spark.stop()


if __name__ == "__main__":
    main()
