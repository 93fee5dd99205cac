"""Measure the signatures stage table's on-disk width per column (ROADMAP 3).

The shingle array is the fattest signature column; before restructuring the
pipeline around a packed encoding, measure what it actually costs at rest
(parquet, snappy) and in the stage scan.  Evidence goes to BENCH/ANALYSIS.md.

Usage: PYTHONPATH=/root/repo python scripts/measure_sig_width.py [n_files]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloud_dedup_spark.config import DedupConfig
from cloud_dedup_spark.corpus import bench_corpus_df
from cloud_dedup_spark.functions.normalize import with_identity
from cloud_dedup_spark.operators.signatures import SIG_TABLE_COLUMNS, compute_signatures
from cloud_dedup_spark.session import build_session


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, names in os.walk(path):
        for n in names:
            total += os.path.getsize(os.path.join(root, n))
    return total


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = build_session(
        app_name="sig-width",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    try:
        cfg = DedupConfig()
        files = with_identity(bench_corpus_df(spark, n_files, seed=42))
        sigs = compute_signatures(
            files.select("file_id", "content_norm"), cfg
        ).select(*SIG_TABLE_COLUMNS)

        base = "/tmp/sig_width_probe"
        shutil.rmtree(base, ignore_errors=True)
        full_path = f"{base}/full"
        sigs.write.mode("overwrite").parquet(full_path)
        n = spark.read.parquet(full_path).count()

        # per-column footprint: write single-column projections of the SAME
        # materialized table (parquet re-encodes each, so the delta vs the
        # full table approximates the column's share)
        col_bytes = {}
        for col in SIG_TABLE_COLUMNS:
            p = f"{base}/col_{col}"
            spark.read.parquet(full_path).select(col).write.mode(
                "overwrite"
            ).parquet(p)
            col_bytes[col] = dir_bytes(p)

        # scan cost of the fat column: full-row scan vs shingle-free scan
        t0 = time.time()
        spark.read.parquet(full_path).selectExpr(
            "sum(size(shingles))"
        ).collect()
        t_shingles = time.time() - t0
        t0 = time.time()
        spark.read.parquet(full_path).selectExpr(
            "sum(n_shingles)"
        ).collect()
        t_narrow = time.time() - t0

        out = {
            "n_rows": n,
            "full_table_bytes": dir_bytes(full_path),
            "bytes_per_row": round(dir_bytes(full_path) / n, 1),
            "column_bytes_per_row": {
                c: round(b / n, 1) for c, b in col_bytes.items()
            },
            "scan_sum_shingles_sec": round(t_shingles, 2),
            "scan_n_shingles_sec": round(t_narrow, 2),
        }
        print(json.dumps(out, indent=2))
        shutil.rmtree(base, ignore_errors=True)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
