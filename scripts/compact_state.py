"""Maintenance entry point: compact append-grown dedup state tables.

    spark-submit --py-files cloud_dedup_spark.zip scripts/compact_state.py \\
        --checkpoint-dir <stage-table location> [--target-file-mb 128]

Run during an ingest pause (the parquet swap is not concurrent-reader-safe;
use table_format=iceberg state on clusters for snapshot-isolated rewrites).
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--target-file-mb", type=int, default=128)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from cloud_dedup_spark.plans.maintenance import compact_stage_tables
    from cloud_dedup_spark.session import build_session

    spark = build_session(app_name="cloud-dedup-compact", master=args.master)
    try:
        report = compact_stage_tables(
            spark,
            args.checkpoint_dir,
            target_file_bytes=args.target_file_mb * 1024 * 1024,
        )
        print(json.dumps(report, indent=2))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
