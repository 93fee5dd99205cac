"""Per-stage lineage + skew/throughput metrics (north_rule requirement).

Reference analog: the stdout summary sink (src/cloud_duplicate_analyzer.py:1464-1496)
prints totals and warnings; the graft's operational contract additionally
wants per-partition skew evidence.  ``partition_stats`` runs one cheap extra
job (groupBy spark_partition_id) — call it on checkpointed stage outputs, not
on unmaterialized plans, so nothing is recomputed.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_stats(df: DataFrame) -> dict:
    """Partition-size distribution: count, min/max/mean rows, skew ratio."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .agg(
            F.count(F.lit(1)).alias("n_partitions"),
            F.min("count").alias("min_rows"),
            F.max("count").alias("max_rows"),
            F.avg("count").alias("mean_rows"),
            F.sum("count").alias("total_rows"),
        )
        .collect()
    )
    if not rows or rows[0]["n_partitions"] is None or rows[0]["n_partitions"] == 0:
        return {"n_partitions": 0, "total_rows": 0}
    r = rows[0].asDict()
    r["mean_rows"] = float(r["mean_rows"] or 0.0)
    r["skew_ratio"] = (
        float(r["max_rows"]) / r["mean_rows"] if r["mean_rows"] else 0.0
    )
    return r


@dataclass
class StageMetrics:
    name: str
    seconds: float
    rows: int | None = None
    partitions: dict | None = None


@dataclass
class RunMetrics:
    """Collects per-stage lineage: name → timing, row count, partition skew."""

    stages: list[StageMetrics] = field(default_factory=list)
    started_at: float = field(default_factory=time.time)

    def record(self, name: str, seconds: float, df: DataFrame | None = None,
               with_partitions: bool = False) -> None:
        rows = None
        parts = None
        if df is not None:
            if with_partitions:
                parts = partition_stats(df)
                rows = int(parts.get("total_rows", 0))
            else:
                rows = df.count()
        self.stages.append(StageMetrics(name, round(seconds, 3), rows, parts))

    def to_dict(self) -> dict:
        return {
            "total_seconds": round(time.time() - self.started_at, 3),
            "stages": [
                {
                    "stage": s.name,
                    "seconds": s.seconds,
                    "rows": s.rows,
                    "partitions": s.partitions,
                }
                for s in self.stages
            ],
        }

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, default=str)
