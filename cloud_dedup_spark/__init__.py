"""cloud_dedup_spark — a PySpark-native near-duplicate detection + clustering engine.

From-scratch Spark-first re-expression of the capabilities of the reference
``ndany/cloud-dedup`` (read-only at /root/reference): exact + near-duplicate
detection, substring containment, clustering, and per-folder/prefix rollups —
over an Iceberg/parquet table of source-code files
``files(repo, path, commit, lang, content)`` (BASELINE.json input_hint).
"""

from cloud_dedup_spark.config import DEFAULT_CONFIG, DedupConfig, MetaConfig  # noqa: F401
from cloud_dedup_spark.plans.pipeline import run_pipeline  # noqa: F401

__version__ = "0.1.0"
