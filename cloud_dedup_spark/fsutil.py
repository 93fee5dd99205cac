"""Shared Hadoop-FileSystem helpers (driver-side).

One definition of the parquet ``_SUCCESS`` existence probe: it must go
through the Hadoop FileSystem API — a driver-local os.path check is always
False for hdfs:///s3a:// paths, which silently re-runs whatever the marker
was supposed to skip.  Used by plans/pipeline.CheckpointStore and the IVF
quantizer cache; one copy so an Iceberg-catalog branch lands in both.
"""

from __future__ import annotations


def hadoop_success_exists(spark, table_path: str) -> bool:
    """True iff ``<table_path>/_SUCCESS`` exists on the table's filesystem."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(f"{table_path.rstrip('/')}/_SUCCESS")
    return path.getFileSystem(hconf).exists(path)
