from cloud_dedup_spark.functions.normalize import (  # noqa: F401
    file_id_col,
    normalize_content,
    with_identity,
)
