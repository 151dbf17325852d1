from kairos_spark.functions.buckets import (
    bucket_expr,
    epoch_seconds,
    gregorian_bucket,
    relative_bucket,
)

__all__ = ["bucket_expr", "epoch_seconds", "gregorian_bucket", "relative_bucket"]
