from kairos_spark.streaming.ingest import (
    foreach_batch_rollup,
    stream_bucketize,
    stream_ingest,
    windowed_rollup,
)

__all__ = [
    "stream_bucketize",
    "stream_ingest",
    "windowed_rollup",
    "foreach_batch_rollup",
]
