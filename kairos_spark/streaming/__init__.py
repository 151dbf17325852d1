from kairos_spark.streaming.dedup import stream_exact_dedup
from kairos_spark.streaming.ingest import (
    foreach_batch_rollup,
    stream_bucketize,
    stream_ingest,
    windowed_rollup,
)
from kairos_spark.streaming.joins import interval_attribution_join
from kairos_spark.streaming.novelty import novelty_rate, stream_novelty_tag
from kairos_spark.streaming.leaderboard import stream_decayed_scores
from kairos_spark.streaming.monitor import stream_anomaly_alerts
from kairos_spark.streaming.quota import stream_source_quota
from kairos_spark.streaming.sessions import stateful_sessionize

__all__ = [
    "stream_bucketize",
    "stream_ingest",
    "windowed_rollup",
    "foreach_batch_rollup",
    "stateful_sessionize",
    "stream_exact_dedup",
    "interval_attribution_join",
    "stream_source_quota",
    "stream_anomaly_alerts",
    "stream_decayed_scores",
    "stream_novelty_tag",
    "novelty_rate",
]
