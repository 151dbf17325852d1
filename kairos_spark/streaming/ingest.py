"""Structured Streaming ingest for the long-format store.

The reference is write-as-you-go with no stream engine; its late-data
policy is "accept into old buckets unless past retention"
(redis_backend.py:146-148, SURVEY.md §2.4). Mapped to Spark:

- ``stream_bucketize``: the SAME bucketize projection as batch (narrow,
  stateless — streaming-safe), so batch and streaming ingest share one
  code path. A monotonic id is not available in streams; callers pass
  an event-id column (``seq_col``) for order-sensitive types.
- ``stream_ingest``: readStream → bucketize → append to the partitioned
  long table. Retention maps to the watermark: rows later than
  ``steps × step`` behind the max event time are dropped before the
  sink, mirroring the reference's write-time TTL guard.
- ``windowed_rollup``: watermarked tumbling-window aggregation
  (``F.window``) per series type — the streaming analog of
  get/series at interval grain.
- ``foreach_batch_rollup``: maintained rollup table via foreachBatch —
  each micro-batch appends its partial aggregate; readers re-aggregate
  partials (sum of sums, etc.). On Delta this becomes MERGE; with
  plain parquet, append+re-agg keeps the sink idempotent-ish under
  at-least-once (duplicate partials only double-count the affected
  batch, and exactly-once sinks remove that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kairos_spark.config import IntervalConfig
from kairos_spark.ingest import bucketize


def stream_bucketize(
    stream_df: DataFrame,
    intervals: dict[str, IntervalConfig],
    name_col: str = "name",
    ts_col: str = "ts",
    value_col: str = "value",
    seq_col: str | None = None,
    fanout: int = 0,
) -> DataFrame:
    """Streaming-safe bucketize (identical semantics to batch)."""
    if seq_col is None:
        # monotonically_increasing_id is undefined in streams; event
        # time is the only universally available order proxy
        stream_df = stream_df.withColumn("__auto_seq", F.unix_micros(F.col(ts_col)))
        seq_col = "__auto_seq"
    return bucketize(stream_df, intervals, name_col, ts_col, value_col, fanout, seq_col)


def stream_ingest(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    intervals: dict[str, IntervalConfig],
    name_col: str = "name",
    ts_col: str = "ts",
    value_col: str = "value",
    seq_col: str | None = None,
    fanout: int = 0,
    watermark: str | None = None,
    trigger_available_now: bool = False,
):
    """readStream → bucketize → append the partitioned long table.
    Returns the StreamingQuery. ``watermark`` (e.g. ``'1 hour'``)
    bounds lateness — the retention guard of the reference's write
    path."""
    src = stream_df
    if watermark:
        src = src.withWatermark(ts_col, watermark)
    long_df = stream_bucketize(src, intervals, name_col, ts_col, value_col, seq_col, fanout)
    writer = (
        long_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("interval")
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


_ROLLUP_AGGS = {
    "count": lambda: F.sum("value").alias("value"),
    "series": lambda: F.sort_array(
        F.collect_list(F.struct("insert_seq", "value"))
    ).alias("value"),
    "set": lambda: F.collect_set("value").alias("value"),
    "gauge": lambda: F.max_by("value", "insert_seq").alias("value"),
}


def windowed_rollup(
    stream_df: DataFrame,
    series_type: str = "count",
    step_seconds: int = 60,
    watermark: str = "10 minutes",
    name_col: str = "name",
    ts_col: str = "ts",
    value_col: str = "value",
    slide_seconds: int | None = None,
) -> DataFrame:
    """Watermarked windowed aggregate — streaming get/series at
    interval grain. Window start == the relative bucket start, so
    results align with the batch engine's i_time. ``slide_seconds``
    turns the tumbling window into a sliding one (each event lands in
    step/slide overlapping windows — the streaming analog of the
    reference's ±N insert fan-out, README.rst:428-432); state per key
    grows by the same factor, bounded by the watermark as usual."""
    if series_type not in _ROLLUP_AGGS:
        raise ValueError(f"unsupported streaming rollup type {series_type!r}")
    if slide_seconds is not None:
        if slide_seconds <= 0:
            raise ValueError("slide_seconds must be positive")
        if step_seconds % slide_seconds != 0:
            raise ValueError("step_seconds must be a multiple of slide_seconds")
    src = stream_df.withWatermark(ts_col, watermark).select(
        F.col(name_col).alias("name"),
        F.col(ts_col).alias("__ts"),
        F.col(value_col).alias("value"),
        F.unix_micros(F.col(ts_col)).alias("insert_seq"),
    )
    if slide_seconds:
        win = F.window("__ts", f"{step_seconds} seconds", f"{slide_seconds} seconds")
    else:
        win = F.window("__ts", f"{step_seconds} seconds")
    return (
        src.groupBy("name", win.alias("w"))
        .agg(_ROLLUP_AGGS[series_type]())
        .select(
            "name",
            F.unix_timestamp(F.col("w.start")).alias("i_time"),
            "value",
        )
    )


def foreach_batch_rollup(
    stream_df: DataFrame,
    rollup_path: str,
    checkpoint: str,
    intervals: dict[str, IntervalConfig],
    name_col: str = "name",
    ts_col: str = "ts",
    value_col: str = "value",
    trigger_available_now: bool = False,
):
    """Maintained partial-aggregate rollup table: per micro-batch, sum
    per (name, interval, i_time, r_time) and append. Readers finish the
    aggregation (sum of partials) — the same partial/final split the
    batch engine and the reference's counter upserts use
    (mongo $inc / HINCRBY, SURVEY.md §4)."""

    def process(batch_df: DataFrame, batch_id: int):
        partial = (
            bucketize(batch_df, intervals, name_col, ts_col, value_col, 0, None)
            .groupBy("name", "interval", "i_time", "r_time")
            .agg(F.sum("value").alias("value"), F.count("*").alias("n"))
            .withColumn("batch_id", F.lit(batch_id))
        )
        partial.write.mode("append").partitionBy("interval").parquet(rollup_path)

    writer = stream_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
