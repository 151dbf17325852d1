"""Streaming deduplication for continuous ingest pipelines.

The reference has no stream engine at all (SURVEY.md §2.4 "Streaming
ops"); for the training-data pipeline this engine targets, dedup on the
ingest stream is table stakes: exact duplicates (retries, replays,
crawler re-fetches) should never reach the long table.

Scale shape (100 TB/day streams):
- ``stream_exact_dedup`` keys state on a 16-byte md5 digest, NOT the
  document payload — state store size is O(distinct digests within the
  watermark), independent of document length.
- ``dropDuplicatesWithinWatermark`` (Spark 3.5+) evicts state once the
  watermark passes, so memory is bounded by the dedup horizon rather
  than the stream's lifetime. Classic ``dropDuplicates`` on a stream
  never evicts — unbounded state — which is why it is not used here.
- Near-dup (MinHash/SimHash) dedup is NOT a streaming operator in this
  engine: banding requires a self-join across the corpus. The streaming
  path computes signatures inline (map-only, kairos_spark.operators.
  dedup.minhash_signatures works on streaming DataFrames unchanged) and
  defers pair generation to a periodic batch job over the sink table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str | None = "10 minutes",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Drop rows whose ``text_col`` digest was already seen within the
    watermark horizon. Works on streaming and batch DataFrames (batch
    falls back to plain digest dropDuplicates semantics).

    ``extra_keys`` widens the dedup key (e.g. ``["source"]`` to dedup
    per-crawler rather than globally). ``watermark=None`` means the
    input stream is ALREADY watermarked upstream — Spark disallows
    redefining it, and a multi-stateful pipeline (quality gate →
    dedup → quota) must define the watermark exactly once.
    """
    keys = ["__digest"] + list(extra_keys or [])
    out = df.withColumn("__digest", F.md5(F.col(text_col).cast("string")))
    if out.isStreaming:
        if watermark is not None:
            out = out.withWatermark(ts_col, watermark)
        out = out.dropDuplicatesWithinWatermark(keys)
    else:
        out = out.dropDuplicates(keys)
    return out.drop("__digest")
