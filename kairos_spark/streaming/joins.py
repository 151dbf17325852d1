"""Streaming joins: watermarked interval attribution.

The reference has no stream engine (SURVEY.md §2.4); attribution —
"join each click to the purchases it produced within N minutes" — is
the stream-stream join every event pipeline ships first. Batch range
joins (operators.joins.banded_range_join) answer it offline; this is
the online form.

Scale shape:
- BOTH sides carry watermarks and the join condition bounds event time
  on both sides — the two requirements Structured Streaming needs to
  evict join state. Without either, state grows with the stream's
  lifetime; with them it is O(events within horizon + watermark).
- The equality key (user/session) hash-partitions both sides; the
  interval predicate evaluates within partitions. Same plan a batch
  banded range join produces, applied incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_attribution_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    horizon_sec: int = 600,
    watermark: str = "1 hour",
    suffix: str = "_r",
) -> DataFrame:
    """Attribute every right row to the left rows of the same key it
    follows within ``horizon_sec`` (left_ts <= right_ts <= left_ts +
    horizon). Streaming inputs get watermarks on both sides so join
    state evicts; batch inputs run the identical condition as a plain
    interval join (one code path to test offline, then point at
    streams).

    Right-side columns are suffixed; both timestamps survive so the
    caller can compute attribution lag."""
    lts, rts = f"{left_ts}", f"{right_ts}{suffix}"
    r = right.select(
        F.col(key_col).alias(f"{key_col}{suffix}"),
        F.col(right_ts).alias(rts),
        *[
            F.col(c).alias(f"{c}{suffix}")
            for c in right.columns
            if c not in (key_col, right_ts)
        ],
    )
    left_in = left
    if left_in.isStreaming:
        left_in = left_in.withWatermark(left_ts, watermark)
    if r.isStreaming:
        r = r.withWatermark(rts, watermark)
    cond = (
        (F.col(key_col) == F.col(f"{key_col}{suffix}"))
        & (F.col(rts) >= F.col(lts))
        & (F.col(rts) <= F.col(lts) + F.expr(f"INTERVAL {horizon_sec} SECONDS"))
    )
    return left_in.join(r, cond).drop(f"{key_col}{suffix}")
