"""Streaming decayed leaderboard state: per-key half-life-decayed
activity scores maintained incrementally across micro-batches.

Batch twin: ``operators/windows.decayed_topk`` (one-shot decayed
leaderboard anchored at the corpus max timestamp). On a stream the
anchor keeps moving, so per key we hold (score-as-of-anchor, anchor):
score S is Σ v·2^((t−A)/half_life) for the key's events up to its
anchor A (its max event time so far). The identity
S@A' = S@A · 2^((A−A')/half_life) makes the representation exact under
re-anchoring, so arrivals in ANY order accumulate to the same value:
a late event (t < A) simply adds v·2^((t−A)/hl) without rewinding.
Re-anchor the emitted (score, anchor) to any common horizon to rank
keys — the downstream top-k is a plain batch aggregate over the sink,
where cross-key ordering belongs (per-key state cannot see other
keys).

Scale shape: state is O(active keys) × (two numbers + a count); each
micro-batch shuffles only on the key; one snapshot row per active key
per batch reaches the sink — the stream itself never re-ranks.
"""

from __future__ import annotations

import math
from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

_STATE_SCHEMA = StructType(
    [
        StructField("score", DoubleType()),
        StructField("anchor_us", LongType()),
        StructField("n", LongType()),
    ]
)


def stream_decayed_scores(
    stream_df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = None,
    half_life_sec: float = 86400.0 * 7,
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Snapshot stream: one (key, anchor ts, decayed score, n_events)
    row per active key per micro-batch — the score is as-of that key's
    own anchor (its max event time seen); re-anchor downstream with
    score · 2^((anchor − horizon)/half_life) to compare keys.
    ``value_col=None`` counts events (weight 1.0 each), matching the
    batch twin. ``watermark=None`` composes into an already-
    watermarked multi-stateful pipeline."""
    key_field = stream_df.schema[key_col]
    out_schema = StructType(
        [
            key_field,
            StructField("anchor", TimestampType()),
            StructField("decayed_score", DoubleType()),
            StructField("n_events", LongType()),
        ]
    )
    hl_us = float(half_life_sec) * 1_000_000.0

    def fn(
        key: Tuple[Any], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        score, anchor_us, n = state.get if state.exists else (0.0, None, 0)
        ts_us = (pdf[ts_col].astype("int64") // 1000).tolist()
        vals = (
            [1.0] * len(pdf)
            if value_col is None
            else pdf[value_col].astype("float64").tolist()
        )
        for t, v in zip(ts_us, vals):
            if anchor_us is None:
                anchor_us, score = t, float(v)
            elif t > anchor_us:
                # re-anchor forward: decay the accumulated score
                score = score * math.pow(2.0, (anchor_us - t) / hl_us) + float(v)
                anchor_us = t
            else:
                # late event: decay ITS weight to the anchor (exact —
                # no rewind, order-independent accumulation)
                score += float(v) * math.pow(2.0, (t - anchor_us) / hl_us)
            n += 1
        state.update((float(score), int(anchor_us), int(n)))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "anchor": [pd.Timestamp(anchor_us, unit="us")],
                "decayed_score": [float(score)],
                "n_events": [int(n)],
            }
        )

    marked = (
        stream_df.withWatermark(ts_col, watermark)
        if watermark is not None
        else stream_df
    )
    return marked.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
