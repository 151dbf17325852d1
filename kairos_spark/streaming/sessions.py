"""Stateful streaming sessionization via applyInPandasWithState.

The batch twin is ``operators/windows.sessionize`` (gaps-and-islands);
in a stream the islands never all arrive at once, so session state must
live across micro-batches: per key we keep the open session
(start, last-event, count), close it when a gap exceeds ``gap_sec``
(emitting the closed session downstream), and let the event-time
timeout close idle sessions once the watermark passes last + gap.

Scale shape: state is O(active keys) with a fixed-size value (three
numbers); each micro-batch shuffles only its own events on the key —
the same single key-exchange as the batch operator. Arrow moves the
per-key batches into pandas; the per-key work is a linear scan.
"""

from __future__ import annotations

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
        StructField("start", DoubleType()),
        StructField("last", DoubleType()),
        StructField("n", LongType()),
    ]
)


def _output_schema(key_field) -> StructType:
    return StructType(
        [
            key_field,
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_events", LongType()),
        ]
    )


def stateful_sessionize(
    stream_df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_sec: float = 1800.0,
    watermark: str = "1 hour",
) -> DataFrame:
    """CLOSED sessions stream: (key, session_start, session_end,
    n_events), emitted when a later event opens the next session or the
    event-time timeout fires (watermark passed last event + gap).

    Late events older than the watermark are dropped by the engine —
    the streaming trade the batch operator doesn't have to make.
    """
    key_field = stream_df.schema[key_col]
    out_schema = _output_schema(key_field)

    def fn(
        key: Tuple[Any], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        closed: list[tuple] = []
        if state.hasTimedOut:
            if state.exists:
                s, l, n = state.get
                closed.append((key[0], s, l, n))
            state.remove()
        else:
            secs: list[float] = []
            for pdf in pdfs:
                # tz-naive pandas timestamps are UTC here (session tz)
                secs.extend(t.timestamp() for t in pdf[ts_col])
            secs.sort()
            if state.exists:
                s, l, n = state.get
            else:
                s = l = None
                n = 0
            for t in secs:
                if s is None:
                    s = l = t
                    n = 1
                elif t - l > gap_sec:
                    closed.append((key[0], s, l, n))
                    s = l = t
                    n = 1
                else:
                    l = t
                    n += 1
            if s is not None:
                state.update((float(s), float(l), int(n)))
                # close the open session once the watermark passes l+gap
                state.setTimeoutTimestamp(int((l + gap_sec) * 1000) + 1)
        if closed:
            yield pd.DataFrame(
                {
                    key_col: [c[0] for c in closed],
                    "session_start": pd.to_datetime([c[1] for c in closed], unit="s"),
                    "session_end": pd.to_datetime([c[2] for c in closed], unit="s"),
                    "n_events": [c[3] for c in closed],
                }
            )

    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
