"""Streaming anomaly alerts: per-key EWMA z-score on the event stream.

Batch twins: ``operators/windows.ewma_smooth`` (the smoother) and
``operators/profiling.anomaly_zscore`` (the batch scorer). On a
stream the baseline must survive micro-batches, so per key we keep
exponentially-weighted mean and variance in state (West 1979
incremental form) and emit an alert row whenever an arriving value
sits more than ``threshold`` deviations from the baseline *as of
before that value* — the alert never contaminates its own baseline
comparison, and every value (alerting or not) then updates the
baseline so level shifts re-adapt at rate ``alpha``.

Scale shape: state is O(active keys) × three numbers; each
micro-batch shuffles only on the key. Only alert rows are emitted —
the sink sees the exceptions, not the stream.
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
        StructField("ewma", DoubleType()),
        StructField("ewvar", DoubleType()),
        StructField("n", LongType()),
    ]
)


def stream_anomaly_alerts(
    stream_df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.1,
    threshold: float = 4.0,
    min_n: int = 5,
    watermark: str | None = "1 hour",
) -> DataFrame:
    """ALERT stream: (key, ts, value, baseline, z) rows for values with
    |z| ≥ threshold against the pre-update EWMA baseline, after a
    warm-up of ``min_n`` values per key. ``watermark=None`` composes
    into an already-watermarked multi-stateful pipeline."""
    key_field = stream_df.schema[key_col]
    out_schema = StructType(
        [
            key_field,
            StructField(ts_col, TimestampType()),
            StructField(value_col, DoubleType()),
            StructField("baseline", DoubleType()),
            StructField("z", DoubleType()),
        ]
    )
    a = float(alpha)
    thr = float(threshold)
    warm = int(min_n)

    def fn(
        key: Tuple[Any], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True).sort_values(
            ts_col, kind="mergesort"
        )
        ewma, ewvar, n = state.get if state.exists else (0.0, 0.0, 0)
        alerts: list[tuple] = []
        for ts, x in zip(pdf[ts_col], pdf[value_col].astype("float64")):
            if n >= warm and ewvar > 0:
                z = (x - ewma) / math.sqrt(ewvar)
                if abs(z) >= thr:
                    alerts.append((key[0], ts, float(x), ewma, z))
            if n == 0:
                ewma, ewvar = float(x), 0.0
            else:
                d = float(x) - ewma
                ewma += a * d
                # West-form EW variance: decays old spread, adds the
                # pre/post-mean cross term exactly
                ewvar = (1.0 - a) * (ewvar + a * d * d)
            n += 1
        state.update((float(ewma), float(ewvar), int(n)))
        if alerts:
            yield pd.DataFrame(
                {
                    key_col: [t[0] for t in alerts],
                    ts_col: [t[1] for t in alerts],
                    value_col: [t[2] for t in alerts],
                    "baseline": [t[3] for t in alerts],
                    "z": [t[4] for t in alerts],
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
