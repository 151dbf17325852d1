"""Per-source streaming quota enforcement (ingest admission control).

The batch twin is ``operators/sampling.token_budget_alloc`` (decide
how many tokens each source SHOULD contribute); this is the runtime
half: enforce a per-source token budget per tumbling event-time
window ON the ingest stream, so a runaway source (a crawler replaying
a site, a bulk re-upload) cannot flood the long table — its overflow
is flagged and routed to a reject sink instead of silently skewing
the mix every downstream mix audit assumes.

Semantics: within each (source, window) the arriving docs are
admitted in (ts, doc id) order WITHIN each micro-batch while
``used + n_tokens <= budget``; a doc that does not fit is rejected
and does NOT consume budget (a later smaller doc may still fit — no
high-water blocking). Determinism is per-micro-batch: admission
order is (ts, id)-sorted only inside a batch, so different
micro-batch boundaries can admit a different doc set for the same
input (ADVICE r9 — the earlier "deterministic given the input"
claim overstated this). Every input doc is emitted exactly once
with its admission decision, so the stream splits into accept/reject
branches with two filters downstream.

Scale shape (100 TB/day ingest): state is keyed on (source, window)
and holds ONE long (tokens used) — O(active sources × windows inside
the watermark), independent of document count and payload size; the
payload itself never enters state. Each micro-batch shuffles only on
the group key. An event-time timeout removes a window's counter once
the watermark passes its end — state cannot accumulate.

Reference scope note: the reference library (agoragames/kairos) has
no stream engine at all (SURVEY.md §2.4); this operator is part of
the beyond-reference training-data layer, like the rest of
``kairos_spark.streaming``.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

_STATE_SCHEMA = StructType([StructField("used", LongType())])


def stream_source_quota(
    stream_df: DataFrame,
    max_tokens: int,
    window_sec: int = 3600,
    source_col: str = "source",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    tokens_col: str = "n_tokens",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Admission-control stream: every input doc comes back out as
    (source, w_start, doc_id, n_tokens, admitted, used_after), where
    ``admitted`` says whether it fit the (source, window) budget and
    ``used_after`` is the window's consumed-token counter after the
    decision (unchanged for rejects). Filter ``admitted`` downstream
    to split accept/reject sinks. ``watermark=None`` means the input
    is already watermarked upstream (multi-stateful pipelines define
    the watermark exactly once — redefining it is disallowed)."""
    src_field = stream_df.schema[source_col]
    out_schema = StructType(
        [
            StructField(source_col, src_field.dataType),
            StructField("w_start", TimestampType()),
            StructField(id_col, stream_df.schema[id_col].dataType),
            StructField(tokens_col, LongType()),
            StructField("admitted", BooleanType()),
            StructField("used_after", LongType()),
        ]
    )
    budget = int(max_tokens)
    wsec = int(window_sec)

    def fn(
        key: Tuple[Any, Any], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # the window key is epoch SECONDS (long), not a naive datetime:
        # naive-datetime .timestamp() round-trips through the worker's
        # OS-local timezone and can shift the event-time timeout by an
        # hour across a DST fold (ADVICE r9). Epoch math is tz-free.
        source, w_epoch = key
        w_epoch = int(w_epoch)
        if state.hasTimedOut:
            state.remove()
            return
        used = state.get[0] if state.exists else 0
        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        # deterministic admission order: event time, then doc id
        pdf = pdf.sort_values([ts_col, id_col], kind="mergesort")
        admitted, used_after = [], []
        for n in pdf[tokens_col].astype("int64"):
            ok = used + int(n) <= budget
            if ok:
                used += int(n)
            admitted.append(ok)
            used_after.append(used)
        state.update((int(used),))
        # drop the counter once the watermark passes the window end
        w_end_ms = (w_epoch + wsec) * 1000
        state.setTimeoutTimestamp(w_end_ms + 1)
        yield pd.DataFrame(
            {
                source_col: pdf[source_col].to_numpy(),
                # naive UTC; Arrow localizes to the session tz (UTC)
                "w_start": pd.Timestamp(w_epoch, unit="s"),
                id_col: pdf[id_col].to_numpy(),
                tokens_col: pdf[tokens_col].astype("int64").to_numpy(),
                "admitted": admitted,
                "used_after": used_after,
            }
        )

    w_epoch_col = (F.unix_timestamp(F.col(ts_col)) / wsec).cast("long") * wsec
    marked = (
        stream_df.withWatermark(ts_col, watermark)
        if watermark is not None
        else stream_df
    )
    return (
        marked.withColumn("__w", w_epoch_col)
        .groupBy(source_col, "__w")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
