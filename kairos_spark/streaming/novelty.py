"""Streaming content-novelty tagging (the ingest-side stale detector).

The batch twin is ``operators/dedup.cross_shard_novelty`` (per
id-order shard, how much content is re-served); this is the runtime
half: every arriving document is tagged ``is_novel`` — first time
this content digest appears within the state horizon — or stale, ON
the ingest stream. Unlike ``stream_exact_dedup`` (which DROPS the
copies), tagging keeps every row flowing so downstream can split
keep/reject sinks AND maintain the novelty-rate monitor that says in
real time when a feed starts re-serving its archive.

Semantics: state is keyed on the 32-char md5 digest; the FIRST
occurrence in (ts, id) order within a micro-batch is novel, every
later copy (same batch or later batches) is stale while the key's
state lives. An event-time timeout evicts a digest once the
watermark passes last-seen + ``horizon_sec`` — after that, the same
content arriving again counts as novel (exactly
``dropDuplicatesWithinWatermark``'s eviction contract, but labeling
instead of dropping). Determinism is per-micro-batch (the quota
operator's documented caveat): batch boundaries can shift WHICH copy
is first only when copies race within the horizon.

Scale shape (100 TB/day ingest): state holds ONE empty-marker row
per distinct digest inside the horizon — O(distinct digests), never
payload bytes (the digest is computed map-side and the text column
never enters the state store). Each micro-batch shuffles on the
digest key only.

Reference scope note: the reference library (agoragames/kairos) has
no stream engine at all (SURVEY.md §2.4); this operator is part of
the beyond-reference training-data layer.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# single long = max event-time (epoch ms) seen for this digest; its
# presence doubles as the "seen" marker. Storing the max — not just
# marking existence — is what keeps the eviction horizon anchored to
# the TRUE latest occurrence (see the timeout note in the function).
_STATE_SCHEMA = StructType([StructField("last_ms", LongType())])


def stream_novelty_tag(
    stream_df: DataFrame,
    horizon_sec: int = 86_400,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Tag every arriving doc with ``is_novel``: (doc_id, ts, digest,
    is_novel). Filter downstream to split novel/stale sinks or window
    the booleans into the live novelty-rate curve. ``watermark=None``
    means the input is already watermarked upstream (multi-stateful
    pipelines define the watermark exactly once)."""
    out_schema = StructType(
        [
            StructField(id_col, stream_df.schema[id_col].dataType),
            StructField(ts_col, TimestampType()),
            StructField("digest", StringType()),
            StructField("is_novel", BooleanType()),
        ]
    )
    horizon_ms = int(horizon_sec) * 1000

    def fn(
        key: Tuple[Any], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (digest,) = key
        if state.hasTimedOut:
            state.remove()
            return
        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        pdf = pdf.sort_values([ts_col, id_col], kind="mergesort")
        seen = state.exists
        flags = []
        for _ in range(len(pdf)):
            flags.append(not seen)
            seen = True
        # evict once the watermark passes last-seen + horizon (epoch
        # ms — tz-free, the quota operator's DST lesson). "last seen"
        # is the MAX event time across ALL batches for this digest
        # (kept in state): a later micro-batch carrying only
        # late-but-in-watermark rows must not overwrite the timeout
        # with an earlier timestamp and shrink the horizon below
        # last-seen + horizon of the true latest event (ADVICE r11).
        batch_ms = int(pdf[ts_col].max().value // 1_000_000)
        prev_ms = int(state.get[0]) if state.exists else 0
        last_ms = max(prev_ms, batch_ms)
        state.update((last_ms,))
        state.setTimeoutTimestamp(last_ms + horizon_ms)
        yield pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                ts_col: pdf[ts_col].to_numpy(),
                "digest": digest,
                "is_novel": flags,
            }
        )

    marked = (
        stream_df.withWatermark(ts_col, watermark)
        if watermark is not None
        else stream_df
    )
    return (
        marked.withColumn("digest", F.md5(F.col(text_col)))
        .select(id_col, ts_col, "digest")
        .groupBy("digest")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def novelty_rate(
    tagged: DataFrame,
    window_sec: int = 3600,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """The live novelty-rate curve over a tagged stream: per tumbling
    event-time window, arriving docs / novel docs / stale docs. A
    plain windowed aggregate (map-side combinable, bounded state) —
    chain after :func:`stream_novelty_tag`. The watermark is
    re-declared here because a stateful operator's OUTPUT is a new
    event-time column (Spark drops the input watermark association
    across applyInPandasWithState); append-mode window aggs need it.
    stale_frac is left to the consumer (a ratio over two emitted
    counters) so the stream emits only exact integers.

    Chaining note: Spark's global-watermark correctness check flags
    ANY stateful op downstream of applyInPandasWithState (the Pandas
    op COULD hold rows and emit them late). ``stream_novelty_tag``
    provably does not — every row is emitted in the micro-batch it
    arrives with its original ts, so nothing is ever later than the
    upstream watermark allows — making the check conservative here.
    PREFERRED composition: run this aggregate as its OWN query over
    the tagged sink table (two-query pattern — no config change, each
    query keeps its own watermark). Chaining both in one query
    requires ``spark.sql.streaming.statefulOperator.
    checkCorrectness.enabled=false``, which disables the late-data
    correctness check for EVERY stateful operator in that session —
    not just this provably-safe one — so reach for it only when the
    single-query latency actually matters and every other stateful
    op in the session is audited (ADVICE r11)."""
    return (
        tagged.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), f"{int(window_sec)} seconds").alias("w")
        )
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("is_novel"), 1).otherwise(0))
            .cast("long")
            .alias("novel_docs"),
            F.sum(F.when(F.col("is_novel"), 0).otherwise(1))
            .cast("long")
            .alias("stale_docs"),
        )
        .select(F.col("w.start").alias("w_start"), "n_docs", "novel_docs", "stale_docs")
    )
