"""Ingest: arbitrary event DataFrame → long-format bucket rows.

The reference's write path loops per interval per timestamp client-side
(kairos/timeseries.py:439-497, sql_backend.py:180-187). Here the whole
loop is ONE narrow projection: an ``explode`` over the per-interval
bucket expressions (and optionally the ±N fan-out offsets), producing
``(name, interval, i_time, r_time, insert_seq, value)`` rows with no
shuffle — at 100 TB this is a map-only stage that parallelizes with the
input partitioning.

i_time / r_time encoding (matches kairos_spark.timemath):
- relative step → bucket-start epoch seconds
- Gregorian step → strftime-int code (19991231 style)
- coarse intervals → r_time = -1 sentinel (the reference's Cassandra
  convention, cassandra_backend.py:330-337)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kairos_spark.config import IntervalConfig
from kairos_spark.functions.buckets import bucket_expr, normalize_expr

COARSE_SENTINEL = -1


def bucketize(
    df: DataFrame,
    intervals: dict[str, IntervalConfig],
    name_col: str = "name",
    ts_col: str = "ts",
    value_col: str = "value",
    fanout: int = 0,
    seq_col: str | None = None,
) -> DataFrame:
    """Explode each event into one row per configured interval.

    ``fanout`` duplicates each event into N neighboring interval buckets
    before/after its own (trending support; parity:
    ``_normalize_timestamps`` kairos/timeseries.py:484-497 — negative
    fans into the past, positive into the future, offset≠0 rows use the
    *normalized* (bucket-start) shifted timestamp).

    ``seq_col`` preserves insertion order for order-sensitive types
    (series lists, gauge last-write-wins); defaults to a monotonic id.
    """
    seq = F.col(seq_col) if seq_col else F.monotonically_increasing_id()
    ts = F.col(ts_col)

    fanned = df.withColumn("__seq", seq)
    if fanout != 0:
        lo, hi = (fanout, 0) if fanout < 0 else (0, fanout)
        fanned = fanned.withColumn(
            "__off", F.explode(F.sequence(F.lit(lo), F.lit(hi)))
        )
    else:
        fanned = fanned.withColumn("__off", F.lit(0))

    per_interval = []
    for iname, cfg in intervals.items():
        # offset 0 keeps the raw timestamp; shifted copies snap to the
        # neighboring bucket's start, matching the reference's
        # normalize(ts, offset) fan-out.
        eff_ts = F.when(F.col("__off") == 0, ts).otherwise(
            normalize_expr(ts, cfg.step, F.col("__off"))
        )
        i_time = bucket_expr(eff_ts, cfg.step)
        r_time = (
            F.lit(COARSE_SENTINEL).cast("long")
            if cfg.coarse
            else bucket_expr(eff_ts, cfg.resolution)
        )
        per_interval.append(
            F.struct(
                F.lit(iname).alias("interval"),
                i_time.alias("i_time"),
                r_time.alias("r_time"),
            )
        )

    exploded = fanned.withColumn("__b", F.explode(F.array(*per_interval)))
    return exploded.select(
        F.col(name_col).cast("string").alias("name"),
        F.col("__b.interval").alias("interval"),
        F.col("__b.i_time").alias("i_time"),
        F.col("__b.r_time").alias("r_time"),
        F.col("__seq").alias("insert_seq"),
        F.col(value_col).alias("value"),
    )
