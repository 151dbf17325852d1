"""Column-expression twins of kairos_spark.timemath.

These run JVM-side inside whole-stage codegen — no Python UDFs. All are
pure builtin-function compositions, so Catalyst can constant-fold them
and push the resulting predicates into Parquet scans.

Bucket encodings (identical to the driver-side kernel):
- relative step N → bucket start in epoch seconds: ``floor(epoch/N)*N``
- gregorian daily/monthly/yearly → ``int(strftime)`` codes
  (``yyyyMMdd``/``yyyyMM``/``yyyy``)
- gregorian weekly → C ``%Y%U`` semantics (Sunday-start, week 00),
  which Spark's ISO ``weekofyear`` does NOT provide; built from
  ``dayofyear``/``dayofweek`` math (reference quirk:
  kairos/timeseries.py:139-150).

Requires ``spark.sql.session.timeZone=UTC`` for parity with the
UTC-normalized driver kernel (see timemath module docstring).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from kairos_spark.timemath import GREGORIAN_STEPS


def epoch_seconds(ts: Column) -> Column:
    """Epoch seconds (long) of a timestamp column."""
    return F.unix_timestamp(ts)


def relative_bucket(ts: Column, step: int) -> Column:
    """Bucket-start epoch seconds for a fixed-width step.

    Equivalent to driver-side ``RelativeTime.normalize`` (int(ts/step)*step
    for positive timestamps)."""
    return (F.floor(epoch_seconds(ts) / F.lit(step)) * F.lit(step)).cast("long")


def _weekly_u(ts: Column) -> Column:
    # C strftime %U: week of year, Sunday-start, days before the first
    # Sunday are week 00.  tm_yday = dayofyear-1, tm_wday = dayofweek-1
    # (Spark dayofweek: Sunday=1) → U = (yday + 7 - wday) // 7
    #                                 = (dayofyear + 7 - dayofweek) // 7
    return F.floor((F.dayofyear(ts) + F.lit(7) - F.dayofweek(ts)) / F.lit(7))


def gregorian_bucket(ts: Column, step: str) -> Column:
    """Gregorian bucket code (long) for daily/weekly/monthly/yearly."""
    if step == "daily":
        return F.date_format(ts, "yyyyMMdd").cast("long")
    if step == "monthly":
        return F.date_format(ts, "yyyyMM").cast("long")
    if step == "yearly":
        return F.date_format(ts, "yyyy").cast("long")
    if step == "weekly":
        return (F.year(ts) * F.lit(100) + _weekly_u(ts)).cast("long")
    raise ValueError(f"Unknown Gregorian step {step!r}")


def bucket_expr(ts: Column, step) -> Column:
    """Dispatch: int step → relative bucket-start seconds, Gregorian name
    → calendar bucket code."""
    if step in GREGORIAN_STEPS:
        return gregorian_bucket(ts, step)
    return relative_bucket(ts, int(step))


def shift_timestamp(ts: Column, step, offset: Column) -> Column:
    """Timestamp shifted by ``offset`` interval steps (column offset).

    Relative steps add ``offset*step`` seconds; Gregorian steps shift on
    the calendar (parity with driver-side ``to_bucket(ts, steps)``
    stepping, kairos/timeseries.py:171-189)."""
    if step not in GREGORIAN_STEPS:
        shifted = epoch_seconds(ts) + offset.cast("long") * F.lit(int(step))
        return F.timestamp_seconds(shifted)
    if step == "daily":
        return F.to_timestamp(F.date_add(ts.cast("date"), offset.cast("int")))
    if step == "weekly":
        return F.to_timestamp(F.date_add(ts.cast("date"), (offset * F.lit(7)).cast("int")))
    if step == "monthly":
        return F.to_timestamp(F.add_months(ts.cast("date"), offset.cast("int")))
    # yearly: Jan 1 of (year + offset) — reference resets to month=1 day=1
    return F.to_timestamp(
        F.make_date(F.year(ts) + offset.cast("int"), F.lit(1), F.lit(1))
    )


def bucket_start_expr(bucket: Column, step) -> Column:
    """Bucket key → bucket-start timestamp (inverse of bucket_expr)."""
    if step in GREGORIAN_STEPS:
        return gregorian_bucket_start(bucket, step)
    return F.timestamp_seconds(bucket)


def normalize_expr(ts: Column, step, offset: Column | None = None) -> Column:
    """Timestamp → its (optionally offset-shifted) bucket-start timestamp.

    Column twin of ``RelativeTime.normalize`` / ``GregorianTime.normalize``
    (kairos/timeseries.py:107-112, 229-235)."""
    shifted = ts if offset is None else shift_timestamp(ts, step, offset)
    return bucket_start_expr(bucket_expr(shifted, step), step)


def step_size_expr(bucket: Column, step) -> Column:
    """Seconds covered by one bucket, as a column over the bucket key.

    Relative steps are constant; Gregorian steps are variable-length —
    whole days between this bucket's start and the next bucket's start
    × 86400 (leap-February monthly = 29*86400; parity:
    kairos/timeseries.py:155-169)."""
    if step not in GREGORIAN_STEPS:
        return F.lit(int(step)).cast("long")
    start = gregorian_bucket_start(bucket, step).cast("date")
    if step == "daily":
        nxt = F.date_add(start, 1)
    elif step == "weekly":
        nxt = F.date_add(start, 7)
    elif step == "monthly":
        nxt = F.add_months(start, 1)
    else:
        nxt = F.make_date(F.floor(bucket).cast("int") + F.lit(1), F.lit(1), F.lit(1))
    return (F.datediff(nxt, start).cast("long") * F.lit(86400)).cast("long")


def gregorian_bucket_start(bucket: Column, step: str) -> Column:
    """Inverse: bucket code → bucket-start timestamp (UTC).

    Weekly follows the reference's definition ``Jan1 + week*7d``
    (kairos/timeseries.py:195-206)."""
    if step == "weekly":
        year = F.floor(bucket / F.lit(100)).cast("int")
        week = (bucket % F.lit(100)).cast("int")
        jan1 = F.to_date(F.concat(year.cast("string"), F.lit("-01-01")))
        return F.to_timestamp(F.date_add(jan1, (week * F.lit(7))))
    fmt = {"daily": "yyyyMMdd", "monthly": "yyyyMM", "yearly": "yyyy"}[step]
    return F.to_timestamp(bucket.cast("string"), fmt)
