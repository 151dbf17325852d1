"""Property-based tests (hypothesis) for the bucket kernel — invariants
the golden tests can't sweep: round-trips, monotonicity, containment,
and driver/column parity over arbitrary timestamps."""

from hypothesis import given, settings, strategies as st

from kairos_spark.timemath import GregorianTime, RelativeTime

TS = st.floats(min_value=0, max_value=4_102_444_800, allow_nan=False)  # ≤ year 2100
STEPS = st.sampled_from([1, 5, 60, 300, 3600, 86400, 604800])
GSTEPS = st.sampled_from(["daily", "weekly", "monthly", "yearly"])


@given(TS, STEPS)
def test_relative_normalize_idempotent(ts, step):
    rt = RelativeTime(step)
    n = rt.normalize(ts)
    assert rt.normalize(n) == n
    assert n <= ts
    assert ts - n < step


@given(TS, STEPS)
def test_relative_bucket_containment(ts, step):
    rt = RelativeTime(step)
    b = rt.to_bucket(ts)
    assert rt.from_bucket(b) <= ts < rt.from_bucket(b + 1)


@given(TS, st.floats(min_value=0, max_value=86400 * 2), STEPS)
def test_relative_buckets_cover_range(t0, span, step):
    # span bounded: buckets() materializes the range (reference parity,
    # kairos/timeseries.py:99-105) — an unbounded span is a test-harness
    # OOM, not an engine path (range reads use F.sequence executor-side)
    rt = RelativeTime(step)
    lo, hi = t0, t0 + span
    buckets = list(rt.buckets(lo, hi))
    assert buckets[0] == rt.to_bucket(lo)
    assert buckets[-1] == rt.to_bucket(hi)
    assert buckets == sorted(buckets)


@given(TS, st.sampled_from(["daily", "monthly", "yearly"]))
@settings(max_examples=40)
def test_gregorian_normalize_idempotent(ts, step):
    gt = GregorianTime(step)
    n = gt.normalize(ts)
    assert gt.normalize(n) == n
    # ≤ up to utcfromtimestamp's microsecond rounding of float ts
    # (…999.9999995 rounds into the next bucket; reference-identical)
    assert n <= ts + 1e-3


@given(TS)
@settings(max_examples=40)
def test_gregorian_weekly_normalize_quirk_bounded(ts):
    """Weekly %Y%U is asymmetric BY REFERENCE DESIGN: to_bucket counts
    days before the first Sunday as week 00, but from_bucket maps week w
    to Jan1 + w*7d (kairos/timeseries.py:196-206 workaround). In years
    starting on Sunday normalize lands up to one week AFTER ts, so
    idempotency only holds within a one-week drift bound."""
    gt = GregorianTime("weekly")
    n = gt.normalize(ts)
    assert abs(n - ts) <= 7 * 86400
    # drift is a fixpoint after at most one extra application
    n2 = gt.normalize(n)
    assert abs(n2 - n) <= 7 * 86400


@given(TS, GSTEPS)
@settings(max_examples=40)
def test_gregorian_bucket_monotone(ts, step):
    gt = GregorianTime(step)
    b = gt.to_bucket(ts)
    nxt = gt.to_bucket(ts, 1)
    assert nxt > b
    if step != "weekly":
        # weekly from_bucket = Jan1 + w*7d can step backwards across a
        # 53-week year boundary (reference quirk, timeseries.py:196-206)
        assert gt.from_bucket(nxt) > gt.from_bucket(b)


@given(TS, GSTEPS)
@settings(max_examples=40)
def test_gregorian_step_size_positive_multiple_of_day(ts, step):
    gt = GregorianTime(step)
    size = gt.step_size(ts)
    assert size > 0
    assert size % 86400 == 0


@given(st.lists(TS, min_size=1, max_size=20), STEPS)
@settings(max_examples=20, deadline=None)
def test_column_twin_parity(spark, ts_list, step):
    """Driver kernel and JVM expression agree on arbitrary inputs."""
    from pyspark.sql import functions as F

    from kairos_spark.functions.buckets import relative_bucket

    rt = RelativeTime(step)
    df = spark.createDataFrame([(float(t),) for t in ts_list], "ts_sec double")
    got = [
        r[0]
        for r in df.select(
            relative_bucket(F.timestamp_seconds("ts_sec"), step)
        ).collect()
    ]
    # JVM path truncates sub-second parts first; both land in the same
    # bucket for integer steps
    assert got == [rt.normalize(int(t)) for t in ts_list]
