"""Unit tests for sessionization and as-of join (operators/windows.py)."""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from kairos_spark.operators import windows

UTC = dt.timezone.utc


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second, tzinfo=UTC)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: two sessions (gap > 10 min between idx 2 and 3)
        Row(user_id=1, ts=_ts(0), event_id=1),
        Row(user_id=1, ts=_ts(5), event_id=2),
        Row(user_id=1, ts=_ts(9), event_id=3),
        Row(user_id=1, ts=_ts(30), event_id=4),
        # user 2: one session, single event
        Row(user_id=2, ts=_ts(7), event_id=5),
    ]
    return spark.createDataFrame(rows)


def test_sessionize_splits_on_gap(events):
    out = windows.sessionize(events, "user_id", "ts", gap_sec=600.0, order_col="event_id")
    got = {r["event_id"]: r["session_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1}


def test_sessionize_boundary_is_exclusive(spark):
    # a gap of exactly gap_sec does NOT start a new session (> not >=)
    rows = [Row(user_id=1, ts=_ts(0), event_id=1), Row(user_id=1, ts=_ts(10), event_id=2)]
    out = windows.sessionize(spark.createDataFrame(rows), gap_sec=600.0, order_col="event_id")
    assert {r["session_id"] for r in out.collect()} == {1}


def test_session_stats(events):
    out = {r["user_id"]: r for r in windows.session_stats(
        events, "user_id", "ts", gap_sec=600.0, order_col="event_id"
    ).collect()}
    assert out[1]["n_sessions"] == 2
    assert out[1]["n_events"] == 4
    assert out[1]["events_per_session"] == 2.0
    assert out[2]["n_sessions"] == 1


def test_asof_join_most_recent_prior(spark):
    left = spark.createDataFrame([
        Row(user_id=1, ts=_ts(10), eid=100),
        Row(user_id=1, ts=_ts(2), eid=101),
        Row(user_id=2, ts=_ts(5), eid=102),   # no right rows for user 2
    ])
    right = spark.createDataFrame([
        Row(user_id=1, ts=_ts(1), tag="a"),
        Row(user_id=1, ts=_ts(8), tag="b"),
        Row(user_id=1, ts=_ts(12), tag="c"),  # after both left rows
    ])
    out = windows.asof_join(left, right, ["user_id"], "ts", "ts", right_cols=["tag"])
    got = {r["eid"]: (r["tag_r"], r["ts_r"]) for r in out.collect()}
    assert got[100][0] == "b"          # most recent ≤ minute 10
    assert got[101][0] == "a"          # most recent ≤ minute 2
    assert got[102] == (None, None)    # left row with no match survives as null
    assert len(got) == 3


def test_asof_join_inclusive_at_equal_ts(spark):
    left = spark.createDataFrame([Row(user_id=1, ts=_ts(5), eid=1)])
    right = spark.createDataFrame([Row(user_id=1, ts=_ts(5), v=42.0)])
    out = windows.asof_join(left, right, ["user_id"], "ts", "ts", right_cols=["v"]).collect()
    assert out[0]["v_r"] == 42.0


def test_cohort_retention(spark):
    from pyspark.sql import functions as F
    from kairos_spark.operators import windows

    DAY = 86400
    rows = [
        # u1 signs up day 0, active day 0 and day 1
        (1, "signup", 10.0), (1, "click", DAY + 5.0),
        # u2 signs up day 0, active day 0 only
        (2, "signup", 20.0),
        # u3 signs up day 1, active day 1 and day 2
        (3, "signup", DAY + 9.0), (3, "view", 2 * DAY + 1.0),
        # u4 never signs up -> excluded entirely
        (4, "click", 30.0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, sec double").select(
        "user_id", "event_type", F.timestamp_seconds("sec").alias("ts")
    )
    got = {
        (r["cohort"], r["offset"]): (r["n_active"], r["cohort_size"], r["retention"])
        for r in windows.cohort_retention(ev).collect()
    }
    assert got == {
        (0, 0): (2, 2, 1.0),          # both day-0 signups active day 0
        (0, 1): (1, 2, 0.5),          # only u1 back on day 1
        (DAY, 0): (1, 1, 1.0),
        (DAY, 1): (1, 1, 1.0),
    }
