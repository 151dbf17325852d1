"""Unit tests for the driver-side time kernel.

Golden values taken from the reference's own unit suite
(/root/reference/test/unit/timeseries_test.py) — except that where the
reference builds fixture timestamps with local-time ``time.mktime``, we
build them with UTC (this engine is UTC-normalized; see
kairos_spark.timemath docstring). The assertions (bucket lists,
leap-year variable step sizes) are identical because they measure
bucket *differences*.
"""

import calendar
import time
from datetime import datetime

import pytest

from kairos_spark.timemath import GregorianTime, RelativeTime, resolve_time

DAY = 86400


def utc_ts(year, month, day):
    return calendar.timegm(datetime(year, month, day).timetuple())


def test_resolve_time():
    assert resolve_time(None) is None
    assert resolve_time(60) == 60
    assert resolve_time("90") == 90
    assert resolve_time("2h") == 7200
    assert resolve_time("30d") == 30 * DAY
    assert resolve_time("1w") == 7 * DAY
    assert resolve_time("1m") == 30 * DAY
    assert resolve_time("1y") == 365 * DAY
    assert resolve_time("daily") == "daily"
    with pytest.raises(ValueError):
        resolve_time("fortnightly")


def test_relative_step_size():
    rt = RelativeTime(DAY)
    assert rt.step_size() == DAY
    assert rt.step_size(0, 0) == DAY
    assert rt.step_size(0, DAY / 2) == DAY
    assert rt.step_size(0, DAY - 1) == DAY
    assert rt.step_size(0, DAY) == 2 * DAY
    assert rt.step_size(0, DAY + 3600) == 2 * DAY
    assert rt.step_size(0, 2 * DAY + 1) == 3 * DAY
    assert rt.step_size(DAY + 1, 2 * DAY) == 2 * DAY


def test_relative_ttl():
    rt = RelativeTime(DAY)
    now = time.time()
    assert rt.ttl(3) == 3 * DAY
    assert rt.ttl(3, relative_time=now) == 3 * DAY
    assert rt.ttl(3, relative_time=now + DAY) == 4 * DAY
    assert rt.ttl(3, relative_time=now + 5 * DAY) == 8 * DAY
    assert rt.ttl(3, relative_time=now - DAY) == 2 * DAY
    assert rt.ttl(3, relative_time=now - 2 * DAY) == DAY
    assert rt.ttl(3, relative_time=now - 3 * DAY) == 0
    assert rt.ttl(None) is None


def test_relative_roundtrip():
    rt = RelativeTime(60)
    assert rt.to_bucket(123.7) == 2
    assert rt.from_bucket(2) == 120
    assert rt.normalize(123.7) == 120
    assert rt.normalize(123.7, 2) == 240
    assert list(rt.buckets(0, 180)) == [0, 1, 2, 3]


def test_gregorian_buckets():
    gt = GregorianTime("daily")
    buckets = gt.buckets(0, DAY * 42)
    assert buckets[:3] == [19700101, 19700102, 19700103]
    # The reference golden ends at 19700211 because its from_bucket uses
    # local-time mktime (west of UTC there, bucket 19700212's start ends
    # up past `end`). Under this engine's UTC normalization the bucket
    # start equals `end` exactly, and buckets() includes the == case
    # (reference logic, timeseries.py:220-223).
    assert buckets[-3:] == [19700210, 19700211, 19700212]

    gt = GregorianTime("weekly")
    assert gt.buckets(0, DAY * 25) == [197000, 197001, 197002, 197003]

    gt = GregorianTime("monthly")
    assert gt.buckets(0, DAY * 70) == [197001, 197002, 197003]

    gt = GregorianTime("yearly")
    assert gt.buckets(0, DAY * 800) == [1970, 1971, 1972]


def test_gregorian_step_size_leap_year():
    gtd, gtm, gty = GregorianTime("daily"), GregorianTime("monthly"), GregorianTime("yearly")
    t0 = utc_ts(2012, 1, 1)
    t1 = utc_ts(2012, 1, 5)
    t2 = utc_ts(2012, 2, 13)
    t3 = utc_ts(2012, 2, 29)
    t4 = utc_ts(2012, 3, 5)

    assert gtd.step_size(t0) == DAY
    assert gtm.step_size(t0) == 31 * DAY
    assert gty.step_size(t0) == 366 * DAY
    assert gtd.step_size(t2) == DAY
    assert gtm.step_size(t0, t1) == 31 * DAY
    assert gtm.step_size(t1, t2) == 60 * DAY
    assert gtm.step_size(t2, t3) == 29 * DAY
    assert gtm.step_size(t1, t4) == 91 * DAY
    assert gtm.step_size(t2, t4) == 60 * DAY


def test_gregorian_step_size_non_leap_year():
    gtd, gtm, gty = GregorianTime("daily"), GregorianTime("monthly"), GregorianTime("yearly")
    t0 = utc_ts(2013, 1, 1)
    t1 = utc_ts(2013, 1, 5)
    t2 = utc_ts(2013, 2, 13)
    t3 = utc_ts(2013, 2, 28)
    t4 = utc_ts(2013, 3, 5)

    assert gtd.step_size(t0) == DAY
    assert gtm.step_size(t0) == 31 * DAY
    assert gty.step_size(t0) == 365 * DAY
    assert gtd.step_size(t2) == DAY
    assert gtm.step_size(t0, t1) == 31 * DAY
    assert gtm.step_size(t1, t2) == 59 * DAY
    assert gtm.step_size(t2, t3) == 28 * DAY
    assert gtm.step_size(t1, t4) == 90 * DAY
    assert gtm.step_size(t2, t4) == 59 * DAY


def test_gregorian_ttl():
    gt = GregorianTime("daily")
    now = time.time()
    assert gt.ttl(3) == 3 * DAY
    assert gt.ttl(3, relative_time=now) == 3 * DAY
    assert gt.ttl(3, relative_time=now + DAY) == 4 * DAY
    assert gt.ttl(3, relative_time=now + 5 * DAY) == 8 * DAY
    assert gt.ttl(3, relative_time=now - DAY) == 2 * DAY
    assert gt.ttl(3, relative_time=now - 2 * DAY) == DAY
    assert gt.ttl(3, relative_time=now - 3 * DAY) == 0


def test_gregorian_weekly_roundtrip():
    gt = GregorianTime("weekly")
    # week 0 of 1970: Jan 1 (Thursday) is before the first Sunday
    assert gt.to_bucket(0) == 197000
    # from_bucket is Jan1 + week*7d (reference strptime workaround)
    assert gt.from_bucket(197001) == 7 * DAY
    assert gt.normalize(8 * DAY) == 7 * DAY
