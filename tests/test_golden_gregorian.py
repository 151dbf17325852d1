"""Golden parity: the reference's Gregorian functional suite ported
assert-for-assert from /root/reference/test/functional/gregorian_helper.py
(calendar bucketing across month lengths, %Y%U Sunday-start weeks,
±N-interval Gregorian fan-out).

The reference mixes utcfromtimestamp (to_bucket) with local mktime
(from_bucket) — this engine normalizes to UTC (SURVEY.md §7 "Local vs
UTC"), so fixture timestamps are built with UTC datetimes; assert
values are unchanged."""

import datetime as dt

import pytest

from kairos_spark import Timeseries

UTC = dt.timezone.utc
HOUR = 3600


def _time(t: float = 0) -> float:
    return 500000 * HOUR + t


INTERVALS = {
    "daily": {"step": "daily", "steps": 5},
    "weekly": {"step": "weekly", "resolution": 60},
    "monthly": {"step": "monthly"},
    "yearly": {"step": "yearly"},
}


def make(spark):
    return Timeseries(spark, type="series", intervals=INTERVALS, value_type="long")


def _utc_ts(year, month, day):
    return dt.datetime(year, month, day, tzinfo=UTC).timestamp()


# ref: gregorian_helper.py:33-55 (test_insert_multiple_intervals_after)


def test_insert_multiple_intervals_after(spark):
    s = make(spark)
    weekly = s.intervals["weekly"]
    ts1 = _time(0)
    ts2 = weekly.i_calc.normalize(ts1, 1)
    ts3 = weekly.i_calc.normalize(ts1, 2)
    assert ts1 != ts2

    s.insert("test", 32, timestamp=ts1, intervals=1)
    assert s.get("test", "weekly", timestamp=ts1)[ts1] == [32]
    assert s.get("test", "weekly", timestamp=ts2)[ts2] == [32]

    s.insert("test", 42, timestamp=ts1, intervals=2)
    assert s.get("test", "weekly", timestamp=ts1)[ts1] == [32, 42]
    assert s.get("test", "weekly", timestamp=ts2)[ts2] == [32, 42]
    assert s.get("test", "weekly", timestamp=ts3)[ts3] == [42]


# ref: gregorian_helper.py:57-79 (test_insert_multiple_intervals_before)


def test_insert_multiple_intervals_before(spark):
    s = make(spark)
    weekly = s.intervals["weekly"]
    ts1 = _time(0)
    ts2 = weekly.i_calc.normalize(ts1, -1)
    ts3 = weekly.i_calc.normalize(ts1, -2)
    assert ts1 != ts2

    s.insert("test", 32, timestamp=ts1, intervals=-1)
    assert s.get("test", "weekly", timestamp=ts1)[ts1] == [32]
    assert s.get("test", "weekly", timestamp=ts2)[ts2] == [32]

    s.insert("test", 42, timestamp=ts1, intervals=-2)
    assert s.get("test", "weekly", timestamp=ts1)[ts1] == [32, 42]
    assert s.get("test", "weekly", timestamp=ts2)[ts2] == [32, 42]
    assert s.get("test", "weekly", timestamp=ts3)[ts3] == [42]


# ref: gregorian_helper.py:81-103 (test_get) — one insert per day of 2038


@pytest.fixture(scope="module")
def greg_year(spark):
    s = make(spark)
    base = dt.datetime(2038, 1, 1, tzinfo=UTC)
    s.bulk_insert(
        {(base + dt.timedelta(days=day)).timestamp(): {"test": [1]} for day in range(0, 365)}
    )
    return s


def test_gregorian_get_golden(greg_year):
    s = greg_year
    feb1 = _utc_ts(2038, 2, 1)

    data = s.get("test", "daily", timestamp=feb1)
    assert data[feb1] == [1]

    data = s.get("test", "weekly", timestamp=feb1)
    assert len(data) == 7
    assert list(data.values())[0] == [1]

    data = s.get("test", "weekly", timestamp=feb1, condensed=True)
    assert len(data) == 1
    assert list(data.values())[0] == 7 * [1]

    data = s.get("test", "monthly", timestamp=feb1)
    assert len(data[feb1]) == 28

    data = s.get("test", "yearly", timestamp=feb1)
    assert len(list(data.items())[0][1]) == 365


# ref: gregorian_helper.py:105-148 (test_series) — two years of daily points


@pytest.fixture(scope="module")
def greg_two_years(spark):
    s = make(spark)
    base = dt.datetime(2038, 1, 1, tzinfo=UTC)
    s.bulk_insert(
        {
            (base + dt.timedelta(days=day)).timestamp(): {"test": [1]}
            for day in range(0, 2 * 365)
        }
    )
    return s


def test_gregorian_series_golden(greg_two_years):
    s = greg_two_years
    start = _utc_ts(2038, 1, 1)
    end = _utc_ts(2038, 12, 31)

    data = s.series("test", "daily", start=start, end=end)
    assert len(data) == 365
    assert list(data.values())[0] == [1]
    assert list(data.values())[-1] == [1]

    data = s.series("test", "weekly", start=start, end=end)
    assert len(data) == 53
    vals = list(data.values())
    assert len(vals[0]) == 2    # 2038-01-01 is a Friday: week 00 = Fri+Sat
    assert len(vals[1]) == 7
    assert len(vals[-1]) == 6   # week 52 = Dec 26-31
    assert list(vals[0].values())[0] == [1]
    assert list(vals[-1].values())[0] == [1]

    data = s.series("test", "weekly", start=start, end=end, condensed=True)
    assert len(data) == 53
    vals = list(data.values())
    assert vals[0] == 2 * [1]
    assert vals[1] == 7 * [1]
    assert vals[-1] == 6 * [1]

    data = s.series("test", "monthly", start=start, end=end)
    assert len(data) == 12
    vals = list(data.values())
    assert len(vals[0]) == 31   # jan
    assert len(vals[1]) == 28   # feb (2038 not a leap year)
    assert len(vals[3]) == 30   # april

    data = s.series("test", "yearly", start=start, end=end)
    assert len(data) == 1
    assert len(list(data.values())[0]) == 365

    data = s.series("test", "yearly", start=start, steps=2)
    assert len(data) == 2
    assert len(list(data.values())[0]) == 365

    data = s.series("test", "yearly", end=end, steps=2)
    assert len(data) == 2
    assert list(data.values())[0] == []
    assert len(list(data.values())[1]) == 365
