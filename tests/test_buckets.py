"""Column-expression bucket math must agree with the driver-side kernel
on a spread of timestamps (including leap years, year boundaries, and
%U week-00 edges)."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from kairos_spark.functions.buckets import (
    bucket_expr,
    gregorian_bucket_start,
    step_size_expr,
)
from kairos_spark.timemath import GregorianTime, RelativeTime

SAMPLE_TS = [
    0.0,
    1.0,
    86399.5,
    86400.0,
    1330473600.0,  # 2012-02-29 (leap day)
    1356912000.0,  # 2012-12-31 (week 53 edge)
    1357084800.0,  # 2013-01-02 (week 00)
    1704067199.25,
    1704067200.0,  # 2024-01-01
    1719791999.0,  # 2024-06-30
]


def _spark_buckets(spark, step):
    df = spark.createDataFrame([(t,) for t in SAMPLE_TS], "ts_sec double")
    col = bucket_expr(F.timestamp_seconds(F.col("ts_sec")), step)
    return [r[0] for r in df.select(col).collect()]


@pytest.mark.parametrize("step", [1, 60, 3600, 86400])
def test_relative_bucket_parity(spark, step):
    calc = RelativeTime(step)
    expected = [calc.normalize(t) for t in SAMPLE_TS]
    assert _spark_buckets(spark, step) == expected


@pytest.mark.parametrize("step", ["daily", "weekly", "monthly", "yearly"])
def test_gregorian_bucket_parity(spark, step):
    calc = GregorianTime(step)
    expected = [calc.to_bucket(t) for t in SAMPLE_TS]
    assert _spark_buckets(spark, step) == expected


@pytest.mark.parametrize("step", ["daily", "monthly", "yearly"])
def test_gregorian_bucket_start_parity(spark, step):
    calc = GregorianTime(step)
    codes = sorted({calc.to_bucket(t) for t in SAMPLE_TS})
    df = spark.createDataFrame([(c,) for c in codes], "bucket long")
    col = F.unix_timestamp(gregorian_bucket_start(F.col("bucket"), step))
    got = [r[0] for r in df.select(col).collect()]
    assert got == [calc.from_bucket(c) for c in codes]


def test_weekly_bucket_start_parity(spark):
    calc = GregorianTime("weekly")
    codes = [197000, 197001, 201252, 201300, 202426]
    df = spark.createDataFrame([(c,) for c in codes], "bucket long")
    col = F.unix_timestamp(gregorian_bucket_start(F.col("bucket"), "weekly"))
    got = [r[0] for r in df.select(col).collect()]
    assert got == [calc.from_bucket(c) for c in codes]


def test_step_size_expr_monthly_leap(spark):
    df = spark.createDataFrame([(201202,), (201302,), (201201,)], "bucket long")
    col = step_size_expr(F.col("bucket"), "monthly")
    got = dict(
        zip(
            [201202, 201302, 201201],
            [r[0] for r in df.select(col).collect()],
        )
    )
    assert got[201202] == 29 * 86400
    assert got[201302] == 28 * 86400
    assert got[201201] == 31 * 86400


def test_utc_session(spark):
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    dt = datetime(2024, 1, 1, tzinfo=timezone.utc)
    df = spark.createDataFrame([(dt,)], "ts timestamp")
    assert df.select(F.unix_timestamp("ts")).collect()[0][0] == 1704067200
