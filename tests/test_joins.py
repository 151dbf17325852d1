"""Unit + property tests for operators/joins.py (banded range join,
semi/anti wrappers). The banded join is checked against a brute-force
cross-product reference so the bucket-explode rewrite can't silently
drop band-edge pairs."""

import datetime as dt
import itertools
import random

import pytest
from pyspark.sql import Row, functions as F

from kairos_spark.operators import joins

UTC = dt.timezone.utc
BASE = dt.datetime(2024, 1, 1, tzinfo=UTC)


def _ts(sec):
    return BASE + dt.timedelta(seconds=sec)


def test_banded_range_join_basic(spark):
    left = spark.createDataFrame(
        [Row(k=1, lid=1, ts=_ts(100)), Row(k=1, lid=2, ts=_ts(1000)), Row(k=2, lid=3, ts=_ts(100))]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, rid=10, ts=_ts(50)),   # within 300 of lid=1
            Row(k=1, rid=11, ts=_ts(399)),  # within 300 of lid=1 (299.0)
            Row(k=1, rid=12, ts=_ts(401)),  # outside band of lid=1
            Row(k=2, rid=13, ts=_ts(395)),  # within 300 of lid=3
            Row(k=3, rid=14, ts=_ts(100)),  # key mismatch
        ]
    )
    out = joins.banded_range_join(left, right, ["k"], band_sec=300.0)
    pairs = {(r["lid"], r["rid"]) for r in out.collect()}
    assert pairs == {(1, 10), (1, 11), (3, 13)}


def test_banded_range_join_inclusive_edge(spark):
    # |diff| == band exactly must match (<=, not <)
    left = spark.createDataFrame([Row(k=1, lid=1, ts=_ts(600))])
    right = spark.createDataFrame([Row(k=1, rid=2, ts=_ts(300)), Row(k=1, rid=3, ts=_ts(900))])
    out = joins.banded_range_join(left, right, ["k"], band_sec=300.0)
    assert {r["rid"] for r in out.collect()} == {2, 3}


def test_banded_range_join_no_duplicate_pairs(spark):
    # same-bucket rows reachable via multiple explode offsets must
    # still produce each qualifying pair exactly once
    left = spark.createDataFrame([Row(k=1, lid=1, ts=_ts(150))])
    right = spark.createDataFrame([Row(k=1, rid=2, ts=_ts(150)), Row(k=1, rid=3, ts=_ts(160))])
    out = joins.banded_range_join(left, right, ["k"], band_sec=300.0)
    rows = out.collect()
    assert len(rows) == 2


def test_banded_range_join_vs_bruteforce(spark):
    rng = random.Random(7)
    lrows = [Row(k=rng.randint(1, 5), lid=i, ts=_ts(rng.uniform(0, 5000))) for i in range(60)]
    rrows = [Row(k=rng.randint(1, 5), rid=i, ts=_ts(rng.uniform(0, 5000))) for i in range(60)]
    band = 250.0
    expected = {
        (l.lid, r.rid)
        for l, r in itertools.product(lrows, rrows)
        if l.k == r.k and abs((l.ts - r.ts).total_seconds()) <= band
    }
    out = joins.banded_range_join(
        spark.createDataFrame(lrows), spark.createDataFrame(rrows), ["k"], band_sec=band
    )
    assert {(r["lid"], r["rid"]) for r in out.collect()} == expected


def test_banded_range_join_renames_collisions(spark):
    left = spark.createDataFrame([Row(k=1, ts=_ts(0), payload="L")])
    right = spark.createDataFrame([Row(k=1, ts=_ts(10), payload="R")])
    out = joins.banded_range_join(left, right, ["k"], band_sec=60.0)
    row = out.collect()[0]
    assert row["payload"] == "L" and row["r_payload"] == "R"
    assert row["ts"] != row["r_ts"]


def test_semi_and_anti_join(spark):
    left = spark.createDataFrame([Row(id=i) for i in range(6)])
    right = spark.createDataFrame([Row(rid=i) for i in (1, 3, 3, 5)])
    cond = left.id == right.rid
    semi = {r["id"] for r in joins.semi_join(left, right, cond).collect()}
    anti = {r["id"] for r in joins.anti_join(left, right, cond).collect()}
    assert semi == {1, 3, 5}
    assert anti == {0, 2, 4}
    # semi output never duplicates left rows even with dup matches
    assert joins.semi_join(left, right, cond).count() == 3


def test_banded_range_join_rename_target_already_taken(spark):
    # right side already has both ts and r_ts: the renamed ts must not
    # collide with the pre-existing r_ts column
    from kairos_spark.operators import joins

    left = spark.createDataFrame([(1, 100.0)], "k long, ts double")
    right = spark.createDataFrame([(1, 110.0, 7.0)], "k long, ts double, r_ts double")
    out = joins.banded_range_join(left, right, ["k"], band_sec=300.0)
    assert len(out.columns) == len(set(out.columns)), out.columns
    row = out.collect()[0]
    assert row["r_ts"] == 7.0 and row["r_ts_"] == 110.0
