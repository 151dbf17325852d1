"""Property-based tests: sessionize and asof_join against brute-force
Python references on small random inputs. Few examples (each runs a
Spark job); the golden tests cover the fixed cases."""

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row, functions as F

from kairos_spark.operators import windows

UTC = dt.timezone.utc
BASE = 1_700_000_000


def _dt(sec):
    return dt.datetime.fromtimestamp(BASE + sec, tz=UTC)


# up to 3 keys, up to 8 events each, offsets within ~2 gap-widths
EVENTS = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 2000)), min_size=1, max_size=12
)


@settings(max_examples=8, deadline=None)
@given(EVENTS)
def test_sessionize_matches_bruteforce(spark, events):
    gap = 600.0
    rows = [
        Row(user_id=k, ts=_dt(off), event_id=i) for i, (k, off) in enumerate(events)
    ]
    out = windows.sessionize(
        spark.createDataFrame(rows), "user_id", "ts", gap_sec=gap, order_col="event_id"
    ).collect()

    # brute force: per key, sorted by (ts, event_id), count gap starts
    expected = {}
    per_key = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.ts, r.event_id)):
        sec = r.ts.timestamp()
        prev = per_key.get(r.user_id)
        if prev is None or sec - prev[0] > gap:
            sid = (prev[1] if prev else 0) + 1
        else:
            sid = prev[1]
        per_key[r.user_id] = (sec, sid)
        expected[r.event_id] = sid
    got = {r["event_id"]: r["session_id"] for r in out}
    assert got == expected


ASOF = st.tuples(
    st.lists(st.tuples(st.integers(1, 2), st.integers(0, 100)), max_size=8),
    st.lists(st.tuples(st.integers(1, 2), st.integers(0, 100)), max_size=8),
)


@settings(max_examples=8, deadline=None)
@given(ASOF)
def test_asof_join_matches_bruteforce(spark, lr):
    lefts, rights = lr
    lrows = [Row(k=k, ts=_dt(off), eid=i) for i, (k, off) in enumerate(lefts)]
    rrows = [Row(k=k, ts=_dt(off)) for k, off in rights]
    if not lrows:
        return
    left = spark.createDataFrame(lrows)
    right = (
        spark.createDataFrame(rrows)
        if rrows
        else spark.createDataFrame([], "k bigint, ts timestamp")
    )
    out = windows.asof_join(left, right, ["k"], "ts", "ts").collect()

    got = {r["eid"]: r["ts_r"] for r in out}
    expected = {}
    for l in lrows:
        cand = [r.ts for r in rrows if r.k == l.k and r.ts <= l.ts]
        expected[l.eid] = max(cand) if cand else None
    norm = {
        e: (t.replace(tzinfo=UTC) if t is not None and t.tzinfo is None else t)
        for e, t in got.items()
    }
    assert norm == expected
    assert len(out) == len(lrows)  # every left row survives exactly once
