"""Unit tests for the trailing-window trend operators
(anomaly_zscore, ewma_smooth, rolling_distinct, funnel) and the
round-3 text/dedup additions (tfidf, bigram LM, normalized dedup,
containment pairs)."""

import datetime as dt
import math

import pytest
from pyspark.sql import Row

from kairos_spark.operators import dedup, text, windows

UTC = dt.timezone.utc


def _h(hour, minute=0):
    return dt.datetime(2024, 1, 1, hour, minute, tzinfo=UTC)


def test_anomaly_zscore_flags_spike(spark):
    # 4 quiet hours (1 event each) then a 10-event spike; lookback=4
    rows = [Row(event_type="a", ts=_h(h)) for h in range(4)]
    rows += [Row(event_type="a", ts=_h(4, m)) for m in range(10)]
    out = windows.anomaly_zscore(
        spark.createDataFrame(rows), step_sec=3600, lookback=4, z_thresh=2.0
    ).collect()
    # only hour 4 has a full trailing window
    assert len(out) == 1
    r = out[0]
    assert r["i_time"] == int(_h(4).timestamp())
    assert r["n"] == 10
    assert r["mean_n"] == 1.0
    # stddev of [1,1,1,1] is 0 -> z defined as 0, not anomalous (can't
    # score against a flat window)
    assert r["zscore"] == 0.0 and not r["is_anomaly"]


def test_anomaly_zscore_nonzero_sd(spark):
    rows = []
    for h, n in enumerate([1, 2, 1, 2]):
        rows += [Row(event_type="a", ts=_h(h, m)) for m in range(n)]
    rows += [Row(event_type="a", ts=_h(4, m)) for m in range(12)]
    out = windows.anomaly_zscore(
        spark.createDataFrame(rows), step_sec=3600, lookback=4, z_thresh=2.0
    ).collect()
    assert len(out) == 1
    r = out[0]
    mu, sd = 1.5, (4 * 0.25 / 3) ** 0.5
    assert r["zscore"] == round((12 - mu) / sd, 6)
    assert r["is_anomaly"]


def test_ewma_renormalizes_at_series_head(spark):
    rows = [Row(event_type="a", ts=_h(0)),
            Row(event_type="a", ts=_h(1)), Row(event_type="a", ts=_h(1, 1))]
    out = {r["i_time"]: r["ewma"] for r in windows.ewma_smooth(
        spark.createDataFrame(rows), step_sec=3600, alpha=0.5, k=4
    ).collect()}
    # head: only lag 0 exists -> ewma == n
    assert out[int(_h(0).timestamp())] == 1.0
    # second: (2 + 0.5*1) / (1 + 0.5)
    assert out[int(_h(1).timestamp())] == round(2.5 / 1.5, 6)


def test_rolling_distinct_counts_window_users(spark):
    day = 86400
    rows = [
        Row(user_id=1, ts=dt.datetime.fromtimestamp(0 * day, UTC)),
        Row(user_id=2, ts=dt.datetime.fromtimestamp(1 * day, UTC)),
        Row(user_id=1, ts=dt.datetime.fromtimestamp(2 * day, UTC)),
    ]
    out = {r["w_end"]: r["n_users"] for r in windows.rolling_distinct(
        spark.createDataFrame(rows), step_sec=day, window_steps=2
    ).collect()}
    # window ends past the last active day are dropped
    assert out == {0: 1, day: 2, 2 * day: 2}


def test_funnel_strict_ordering(spark):
    t = lambda m: _h(0, m)
    rows = [
        # user 1 completes a->b->c in order
        Row(user_id=1, event_type="a", ts=t(0)),
        Row(user_id=1, event_type="b", ts=t(1)),
        Row(user_id=1, event_type="c", ts=t(2)),
        # user 2 does b BEFORE a -> stops at stage 1
        Row(user_id=2, event_type="b", ts=t(0)),
        Row(user_id=2, event_type="a", ts=t(1)),
        # user 3 never signs up -> counted nowhere
        Row(user_id=3, event_type="b", ts=t(0)),
    ]
    out = {r["stage"]: r for r in windows.funnel(
        spark.createDataFrame(rows), ["a", "b", "c"]
    ).collect()}
    assert out[1]["n_users"] == 2
    assert out[2]["n_users"] == 1
    assert out[3]["n_users"] == 1
    assert out[2]["conversion"] == 0.5


def test_tfidf_ubiquitous_term_scores_zero(spark):
    docs = spark.createDataFrame([
        Row(doc_id=1, text="apple apple banana"),
        Row(doc_id=2, text="apple cherry"),
    ])
    out = text.tfidf_top_terms(docs, k=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["token"]] = r
    # 'apple' appears in every doc -> idf = ln(1) = 0
    assert by_doc[1]["apple"]["score"] == 0.0
    # 'banana' in doc 1: tf=1, idf=ln(2)
    assert by_doc[1]["banana"]["score"] == round(math.log(2), 6)
    # ranking: banana (positive) above apple (zero) despite tf 2
    assert by_doc[1]["banana"]["rank"] == 1


def test_bigram_lm_prefers_frequent_transitions(spark):
    docs = spark.createDataFrame([
        Row(doc_id=i, text="the cat sat") for i in range(1, 4)
    ] + [Row(doc_id=4, text="cat the sat")])
    out = {r["doc_id"]: r for r in text.bigram_lm_score(docs).collect()}
    assert out[1]["n_bigrams"] == 2
    # corpus: V=3; C(the cat)=3, C(the .)=4; C(cat sat)=3, C(cat .)=4
    expect1 = (math.log(4 / 7) + math.log(4 / 7)) / 2
    assert out[1]["lm_score"] == pytest.approx(expect1, abs=2e-6)
    # doc 4's unseen transitions score strictly lower
    assert out[4]["lm_score"] < out[1]["lm_score"]


def test_normalized_dedup_catches_recased_copy(spark):
    docs = spark.createDataFrame([
        Row(doc_id=1, text="Hello,   World!"),
        Row(doc_id=2, text="hello world"),
        Row(doc_id=3, text="different"),
    ])
    out = dedup.normalized_dup_groups(docs).collect()
    assert len(out) == 1
    assert out[0]["n_docs"] == 2 and out[0]["keep_id"] == 1


def test_containment_catches_prefix_truncation(spark):
    base = "the quick brown fox jumps over the lazy dog many times daily"
    docs = spark.createDataFrame([
        Row(doc_id=1, text=base),
        Row(doc_id=2, text=base[: int(len(base) * 0.5)]),
        Row(doc_id=3, text="completely unrelated content with other words"),
    ])
    out = dedup.containment_pairs(docs, n=8, threshold=0.8).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [(1, 2)]
    assert out[0]["containment"] >= 0.9


def test_trend_slope_exact_line(spark):
    # counts 2, 4, 6 on consecutive days: slope 2/day, intercept 2, R²=1
    rows = []
    for d, n in ((1, 2), (2, 4), (3, 6)):
        rows += [Row(event_type="a", ts=dt.datetime(2024, 1, d, tzinfo=UTC))] * n
    out = windows.trend_slope(
        spark.createDataFrame(rows), step_sec=86400
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_buckets == 3
    assert r.slope == 2.0 and r.intercept == 2.0 and r.r2 == 1.0


def test_trend_slope_flat_series(spark):
    rows = [
        Row(event_type="a", ts=dt.datetime(2024, 1, d, tzinfo=UTC))
        for d in (1, 2, 3)
    ]
    r = windows.trend_slope(spark.createDataFrame(rows), step_sec=86400).collect()[0]
    # constant y: slope 0; zero y-variance -> r2 defined as 1.0
    assert r.slope == 0.0 and r.intercept == 1.0 and r.r2 == 1.0


def test_trend_slope_single_bucket_dropped(spark):
    rows = [Row(event_type="a", ts=dt.datetime(2024, 1, 1, tzinfo=UTC))]
    assert windows.trend_slope(spark.createDataFrame(rows), step_sec=86400).collect() == []


def test_debounce_drops_rapid_repeats(spark):
    base = dt.datetime(2024, 1, 1, tzinfo=UTC)
    rows = [
        Row(user_id=1, event_type="a", event_id=i,
            ts=base + dt.timedelta(seconds=s))
        for i, s in enumerate([0, 2, 4, 100, 101])
    ]
    r = windows.debounce_stats(
        spark.createDataFrame(rows), ["user_id", "event_type"], "ts",
        min_gap_sec=5.0, order_col="event_id",
    ).collect()[0]
    # kept: t=0 (first), t=100 (gap 96); dropped: 2, 4, 101
    assert r.n_events == 5 and r.n_kept == 2
    assert r.drop_rate == 0.6


def test_debounce_keys_isolated(spark):
    base = dt.datetime(2024, 1, 1, tzinfo=UTC)
    rows = [
        Row(user_id=1, event_type="a", event_id=1, ts=base),
        Row(user_id=1, event_type="b", event_id=2, ts=base + dt.timedelta(seconds=1)),
    ]
    r = windows.debounce_stats(
        spark.createDataFrame(rows), ["user_id", "event_type"], "ts", min_gap_sec=5.0
    ).collect()[0]
    # different event_type -> both are firsts of their group
    assert r.n_kept == 2 and r.drop_rate == 0.0


def test_count_correlation_perfect_and_inverse(spark):
    rows = []
    for h, (na, nb, nc) in enumerate([(1, 2, 3), (2, 4, 2), (3, 6, 1)]):
        t = dt.datetime(2024, 1, 1, h, tzinfo=UTC)
        rows += [Row(event_type="a", ts=t)] * na
        rows += [Row(event_type="b", ts=t)] * nb
        rows += [Row(event_type="c", ts=t)] * nc
    out = {
        (r.key_a, r.key_b): r.corr
        for r in windows.count_correlation(
            spark.createDataFrame(rows), step_sec=3600
        ).collect()
    }
    assert out[("a", "b")] == 1.0   # b = 2a
    assert out[("a", "c")] == -1.0  # c = 4 - a


def test_mean_shift_changepoints_detects_level_shift(spark):
    from datetime import datetime, timezone

    from kairos_spark.operators import windows

    rows = []
    # 20 days of counts: days 0-9 one event/day, days 10-19 five/day —
    # the shift lands exactly at day 10
    for d in range(20):
        per_day = 1 if d < 10 else 5
        for i in range(per_day):
            rows.append(
                ("load", datetime(2024, 3, 1 + d, 6 + i, 0, tzinfo=timezone.utc))
            )
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = windows.mean_shift_changepoints(
        df, step_sec=86400, window=7, min_score=2.0
    ).collect()
    assert len(out) == 1
    r = out[0]
    shift_day = datetime(2024, 3, 11, tzinfo=timezone.utc)
    assert r.cp_time == int(shift_day.timestamp())
    # constant 1s vs constant 5s windows -> zero pooled variance ->
    # infinite-confidence shift
    assert r.cp_score == float("inf")
    assert r.n_shifts >= 1


def test_mean_shift_changepoints_flat_series_quiet(spark):
    from datetime import datetime, timezone

    from kairos_spark.operators import windows

    rows = [
        ("flat", datetime(2024, 3, 1 + d, 6, 0, tzinfo=timezone.utc))
        for d in range(20)
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = windows.mean_shift_changepoints(df, window=7, min_score=2.0).collect()
    assert len(out) == 1
    assert out[0].cp_score == 0.0 and out[0].n_shifts == 0
