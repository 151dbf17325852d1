"""Unit tests for the round-4 event-profiling operators:
session transitions, merged activity intervals, seasonal baseline,
key-skew diagnostics, pivot counts."""

import datetime as dt
import math

from pyspark.sql import Row

from kairos_spark.operators import profiling, windows

UTC = dt.timezone.utc


def _t(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second, tzinfo=UTC)


def _h(hour, day=1):
    return dt.datetime(2024, 1, day, hour, 0, tzinfo=UTC)


# --- session_transitions ---


def test_session_transitions_counts_within_session(spark):
    # one user, one session: a -> b -> a; plus a second session (b -> a)
    # after a 2-hour gap — the cross-gap pair (a -> b) must NOT count
    rows = [
        Row(user_id=1, event_id=1, event_type="a", ts=_t(0)),
        Row(user_id=1, event_id=2, event_type="b", ts=_t(1)),
        Row(user_id=1, event_id=3, event_type="a", ts=_t(2)),
        Row(user_id=1, event_id=4, event_type="b", ts=_h(3)),
        Row(user_id=1, event_id=5, event_type="a", ts=_h(3) + dt.timedelta(minutes=1)),
    ]
    out = windows.session_transitions(
        spark.createDataFrame(rows), gap_sec=1800.0, order_col="event_id"
    ).collect()
    got = {(r.from_type, r.to_type): r.n_transitions for r in out}
    assert got == {("a", "b"): 1, ("b", "a"): 2}
    shares = {(r.from_type, r.to_type): r.share for r in out}
    assert shares[("a", "b")] == 1.0 and shares[("b", "a")] == 1.0


def test_session_transitions_tie_broken_by_order_col(spark):
    # two events at the same timestamp: event_id decides the direction
    rows = [
        Row(user_id=1, event_id=2, event_type="late", ts=_t(0)),
        Row(user_id=1, event_id=1, event_type="early", ts=_t(0)),
    ]
    out = windows.session_transitions(
        spark.createDataFrame(rows), gap_sec=60.0, order_col="event_id"
    ).collect()
    assert [(r.from_type, r.to_type) for r in out] == [("early", "late")]


# --- merged_activity_intervals ---


def test_merged_intervals_overlap_and_islands(spark):
    # events at 0s and 400s with ±300s pad: [-300,300] and [100,700]
    # overlap into one island [-300,700]; an event at 2000s is its own
    # island [1700,2300]
    rows = [
        Row(user_id=1, ts=_t(0, 0)),
        Row(user_id=1, ts=_t(6, 40)),
        Row(user_id=1, ts=_t(33, 20)),
    ]
    out = windows.merged_activity_intervals(
        spark.createDataFrame(rows), pad_sec=300
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_intervals == 2
    assert r.covered_sec == 1000.0 + 600.0
    assert r.longest_sec == 1000.0


def test_merged_intervals_touching_intervals_merge(spark):
    # ends exactly touching (gap == 2*pad): NOT s > prev_end, so merge
    rows = [Row(user_id=1, ts=_t(0)), Row(user_id=1, ts=_t(10))]
    out = windows.merged_activity_intervals(
        spark.createDataFrame(rows), pad_sec=300
    ).collect()
    assert out[0].n_intervals == 1
    assert out[0].covered_sec == 1200.0


def test_merged_intervals_per_key_isolation(spark):
    rows = [Row(user_id=1, ts=_t(0)), Row(user_id=2, ts=_t(1))]
    out = {
        r.user_id: r
        for r in windows.merged_activity_intervals(
            spark.createDataFrame(rows), pad_sec=60
        ).collect()
    }
    assert out[1].n_intervals == 1 and out[2].n_intervals == 1
    assert out[1].covered_sec == 120.0


# --- seasonal_baseline ---


def test_seasonal_baseline_same_hour_of_day(spark):
    # hour 5 on two days: 2 and 4 events -> baseline 3.0, ratios 2/3, 4/3
    rows = [Row(event_type="a", ts=_h(5, day=1))] * 2
    rows += [Row(event_type="a", ts=_h(5, day=2))] * 4
    out = windows.seasonal_baseline(
        spark.createDataFrame(rows), step_sec=3600, period=24
    ).collect()
    assert {r.slot for r in out} == {5}
    by_n = {r.n: r for r in out}
    assert by_n[2].baseline == 3.0 and by_n[2].ratio == round(2 / 3, 6)
    assert by_n[4].ratio == round(4 / 3, 6)


def test_seasonal_baseline_slots_are_independent(spark):
    rows = [Row(event_type="a", ts=_h(5))] * 2 + [Row(event_type="a", ts=_h(6))] * 8
    out = {
        r.slot: r
        for r in windows.seasonal_baseline(
            spark.createDataFrame(rows), step_sec=3600, period=24
        ).collect()
    }
    assert out[5].ratio == 1.0 and out[6].ratio == 1.0
    assert out[5].baseline == 2.0 and out[6].baseline == 8.0


# --- key_distribution ---


def test_key_distribution_uniform_vs_skewed(spark):
    rows = [Row(g="uniform", k=i) for i in range(4)]
    rows += [Row(g="skewed", k=0)] * 9 + [Row(g="skewed", k=1)]
    out = {
        r.name: r
        for r in profiling.key_distribution(
            spark.createDataFrame(rows), "g", "k"
        ).collect()
    }
    u, s = out["uniform"], out["skewed"]
    assert u.n_rows == 4 and u.n_keys == 4
    assert u.top_share == 0.25 and u.hhi == 0.25
    assert u.entropy == round(math.log(4), 6)
    assert s.n_rows == 10 and s.n_keys == 2
    assert s.top_share == 0.9
    assert s.hhi == round(0.81 + 0.01, 6)
    expect = -(0.9 * math.log(0.9) + 0.1 * math.log(0.1))
    assert abs(s.entropy - expect) < 1e-6


def test_key_distribution_single_key_degenerate(spark):
    rows = [Row(g="one", k=7)] * 5
    r = profiling.key_distribution(spark.createDataFrame(rows), "g", "k").collect()[0]
    assert r.top_share == 1.0 and r.entropy == 0.0 and r.hhi == 1.0


# --- pivot_counts ---


def test_pivot_counts_explicit_categories_zero_fill(spark):
    rows = [
        Row(event_type="a", ts=_h(0)),
        Row(event_type="a", ts=_h(0)),
        Row(event_type="b", ts=_h(1)),
    ]
    out = {
        r.i_time: r
        for r in profiling.pivot_counts(
            spark.createDataFrame(rows), "event_type", ["a", "b", "c"], step_sec=3600
        ).collect()
    }
    h0, h1 = int(_h(0).timestamp()), int(_h(1).timestamp())
    assert (out[h0].n_a, out[h0].n_b, out[h0].n_c) == (2, 0, 0)
    assert (out[h1].n_a, out[h1].n_b, out[h1].n_c) == (0, 1, 0)


def test_pivot_counts_discovering_mode_matches_explicit(spark):
    rows = [Row(event_type="x", ts=_h(0)), Row(event_type="y", ts=_h(0))]
    df = spark.createDataFrame(rows)
    auto = profiling.pivot_counts(df, "event_type", None, step_sec=3600)
    assert set(auto.columns) == {"i_time", "n_x", "n_y"}
    r = auto.collect()[0]
    assert r.n_x == 1 and r.n_y == 1


# --- mad_outliers ---


def test_mad_outliers_flags_only_the_wild_value(spark):
    import datetime as dt

    vals = [10.0, 11.0, 12.0, 13.0, 14.0, 1000.0]
    rows = [
        Row(event_type="a", value=v, ts=dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc))
        for v in vals
    ]
    r = profiling.mad_outliers(spark.createDataFrame(rows), k=3.0).collect()[0]
    assert r.n == 6
    assert r.median == 12.5
    # deviations from 12.5: [2.5, 1.5, 0.5, 0.5, 1.5, 987.5] -> MAD 1.5
    assert r.mad == 1.5
    assert r.n_outliers == 1 and r.outlier_frac == round(1 / 6, 6)


def test_mad_outliers_robust_to_contamination(spark):
    import datetime as dt

    # stddev-based z would be dragged by the outliers; MAD is not
    vals = [5.0] * 8 + [500.0, 600.0]
    rows = [
        Row(event_type="a", value=v, ts=dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc))
        for v in vals
    ]
    r = profiling.mad_outliers(spark.createDataFrame(rows), k=3.0).collect()[0]
    assert r.median == 5.0 and r.mad == 0.0
    assert r.n_outliers == 2  # mad=0 -> any deviation is an outlier


# --- schema_profile / fk_conformance / frequency_spectrum ---


def test_schema_profile_nulls_and_cardinality(spark):
    rows = [
        Row(a=1, b="x"),
        Row(a=2, b=None),
        Row(a=2, b="y"),
    ]
    out = {
        r.column_name: r
        for r in profiling.schema_profile(spark.createDataFrame(rows)).collect()
    }
    assert out["a"].n_rows == 3 and out["a"].n_null == 0
    assert out["a"].n_distinct == 2
    assert (out["a"].min_str, out["a"].max_str) == ("1", "2")
    assert out["b"].n_null == 1 and out["b"].null_rate == round(1 / 3, 6)
    assert out["b"].n_distinct == 2  # nulls not counted as distinct


def test_fk_conformance_counts_orphans(spark):
    child = spark.createDataFrame([Row(k=1), Row(k=2), Row(k=2), Row(k=9)])
    parent = spark.createDataFrame([Row(p=1), Row(p=2)])
    r = profiling.fk_conformance(child, parent, "k", "p", "child.k").collect()[0]
    assert r.fk == "child.k"
    assert r.n_child == 4 and r.n_orphans == 1 and r.n_orphan_keys == 1
    assert r.orphan_rate == 0.25


def test_fk_conformance_clean_key_zeroes(spark):
    child = spark.createDataFrame([Row(k=1), Row(k=1)])
    parent = spark.createDataFrame([Row(p=1), Row(p=2)])
    r = profiling.fk_conformance(child, parent, "k", "p", "fk").collect()[0]
    assert r.n_orphans == 0 and r.orphan_rate == 0.0


def test_frequency_spectrum_zipf_counts(spark):
    from kairos_spark.operators import text as text_ops

    # tokens: a x3, b x2, c x2, d x1 -> spectrum: f=1:1, f=2:2, f=3:1
    rows = [Row(doc_id=1, text="a a a b b"), Row(doc_id=2, text="c c d")]
    out = {
        r.freq: r
        for r in text_ops.frequency_spectrum(spark.createDataFrame(rows)).collect()
    }
    assert out[1].n_tokens == 1 and out[2].n_tokens == 2 and out[3].n_tokens == 1
    # mass: f1=1, f2=4, f3=3, total 8; cumulative shares 1/8, 5/8, 1.0
    assert out[1].cum_mass_share == 0.125
    assert out[2].cum_mass_share == 0.625
    assert out[3].cum_mass_share == 1.0


# --- snapshot_diff ---


def test_snapshot_diff_classifies_all_states(spark):
    old = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
    )
    new = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="B"), Row(k=4, v="d")]
    )
    out = {
        r.status: r.n_keys
        for r in profiling.snapshot_diff(old, new, "k", ["v"]).collect()
    }
    assert out == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}


def test_snapshot_diff_multi_column_digest(spark):
    old = spark.createDataFrame([Row(k=1, a="x", b="y")])
    new = spark.createDataFrame([Row(k=1, a="x", b="z")])
    out = profiling.snapshot_diff(old, new, "k", ["a", "b"]).collect()
    assert out[0].status == "changed"
    same = profiling.snapshot_diff(old, old, "k", ["a", "b"]).collect()
    assert same[0].status == "unchanged"


# --- fd_check / tile_summary ---


def test_fd_check_true_and_violated(spark):
    rows = [
        Row(a=1, b="x", c="p"),
        Row(a=2, b="y", c="p"),
        Row(a=2, b="y", c="q"),  # a=2 maps to two c values
    ]
    out = {
        r.fd: r
        for r in profiling.fd_check(
            spark.createDataFrame(rows), [("a", "b"), ("a", "c")]
        ).collect()
    }
    assert out["a->b"].holds and out["a->b"].n_violating == 0
    assert not out["a->c"].holds
    assert out["a->c"].n_violating == 1
    assert out["a->c"].n_lhs == 2 and out["a->c"].n_pairs == 3


def test_tile_summary_even_split_and_order(spark):
    rows = [Row(id=i, v=float(100 - i)) for i in range(10)]
    out = sorted(
        profiling.tile_summary(spark.createDataFrame(rows), "v", "id", n_tiles=5).collect(),
        key=lambda r: r.tile,
    )
    assert [r.n for r in out] == [2, 2, 2, 2, 2]
    # tile 1 holds the LARGEST values
    assert out[0].max_value == 100.0 and out[0].min_value == 99.0
    assert out[-1].min_value == 91.0


# --- winsorize_stats / impute_group_median ---


def test_winsorize_caps_tails(spark):
    import datetime as dtm

    ts = dtm.datetime(2024, 1, 1, tzinfo=dtm.timezone.utc)
    vals = [float(i) for i in range(1, 11)]  # 1..10
    rows = [Row(event_type="a", value=v, ts=ts) for v in vals]
    r = profiling.winsorize_stats(
        spark.createDataFrame(rows), "event_type", "value", 0.1, 0.9
    ).collect()[0]
    # interpolated p10 of 1..10 = 1.9, p90 = 9.1
    assert r.lo_cut == 1.9 and r.hi_cut == 9.1
    assert r.n_clipped_lo == 1 and r.n_clipped_hi == 1
    assert r.mean_raw == 5.5
    # clipped: [1.9, 2..9, 9.1] -> mean 5.5 (symmetric)
    assert r.mean_winsorized == 5.5


def test_winsorize_no_clipping_within_range(spark):
    import datetime as dtm

    ts = dtm.datetime(2024, 1, 1, tzinfo=dtm.timezone.utc)
    rows = [Row(event_type="a", value=5.0, ts=ts)] * 4
    r = profiling.winsorize_stats(
        spark.createDataFrame(rows), "event_type", "value"
    ).collect()[0]
    assert r.n_clipped_lo == 0 and r.n_clipped_hi == 0
    assert r.mean_raw == r.mean_winsorized == 5.0


def test_impute_median_fills_only_nulls(spark):
    rows = [
        Row(g="a", v=1.0),
        Row(g="a", v=3.0),
        Row(g="a", v=None),
        Row(g="b", v=10.0),
    ]
    out = {
        r.name: r
        for r in profiling.impute_group_median(
            spark.createDataFrame(rows), "g", "v"
        ).collect()
    }
    a = out["a"]
    assert a.n == 3 and a.n_imputed == 1
    assert a.median_used == 2.0  # median of [1, 3]
    assert a.mean_after == 2.0  # (1 + 3 + 2) / 3
    assert out["b"].n_imputed == 0 and out["b"].mean_after == 10.0


# --- source_scorecard ---


def test_source_scorecard_dup_and_length(spark):
    from kairos_spark.operators import text as text_ops

    rows = [
        Row(doc_id=1, text="shared text body here", source="s1"),
        Row(doc_id=2, text="shared text body here", source="s2"),  # cross-source dup
        Row(doc_id=3, text="unique one", source="s1"),
    ]
    out = {
        r.source: r
        for r in text_ops.source_scorecard(spark.createDataFrame(rows)).collect()
    }
    assert out["s1"].n_docs == 2 and out["s2"].n_docs == 1
    # s1: one of two docs is a corpus-dup; s2: its only doc is a dup
    assert out["s1"].dup_frac == 0.5
    assert out["s2"].dup_frac == 1.0
    assert out["s1"].mean_chars == round((21 + 10) / 2, 6)
    assert 0.0 <= out["s1"].mean_quality <= 1.0


# --- gini_concentration ---


def test_gini_uniform_is_zero(spark):
    rows = [Row(g="u", k=i) for i in range(5)]  # each key exactly once
    r = profiling.gini_concentration(spark.createDataFrame(rows), "g", "k").collect()[0]
    assert r.gini == 0.0 and r.n_keys == 5 and r.n_rows == 5


def test_gini_concentrated_near_one(spark):
    rows = [Row(g="c", k=0)] * 96 + [Row(g="c", k=1), Row(g="c", k=2),
                                     Row(g="c", k=3), Row(g="c", k=4)]
    r = profiling.gini_concentration(spark.createDataFrame(rows), "g", "k").collect()[0]
    # one key holds 96% of rows across 5 keys -> gini close to (n-1)/n * share
    assert r.gini > 0.7


def test_gini_exact_small_case(spark):
    # counts [1, 3]: sorted asc ranks (1,2); G = 2*(1*1+2*3)/(2*4) - 3/2 = 0.25
    rows = [Row(g="x", k=1)] + [Row(g="x", k=2)] * 3
    r = profiling.gini_concentration(spark.createDataFrame(rows), "g", "k").collect()[0]
    assert r.gini == 0.25


# --- audience_overlap ---


def test_audience_overlap_jaccard_and_containment(spark):
    rows = [Row(g="a", k=i) for i in (1, 2, 3)]
    rows += [Row(g="b", k=i) for i in (2, 3, 4, 5)]
    rows += [Row(g="a", k=2)]  # duplicate event: distinct-ed away
    out = profiling.audience_overlap(spark.createDataFrame(rows), "g", "k").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.group_a, r.group_b) == ("a", "b")
    assert (r.n_a, r.n_b, r.n_shared) == (3, 4, 2)
    assert r.jaccard == 0.4          # 2 / (3 + 4 - 2)
    assert r.containment_a_in_b == round(2 / 3, 6)


def test_audience_overlap_disjoint_pair_absent(spark):
    rows = [Row(g="a", k=1), Row(g="b", k=2)]
    # no shared keys -> no output row for the pair (inner join semantics)
    assert profiling.audience_overlap(spark.createDataFrame(rows), "g", "k").collect() == []
