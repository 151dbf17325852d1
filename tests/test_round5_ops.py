"""Unit tests for the round-5 operator batch: winnowing fingerprints,
edit-distance-verified near-dups, HyperLogLog registers, BPE pair
statistics, Spearman rank correlation, and rank-sum AUC."""

import math

import pytest
from pyspark.sql import Row, functions as F

from kairos_spark.operators import dedup, profiling, sketches, text, windows


# ---------------------------------------------------------------- winnowing


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_winnow_guarantee_long_match_shares_fingerprint(spark):
    # winnowing guarantee: any verbatim match of length >= w + k - 1
    # (= 11 chars at k=8, w=4) shares at least one fingerprint
    common = "the quick brown fox jumps over the lazy dog again and again"
    df = _docs(
        spark,
        [(1, "AAA " + common + " xyz"), (2, "BBBBB " + common + " qqq third")],
    )
    fps = dedup.winnow_fingerprints(df, k=8, w=4)
    a = {r.fp for r in fps.where(F.col("doc_id") == 1).collect()}
    b = {r.fp for r in fps.where(F.col("doc_id") == 2).collect()}
    assert a & b


def test_winnow_density_roughly_two_over_w_plus_one(spark):
    # density of selected positions ~2/(w+1); as a set of distinct
    # hashes it can only be smaller — sanity-bound it
    txt = " ".join(f"tok{i}abc" for i in range(200))
    df = _docs(spark, [(1, txt)])
    n_grams = len(" ".join(f"tok{i}abc" for i in range(200))) - 7
    n_fp = dedup.winnow_fingerprints(df, k=8, w=4).count()
    assert 0.2 * n_grams < n_fp <= math.ceil(2 / (4 + 1) * n_grams) + 8


def test_winnow_short_doc_single_fingerprint(spark):
    # shorter than one full window: one truncated-window minimum
    df = _docs(spark, [(1, "abcdefgh")])
    assert dedup.winnow_fingerprints(df, k=8, w=4).count() == 1


def test_winnow_pairs_score_and_stopfp(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = _docs(spark, [(1, base), (2, base + " extra"), (3, "totally different words here")])
    pairs = dedup.winnow_near_pairs(df, k=8, w=4, max_occ=50, min_shared=1).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in got
    for r in pairs:
        if (r.id_a, r.id_b) == (1, 2):
            assert r.score > 0.5
    # with max_occ=0 every fingerprint is a stop-fingerprint: no pairs
    assert dedup.winnow_near_pairs(df, max_occ=0, min_shared=1).count() == 0


# ---------------------------------------------------------- edit distance


def test_editdist_pairs_certifies_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog " * 4
    df = _docs(spark, [(1, base + "ending one"), (2, base + "ending two"),
                       (3, "completely unrelated content " * 6)])
    out = dedup.editdist_near_pairs(
        df, max_dist=15, prefix_chars=160, bits=60, blocks=6, max_hamming=20
    ).collect()
    got = {(r.id_a, r.id_b): r.edit_dist for r in out}
    assert set(got) == {(1, 2)}
    # identical 160-char prefixes -> distance 0
    assert got[(1, 2)] == 0


def test_editdist_threshold_excludes(spark):
    df = _docs(spark, [(1, "aaaa bbbb cccc dddd"), (2, "aaaa bbbb cccc eeee")])
    strict = dedup.editdist_near_pairs(df, max_dist=1, max_hamming=59, blocks=6)
    loose = dedup.editdist_near_pairs(df, max_dist=10, max_hamming=59, blocks=6)
    assert strict.count() == 0 and loose.count() == 1


# ------------------------------------------------------------------- HLL


def test_hll_registers_shape_and_merge(spark):
    df = spark.createDataFrame([Row(g="a", v=i) for i in range(500)])
    regs = sketches.hll_registers(df, ["g"], "v", p=8)
    rows = regs.collect()
    assert all(0 <= r.reg < 256 and 1 <= r.rho <= 41 for r in rows)
    # registers are distinct per (group, reg)
    assert len({r.reg for r in rows}) == len(rows)


def test_hll_estimate_within_sketch_error(spark):
    n = 2000
    df = spark.createDataFrame([Row(g="a", v=i) for i in range(n)] * 3)
    est = sketches.hll_distinct(df, ["g"], "v", p=8).collect()[0]
    # 1.04/sqrt(256) ~ 6.5% standard error; allow 4 sigma
    assert abs(est.est_distinct - n) / n < 0.26
    # duplicates must not change the estimate (set semantics)
    est2 = sketches.hll_distinct(
        spark.createDataFrame([Row(g="a", v=i) for i in range(n)]), ["g"], "v", p=8
    ).collect()[0]
    assert est.est_distinct == est2.est_distinct


def test_hll_small_range_correction_exactish(spark):
    # tiny cardinality hits the linear-counting branch: m ln(m/V) is
    # very accurate for n << m
    df = spark.createDataFrame([Row(g="a", v=i) for i in range(10)])
    est = sketches.hll_distinct(df, ["g"], "v", p=8).collect()[0]
    assert abs(est.est_distinct - 10) < 2


def test_hll_p_must_be_nibble_aligned(spark):
    df = spark.createDataFrame([Row(g="a", v=1)])
    with pytest.raises(ValueError):
        sketches.hll_registers(df, ["g"], "v", p=10)


# ------------------------------------------------------------------- BPE


def test_bpe_pair_weights_use_corpus_frequency(spark):
    df = spark.createDataFrame(
        [Row(text="abab abab abab"), Row(text="abab zz")]
    )
    out = {r.pair: (r.n_positions, r.weight) for r in
           text.bpe_pair_stats(df, pattern="[a-z]+", k=10).collect()}
    # vocab: abab (n=4), zz (n=1); pairs of 'abab': ab,ba,ab
    assert out["ab"] == (2, 8)   # two positions in one vocab word × 4
    assert out["ba"] == (1, 4)
    assert out["zz"] == (1, 1)


def test_bpe_single_char_words_excluded(spark):
    df = spark.createDataFrame([Row(text="a b c ab")])
    pairs = {r.pair for r in text.bpe_pair_stats(df).collect()}
    assert pairs == {"ab"}


# -------------------------------------------------------------- Spearman


def test_spearman_perfect_monotone(spark):
    # key b counts are a monotone (nonlinear) function of key a counts
    # over shared buckets -> spearman exactly 1, pearson would be < 1
    rows = []
    for h, na in enumerate([1, 2, 3, 4, 5]):
        for i in range(na):
            rows.append(Row(ts=f"2024-01-01 0{h}:00:{i:02d}", event_type="a"))
        for i in range(na * na):  # nonlinear but monotone
            rows.append(Row(ts=f"2024-01-01 0{h}:00:{i:02d}", event_type="b"))
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    out = windows.spearman_correlation(df, step_sec=3600).collect()
    assert len(out) == 1
    assert out[0].spearman == 1.0


def test_spearman_reversed_is_minus_one(spark):
    rows = []
    for h, na in enumerate([1, 2, 3, 4]):
        for i in range(na):
            rows.append(Row(ts=f"2024-01-01 0{h}:00:{i:02d}", event_type="a"))
        for i in range(5 - na):
            rows.append(Row(ts=f"2024-01-01 0{h}:00:{i:02d}", event_type="b"))
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    out = windows.spearman_correlation(df, step_sec=3600).collect()
    assert out[0].spearman == -1.0


# ------------------------------------------------------------------- AUC


def test_auc_perfect_separation(spark):
    df = spark.createDataFrame(
        [Row(g="x", s=float(i), y=i >= 5) for i in range(10)]
    )
    out = profiling.rank_auc(df, "s", "y", ["g"]).collect()[0]
    assert out.auc == 1.0 and out.n_pos == 5 and out.n_neg == 5


def test_auc_random_is_half_with_ties(spark):
    # constant score: every comparison is a tie -> AUC exactly 0.5
    df = spark.createDataFrame([Row(g="x", s=1.0, y=(i % 2 == 0)) for i in range(10)])
    assert profiling.rank_auc(df, "s", "y", ["g"]).collect()[0].auc == 0.5


def test_auc_reversed_is_zero_and_single_class_dropped(spark):
    df = spark.createDataFrame(
        [Row(g="x", s=float(i), y=i < 5) for i in range(10)]
        + [Row(g="allpos", s=1.0, y=True)]
    )
    rows = profiling.rank_auc(df, "s", "y", ["g"]).collect()
    assert {r.g for r in rows} == {"x"}
    assert rows[0].auc == 0.0


def test_auc_matches_pairwise_definition(spark):
    import itertools

    data = [(0.3, True), (0.1, False), (0.4, True), (0.4, False), (0.2, False), (0.9, True)]
    df = spark.createDataFrame([Row(g="x", s=s, y=y) for s, y in data])
    got = profiling.rank_auc(df, "s", "y", ["g"]).collect()[0].auc
    pos = [s for s, y in data if y]
    neg = [s for s, y in data if not y]
    want = sum(
        1.0 if p > q else (0.5 if p == q else 0.0)
        for p, q in itertools.product(pos, neg)
    ) / (len(pos) * len(neg))
    assert got == round(want, 6)


# ------------------------------------------------------------- triangles


def _events(spark, rows):
    df = spark.createDataFrame(
        [Row(user_id=u, event_type=t, ts=ts) for u, t, ts in rows]
    )
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def test_triangle_complete_graph(spark):
    from kairos_spark.operators import graph

    # three users share two cells -> K3: each node 1 triangle, C=1
    rows = []
    for u in [1, 2, 3]:
        rows.append((u, "a", "2024-01-01 00:10:00"))
        rows.append((u, "a", "2024-01-01 01:10:00"))
    out = graph.cooccurrence_triangles(_events(spark, rows), min_shared=2).collect()
    assert len(out) == 3
    for r in out:
        assert (r.degree, r.triangles, r.clustering) == (2, 1, 1.0)


def test_triangle_path_graph_no_triangle(spark):
    from kairos_spark.operators import graph

    # 1-2 and 2-3 co-occur (twice each), 1-3 never: open wedge
    rows = []
    for cell_h, us in [(0, (1, 2)), (1, (1, 2)), (2, (2, 3)), (3, (2, 3))]:
        for u in us:
            rows.append((u, "a", f"2024-01-01 0{cell_h}:00:00"))
    out = {r.node: r for r in graph.cooccurrence_triangles(
        _events(spark, rows), min_shared=2).collect()}
    assert out[2].degree == 2 and out[2].triangles == 0 and out[2].clustering == 0.0
    assert out[1].degree == 1 and out[1].clustering == 0.0


def test_triangle_stop_cell_guard(spark):
    from kairos_spark.operators import graph

    # a single shared cell with 3 users, but the cell is over the cap:
    # no edges at all
    rows = [(u, "a", "2024-01-01 00:00:00") for u in [1, 2, 3]]
    assert graph.cooccurrence_triangles(
        _events(spark, rows), min_shared=1, max_bucket_nodes=2
    ).count() == 0


# -------------------------------------------------------- context budget


def test_context_budget_exact_counts(spark):
    from kairos_spark.operators import text as t

    df = spark.createDataFrame(
        [Row(text="a b c d"), Row(text="a b"), Row(text="a")]
    )  # token counts 4, 2, 1 (total 7)
    out = {r.cutoff: r for r in t.context_budget(df, [2, 4]).collect()}
    assert out[2].n_docs_over == 1 and out[2].tokens_lost == 2
    assert out[2].frac_docs_over == round(1 / 3, 6)
    assert out[2].frac_tokens_lost == round(2 / 7, 6)
    assert out[4].n_docs_over == 0 and out[4].tokens_lost == 0


# ------------------------------------------------------- bigram holdout


def test_bigram_holdout_scores_only_heldout_docs(spark):
    from kairos_spark.operators import text as t

    df = spark.createDataFrame(
        [Row(doc_id=i, text="the cat sat on the mat") for i in range(40)]
    )
    out = t.bigram_holdout_score(df, train_buckets=10, train_cut=8)
    rows = out.collect()
    assert 0 < len(rows) < 40
    # every held-out doc's bigrams were seen in train (identical docs):
    # zero OOV, and lm_score is finite negative
    for r in rows:
        assert r.oov_bigrams == 0 and r.n_bigrams == 5 and r.lm_score < 0


def test_bigram_holdout_oov_floor(spark):
    from kairos_spark.operators import text as t

    # force a doc into the held-out split whose bigrams never occur in
    # train: find an id with md5 bucket >= 8 and give it unique text
    df = spark.createDataFrame(
        [Row(doc_id=i, text="common shared words here") for i in range(40)]
    )
    probe = None
    import hashlib

    for i in range(40):
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:11], 16) % 10
        if b >= 8:
            probe = i
            break
    df = df.withColumn(
        "text",
        F.when(F.col("doc_id") == probe, F.lit("zzz qqq xxx www")).otherwise(
            F.col("text")
        ),
    )
    out = {r.doc_id: r for r in t.bigram_holdout_score(df).collect()}
    assert out[probe].oov_bigrams == out[probe].n_bigrams == 3


# ------------------------------------------------------------ Theil-Sen


def test_theilsen_robust_to_outlier_bucket(spark):
    # steady +1/hour trend with one huge spike: OLS is dragged, the
    # pairwise-slope median stays ~1/hour
    rows = []
    counts = [1, 2, 3, 4, 100, 6, 7, 8, 9]
    for h, n in enumerate(counts):
        for i in range(n):
            rows.append(Row(ts=f"2024-01-01 0{h}:{i // 60:02d}:{i % 60:02d}",
                            event_type="a"))
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    out = windows.theilsen_trend(df, step_sec=3600).collect()[0]
    assert out.n_buckets == 9 and out.n_pairs == 36
    assert abs(out.slope_per_hour - 1.0) < 0.3


def test_theilsen_exact_linear(spark):
    rows = []
    for h, n in enumerate([2, 4, 6, 8]):
        for i in range(n):
            rows.append(Row(ts=f"2024-01-01 0{h}:00:{i:02d}", event_type="a"))
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    out = windows.theilsen_trend(df, step_sec=3600).collect()[0]
    assert out.slope_per_hour == 2.0


# --------------------------------------------------------- session paths


def test_session_paths_counts_within_session_only(spark):
    rows = [
        # user 1, one session: a b c d -> paths "a>b>c", "b>c>d"
        Row(user_id=1, event_id=1, ts="2024-01-01 00:00:00", event_type="a"),
        Row(user_id=1, event_id=2, ts="2024-01-01 00:01:00", event_type="b"),
        Row(user_id=1, event_id=3, ts="2024-01-01 00:02:00", event_type="c"),
        Row(user_id=1, event_id=4, ts="2024-01-01 00:03:00", event_type="d"),
        # user 1, second session after 2h gap: x y (too short for depth 3)
        Row(user_id=1, event_id=5, ts="2024-01-01 02:30:00", event_type="x"),
        Row(user_id=1, event_id=6, ts="2024-01-01 02:31:00", event_type="y"),
    ]
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.path: r.n for r in windows.session_paths(df, depth=3, k=10).collect()}
    assert out == {"a > b > c": 1, "b > c > d": 1}


def test_session_paths_no_cross_session_path(spark):
    # 3 events but a session break between 2nd and 3rd: no path at all
    rows = [
        Row(user_id=1, event_id=1, ts="2024-01-01 00:00:00", event_type="a"),
        Row(user_id=1, event_id=2, ts="2024-01-01 00:01:00", event_type="b"),
        Row(user_id=1, event_id=3, ts="2024-01-01 03:00:00", event_type="c"),
    ]
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    assert windows.session_paths(df, depth=3).count() == 0


# -------------------------------------------------------------- Benford


def test_benford_digit_extraction_and_expectation(spark):
    import math as m

    df = spark.createDataFrame(
        [Row(v=float(x)) for x in [1.0, 19.5, 100.0, 950.0, 2.5, 0.4, -3.0]]
    )
    out = {r.digit: r for r in profiling.benford_audit(df, "v").collect()}
    # 0.4 and -3.0 excluded; digits: 1,1,1,9,2
    assert out[1].n == 3 and out[9].n == 1 and out[2].n == 1
    assert out[1].obs_freq == 0.6
    assert out[1].exp_freq == round(m.log10(2), 6)
    assert out[1].deviation == round(0.6 - m.log10(2), 6)


def test_benford_power_of_ten_boundary(spark):
    # exactly 10.0 / 1000.0 must land on digit 1 (the log10 route is
    # unreliable here; the decimal-string route is what we assert)
    df = spark.createDataFrame([Row(v=10.0), Row(v=1000.0), Row(v=999.99)])
    out = {r.digit: r.n for r in profiling.benford_audit(df, "v").collect()}
    assert out == {1: 2, 9: 1}


# ------------------------------------------------------------------ RFM


def test_rfm_tiles_partition_users(spark):
    rows = []
    for u in range(9):
        for i in range(u + 1):  # frequency 1..9
            rows.append(Row(user_id=u, ts=f"2024-01-0{u % 3 + 1} 00:00:{i:02d}",
                            value=float(u)))
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    out = profiling.rfm_segments(df, tiles=3).collect()
    assert sum(r.n_users for r in out) == 9
    for r in out:
        assert 1 <= r.r_tile <= 3 and 1 <= r.f_tile <= 3 and 1 <= r.m_tile <= 3


def test_rfm_best_segment_is_heavy_recent_user(spark):
    rows = []
    # user 0: recent, frequent, high value; user 1 and 2: old, light
    for i in range(10):
        rows.append(Row(user_id=0, ts=f"2024-01-09 00:00:{i:02d}", value=100.0))
    rows.append(Row(user_id=1, ts="2024-01-01 00:00:00", value=1.0))
    rows.append(Row(user_id=2, ts="2024-01-02 00:00:00", value=2.0))
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {(r.r_tile, r.f_tile, r.m_tile): r for r in
           profiling.rfm_segments(df, tiles=3).collect()}
    best = out[(1, 1, 1)]
    assert best.n_users == 1 and best.avg_monetary == 1000.0


# ------------------------------------------------------------------- KS


def test_ks_identical_halves_is_zero(spark):
    # same value multiset in both halves -> ECDFs identical -> KS 0
    rows = []
    for h in (0, 12):  # first/second half of the day
        for v in [1.0, 2.0, 3.0, 3.0]:
            rows.append(Row(event_type="a", value=v, ts=f"2024-01-01 {h:02d}:00:00"))
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    out = profiling.ks_drift(df).collect()[0]
    assert out.ks == 0.0 and out.n1 == 4 and out.n2 == 4


def test_ks_disjoint_supports_is_one(spark):
    rows = [Row(event_type="a", value=float(v), ts="2024-01-01 00:00:00") for v in (1, 2)]
    rows += [Row(event_type="a", value=float(v), ts="2024-01-01 23:00:00") for v in (10, 20)]
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    assert profiling.ks_drift(df).collect()[0].ks == 1.0


def test_ks_one_sided_group_omitted(spark):
    rows = [Row(event_type="only_early", value=1.0, ts="2024-01-01 00:00:00"),
            Row(event_type="both", value=1.0, ts="2024-01-01 00:00:00"),
            Row(event_type="both", value=2.0, ts="2024-01-01 23:00:00")]
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    assert {r.name for r in profiling.ks_drift(df).collect()} == {"both"}


# -------------------------------------------------------------- lateness


def test_lateness_in_order_stream_is_zero(spark):
    rows = [Row(event_id=i, event_type="a", ts=f"2024-01-01 00:00:{i:02d}")
            for i in range(5)]
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    out = windows.lateness_audit(df).collect()[0]
    assert out.n_late == 0 and out.max_late_sec == 0.0


def test_lateness_measures_event_time_regression(spark):
    # arrival order 1,2,3 but event 2's timestamp is 10s behind event 1
    rows = [Row(event_id=1, event_type="a", ts="2024-01-01 00:00:20"),
            Row(event_id=2, event_type="a", ts="2024-01-01 00:00:10"),
            Row(event_id=3, event_type="a", ts="2024-01-01 00:00:30")]
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    out = windows.lateness_audit(df).collect()[0]
    assert out.n_late == 1 and out.max_late_sec == 10.0


# --------------------------------------------------------- dup inflation


def test_dup_inflation_counts_tokens_once_per_digest(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, source="s", text="a b c"),       # 3 tokens
         Row(doc_id=2, source="s", text="a b c"),       # exact dup
         Row(doc_id=3, source="s", text="d d d d")]     # 4 tokens, unique
    )
    out = dedup.dup_inflation(df).collect()[0]
    assert (out.n_docs, out.n_unique) == (3, 2)
    assert (out.tokens_total, out.tokens_unique) == (10, 7)
    assert out.inflation == round(10 / 7, 6)


def test_dup_inflation_no_dups_is_one(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, source="s", text=f"unique text {i} body") for i in range(4)]
    )
    assert dedup.dup_inflation(df).collect()[0].inflation == 1.0


# ---------------------------------------------------------- norm outliers


def test_norm_outliers_flags_scaled_vector(spark):
    vecs = [Row(vec_id=i, label=0, embedding=[1.0, 0.0]) for i in range(20)]
    vecs.append(Row(vec_id=99, label=0, embedding=[10.0, 0.0]))
    df = spark.createDataFrame(vecs)
    out = profiling_norm = __import__(
        "kairos_spark.operators.similarity", fromlist=["similarity"]
    ).norm_outliers(df, z=2.0).collect()[0]
    assert out.n_vecs == 21 and out.n_outliers == 1
    assert abs(out.mean_norm - (20 * 1.0 + 10.0) / 21) < 1e-6


def test_norm_outliers_degenerate_distribution_no_outliers(spark):
    # all-identical norms: std 0, |x - mean| == 0 -> no outliers
    df = spark.createDataFrame(
        [Row(vec_id=i, label=1, embedding=[0.6, 0.8]) for i in range(10)]
    )
    from kairos_spark.operators import similarity

    out = similarity.norm_outliers(df).collect()[0]
    assert out.std_norm == 0.0 and out.n_outliers == 0


# -------------------------------------------------------- autocorrelation


def test_autocorr_alternating_series_is_minus_one(spark):
    # counts 1,3,1,3,... -> lag-1 pairs are perfectly anti-correlated
    rows = []
    for h in range(6):
        for i in range(1 if h % 2 == 0 else 3):
            rows.append(Row(event_type="a", ts=f"2024-01-01 0{h}:00:{i:02d}"))
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    out = windows.autocorrelation(df, step_sec=3600, lag=1).collect()[0]
    assert out.autocorr == -1.0 and out.n_pairs == 5


def test_autocorr_lag_skips_missing_buckets(spark):
    # buckets at hours 0,1,3: only the (0,1) pair aligns at lag 1
    rows = []
    for h, n in [(0, 1), (1, 2), (3, 5)]:
        for i in range(n):
            rows.append(Row(event_type="a", ts=f"2024-01-01 0{h}:00:{i:02d}"))
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    # single aligned pair -> zero variance -> dropped
    assert windows.autocorrelation(df, step_sec=3600, lag=1).count() == 0


# ---------------------------------------------------- transition entropy


def test_transition_entropy_deterministic_chain_zero_bits(spark):
    rows = []
    for u in range(4):
        for i, t in enumerate(["a", "b", "a", "b", "a"]):
            rows.append(Row(user_id=u, event_id=i, event_type=t,
                            ts=f"2024-01-01 00:0{i}:00"))
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.from_type: r for r in windows.transition_entropy(df).collect()}
    # after 'a' always 'b', after 'b' always 'a' -> 0 bits, top_next fixed
    assert out["a"].entropy_bits == 0.0 and out["a"].top_next == "b"
    assert out["b"].entropy_bits == 0.0 and out["b"].top_next == "a"


def test_transition_entropy_uniform_two_choices_one_bit(spark):
    rows = []
    eid = 0
    for u in range(8):
        nxt = "b" if u % 2 == 0 else "c"
        for i, t in enumerate(["a", nxt]):
            rows.append(Row(user_id=u, event_id=eid, event_type=t,
                            ts=f"2024-01-01 00:0{i}:00"))
            eid += 1
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.from_type: r for r in windows.transition_entropy(df).collect()}
    assert out["a"].entropy_bits == 1.0  # 50/50 between b and c
    assert out["a"].top_next == "b"      # tie broken lexicographically


def test_transition_entropy_session_gap_breaks_chain(spark):
    rows = [
        Row(user_id=1, event_id=1, event_type="a", ts="2024-01-01 00:00:00"),
        Row(user_id=1, event_id=2, event_type="b", ts="2024-01-01 05:00:00"),
    ]
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    assert windows.transition_entropy(df).count() == 0


# ------------------------------------------------------ join size estimate


def test_join_size_estimate_is_upper_bound_and_exact_matches(spark):
    left = spark.createDataFrame([Row(k=i % 5) for i in range(50)])
    right = spark.createDataFrame([Row(k=i % 7) for i in range(21)])
    out = sketches.join_size_estimate(left, right, "k", "k", d=4, w=1024).collect()[0]
    # exact: keys 0..4 have 10 each on the left; right keys 0..6 have 3
    assert out.exact_size == 5 * 10 * 3
    assert out.est_size >= out.exact_size            # CMS never undercounts
    assert out.overcount == out.est_size - out.exact_size


def test_join_size_estimate_disjoint_keys(spark):
    left = spark.createDataFrame([Row(k=i) for i in range(10)])
    right = spark.createDataFrame([Row(k=i + 1000) for i in range(10)])
    out = sketches.join_size_estimate(left, right, "k", "k").collect()[0]
    assert out.exact_size == 0 and out.est_size >= 0


# ---------------------------------------------------------------- skyline


def test_skyline_keeps_only_undominated(spark):
    rows = [
        Row(id=1, x=10, y=1.0),   # frontier (max x)
        Row(id=2, x=5, y=5.0),    # frontier
        Row(id=3, x=4, y=4.0),    # dominated by id=2
        Row(id=4, x=1, y=9.0),    # frontier
        Row(id=5, x=1, y=2.0),    # dominated by id=4 (same x, lower y)
    ]
    df = spark.createDataFrame(rows)
    got = {r.id for r in profiling.skyline_2d(df, "x", "y", "id").collect()}
    assert got == {1, 2, 4}


def test_skyline_double_ties_survive_together(spark):
    df = spark.createDataFrame([Row(id=1, x=5, y=5.0), Row(id=2, x=5, y=5.0)])
    got = {r.id for r in profiling.skyline_2d(df, "x", "y", "id").collect()}
    assert got == {1, 2}


def test_skyline_non_integer_x(spark):
    # the rows-frame formulation must be exact for fractional x too:
    # x=2.5 strictly exceeds x=2.4, so id=2 is dominated
    df = spark.createDataFrame([Row(id=1, x=2.5, y=3.0), Row(id=2, x=2.4, y=2.0)])
    got = {r.id for r in profiling.skyline_2d(df, "x", "y", "id").collect()}
    assert got == {1}


# --------------------------------------------------------- weighted median


def test_weighted_median_crossing_value(spark):
    # values 1,2,3 with weights 1,1,10: half of 12 is 6 -> median 3
    df = spark.createDataFrame(
        [Row(g="a", v=1, w=1), Row(g="a", v=2, w=1), Row(g="a", v=3, w=10)]
    )
    out = profiling.weighted_median(df, ["g"], "v", "w").collect()[0]
    assert out.wmedian == 3 and out.total_weight == 12


def test_weighted_median_equals_plain_median_with_unit_weights(spark):
    df = spark.createDataFrame([Row(g="a", v=v, w=1) for v in [1, 7, 3, 9, 5]])
    assert profiling.weighted_median(df, ["g"], "v", "w").collect()[0].wmedian == 5


def test_weighted_median_exact_half_boundary(spark):
    # cum weight hits exactly tot/2 at v=1 (2*2 >= 4) -> v=1 selected
    df = spark.createDataFrame([Row(g="a", v=1, w=2), Row(g="a", v=2, w=2)])
    assert profiling.weighted_median(df, ["g"], "v", "w").collect()[0].wmedian == 1


# ------------------------------------------------------------------ SCD2


def test_scd2_collapses_runs_and_closes_intervals(spark):
    rows = [
        Row(user_id=1, event_id=1, event_type="trial", ts="2024-01-01 00:00:00"),
        Row(user_id=1, event_id=2, event_type="trial", ts="2024-01-02 00:00:00"),
        Row(user_id=1, event_id=3, event_type="paid", ts="2024-01-03 00:00:00"),
        Row(user_id=1, event_id=4, event_type="trial", ts="2024-01-04 00:00:00"),
    ]
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    out = sorted(windows.scd2_intervals(df).collect(), key=lambda r: r.valid_from_us)
    HIGH = 253402300799999999
    assert [r.state for r in out] == ["trial", "paid", "trial"]
    assert [r.n_events for r in out] == [2, 1, 1]
    # each interval closes where the next opens; last is open (high date)
    assert out[0].valid_to_us == out[1].valid_from_us
    assert out[1].valid_to_us == out[2].valid_from_us
    assert out[2].valid_to_us == HIGH


def test_scd2_single_state_one_open_interval(spark):
    rows = [Row(user_id=7, event_id=i, event_type="x",
                ts=f"2024-01-01 00:0{i}:00") for i in range(3)]
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    out = windows.scd2_intervals(df).collect()
    assert len(out) == 1 and out[0].n_events == 3
    assert out[0].valid_to_us == 253402300799999999


# -------------------------------------------------------- langid confusion


def test_langid_confusion_diagonal_for_clear_text(spark):
    from kairos_spark.operators import text as t

    df = spark.createDataFrame([
        Row(doc_id=1, lang="en", text="the cat and the dog of the house"),
        Row(doc_id=2, lang="de", text="der hund und die katze ist nicht da"),
    ])
    pred = t.language_id(df)
    conf = (
        df.select("doc_id", F.col("lang").alias("true_lang"))
        .join(pred.select("doc_id", "lang_pred"), "doc_id")
        .groupBy("true_lang", "lang_pred")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    got = {(r.true_lang, r.lang_pred): r.n for r in conf}
    assert got == {("en", "en"): 1, ("de", "de"): 1}


def test_triangle_max_degree_hub_guard(spark):
    from kairos_spark.operators import graph

    # K4 among users 1-4 (all share two cells): unguarded -> 4 nodes,
    # each in C(3,2)=3 triangles; with max_degree=2 every node has
    # degree 3 > 2 -> all edges dropped, empty output
    rows = []
    for u in [1, 2, 3, 4]:
        rows.append((u, "a", "2024-01-01 00:10:00"))
        rows.append((u, "a", "2024-01-01 01:10:00"))
    ev = _events(spark, rows)
    full = graph.cooccurrence_triangles(ev, min_shared=2)
    assert {(r.degree, r.triangles) for r in full.collect()} == {(3, 3)}
    capped = graph.cooccurrence_triangles(ev, min_shared=2, max_degree=2)
    assert capped.count() == 0


# ------------------------------------------------------ distinctive terms


def test_distinctive_terms_surfaces_group_specific_vocab(spark):
    rows = (
        [Row(source="tech", text="kernel kernel kernel shared shared words")] * 3
        + [Row(source="food", text="recipe recipe recipe shared shared words")] * 3
    )
    df = spark.createDataFrame(rows)
    out = text.distinctive_terms(df, group_col="source", k=1, min_count=3).collect()
    got = {r.source: r.token for r in out}
    assert got == {"tech": "kernel", "food": "recipe"}
    for r in out:
        assert r.log_odds > 0


def test_distinctive_terms_min_count_filters_rare(spark):
    df = spark.createDataFrame(
        [Row(source="a", text="rare common common common"),
         Row(source="b", text="common common common other other other")]
    )
    toks = {(r.source, r.token) for r in
            text.distinctive_terms(df, group_col="source", k=5, min_count=3).collect()}
    assert ("a", "rare") not in toks


# ------------------------------------------------------ categorical drift


def test_categorical_drift_zero_when_mix_stable(spark):
    rows = []
    for h in (0, 20):
        for t, n in [("a", 4), ("b", 2)]:
            for i in range(n):
                rows.append(Row(event_type=t, ts=f"2024-01-01 {h:02d}:00:{i:02d}"))
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    out = profiling.categorical_drift(df).collect()
    assert all(r.contrib == 0.0 and r.chi2 == 0.0 for r in out)


def test_categorical_drift_detects_mix_shift(spark):
    rows = []
    for i in range(8):
        rows.append(Row(event_type="a", ts=f"2024-01-01 00:00:{i:02d}"))
    for i in range(8):
        rows.append(Row(event_type="b", ts=f"2024-01-01 23:00:{i:02d}"))
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.category: r for r in profiling.categorical_drift(df).collect()}
    # complete swap: chi2 = N = 16 for a 2x2 with full separation
    assert out["a"].chi2 == 16.0
    assert out["a"].c1 == 8 and out["a"].c2 == 0
