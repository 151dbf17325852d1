"""Round-5 third-wave operators: BM25 retrieval, reciprocal-rank
fusion, and SemDeDup-style semantic dedup."""

from pyspark.sql import Row, functions as F

from kairos_spark.operators import similarity, text

# --------------------------------------------------------------- bm25_topk


def _corpus(spark):
    rows = [
        Row(doc_id=0, text="rare common common filler filler"),
        Row(doc_id=1, text="common filler filler filler filler"),
        Row(doc_id=2, text="common filler filler filler filler filler filler filler"),
        Row(doc_id=3, text="filler filler filler filler"),
    ]
    return spark.createDataFrame(rows)


def test_bm25_rare_term_dominates(spark):
    out = text.bm25_topk(_corpus(spark), [(0, ["rare", "common"])], topk=4).collect()
    assert out[0].doc_id == 0 and out[0].rank == 1
    # doc 3 has no query term at all -> not a candidate
    assert all(r.doc_id != 3 for r in out)


def test_bm25_length_normalization(spark):
    # docs 1 and 2 have identical tf("common")=1; doc 1 is shorter, so
    # the b-weighted length norm must score it higher
    out = text.bm25_topk(_corpus(spark), [(0, ["common"])], topk=4).collect()
    by_id = {r.doc_id: r.score for r in out}
    assert by_id[1] > by_id[2]


def test_bm25_rank_contract(spark):
    out = text.bm25_topk(
        _corpus(spark), [(0, ["common"]), (1, ["rare"])], topk=10
    ).collect()
    for qid in (0, 1):
        rows = sorted([r for r in out if r.query_id == qid], key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        scores = [r.score for r in rows]
        assert scores == sorted(scores, reverse=True)


# -------------------------------------------------------------- rrf_fusion


def _vecs(spark):
    # 2-d points on a line: cosine and L2 orderings agree
    rows = [Row(vec_id=i, embedding=[float(i + 1), float(2 * i + 1)]) for i in range(12)]
    return spark.createDataFrame(rows)


def test_rrf_deterministic_and_ranked(spark):
    a = similarity.rrf_fusion(_vecs(spark), n_queries=2, top_n=5, topk=5).collect()
    b = similarity.rrf_fusion(_vecs(spark), n_queries=2, top_n=5, topk=5).collect()
    key = lambda r: (r.query_id, r.rank)
    assert sorted(a, key=key) == sorted(b, key=key)
    for qid in {r.query_id for r in a}:
        rows = sorted([r for r in a if r.query_id == qid], key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        scores = [r.rrf_score for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_rrf_both_lists_beat_one(spark):
    # an item present on both rankers' lists at rank r scores strictly
    # more than 1/(60+1) can ever contribute from a single list when
    # its two ranks are both <= top_n
    out = similarity.rrf_fusion(_vecs(spark), n_queries=1, top_n=12, topk=11).collect()
    top = [r for r in out if r.rank == 1][0]
    assert top.rank_cos > 0 and top.rank_l2 > 0  # 0 = absent sentinel
    assert top.rrf_score > 1.0 / 61.0


# ---------------------------------------------------------------- semdedup


def _clustered(spark):
    # two tight, well-separated clusters; ids 0/1 and 10/11 are exact
    # duplicates within their clusters
    rows = (
        [Row(vec_id=0, embedding=[10.0, 0.0]), Row(vec_id=1, embedding=[10.0, 0.0])]
        + [Row(vec_id=i, embedding=[10.0 + i * 0.01, float(i) * 0.01]) for i in range(2, 6)]
        + [Row(vec_id=10, embedding=[0.0, 10.0]), Row(vec_id=11, embedding=[0.0, 10.0])]
        + [Row(vec_id=i, embedding=[float(i - 10) * 0.01, 10.0 + i * 0.01]) for i in range(12, 16)]
    )
    return spark.createDataFrame(rows)


def test_semdedup_drops_exact_dups(spark):
    out = similarity.semdedup(_clustered(spark), k=2, iters=2, threshold=0.999999).collect()
    assert sum(r.n_vecs for r in out) == 12
    # at cosine ~1 threshold only exact-duplicate mates drop: one per pair
    assert sum(r.n_dropped for r in out) >= 2
    for r in out:
        assert r.n_kept + r.n_dropped == r.n_vecs


def test_semdedup_threshold_monotone(spark):
    df = _clustered(spark)
    hi = similarity.semdedup(df, k=2, iters=2, threshold=0.999999).collect()
    lo = similarity.semdedup(df, k=2, iters=2, threshold=0.5).collect()
    assert sum(r.n_dropped for r in lo) >= sum(r.n_dropped for r in hi)
    # above any attainable cosine nothing drops
    none = similarity.semdedup(df, k=2, iters=2, threshold=1.5).collect()
    assert sum(r.n_dropped for r in none) == 0


# -------------------------------------------------------- interval_allocate

from kairos_spark.operators import profiling, windows


def test_interval_allocate_splits_proportionally(spark):
    # interval t=1800..7200 (5400s): 1800s in hour 0 (1/3 of the
    # value), 3600s in hour 1 (2/3), zero-width touch of hour 2
    df = spark.createDataFrame([(1800.0, 7200.0, 9.0)], "s double, e double, v double")
    out = {r.bucket_start: r.allocated for r in
           windows.interval_allocate(df, "s", "e", "v").collect()}
    assert out[0] == 3.0
    assert out[3600] == 6.0
    assert out.get(7200, 0.0) == 0.0  # boundary bucket gets nothing
    assert abs(sum(out.values()) - 9.0) < 1e-9


def test_interval_allocate_point_interval(spark):
    df = spark.createDataFrame([(5000.0, 5000.0, 7.0)], "s double, e double, v double")
    out = windows.interval_allocate(df, "s", "e", "v").collect()
    assert len(out) == 1 and out[0].bucket_start == 3600 and out[0].allocated == 7.0


def test_interval_allocate_conserves_total(spark):
    rows = [(float(i * 997), float(i * 997 + i * 131), float(i)) for i in range(1, 30)]
    df = spark.createDataFrame(rows, "s double, e double, v double")
    out = windows.interval_allocate(df, "s", "e", "v").collect()
    assert abs(sum(r.allocated for r in out) - sum(v for _, _, v in rows)) < 1e-4


# ------------------------------------------------------- conformal_coverage


def test_conformal_coverage_on_constant_noise(spark):
    # value = group mean + bounded noise: the conformal interval at
    # alpha=0.1 must cover >= ~90% of test points
    rows = [(i, "a", 10.0 + ((i * 7) % 5 - 2) * 0.1) for i in range(2000)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = profiling.conformal_coverage(df, "event_id", "event_type", "value").collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_cal > 0 and r.n_test > 0
    assert abs(r.pred - 10.0) < 0.1
    assert r.coverage >= 0.85
    assert 0.0 <= r.qhat <= 0.21


def test_conformal_qhat_grows_with_noise(spark):
    lo = [(i, "g", 5.0 + (i % 3) * 0.01) for i in range(1000)]
    hi = [(i, "g", 5.0 + (i % 3) * 1.0) for i in range(1000)]
    mk = lambda rows: spark.createDataFrame(rows, "event_id long, event_type string, value double")
    q_lo = profiling.conformal_coverage(mk(lo), "event_id", "event_type", "value").collect()[0].qhat
    q_hi = profiling.conformal_coverage(mk(hi), "event_id", "event_type", "value").collect()[0].qhat
    assert q_hi > q_lo


# --------------------------------------------------- quantile_normalize_stats


def test_quantile_normalize_aligns_groups(spark):
    # two groups with the same shape but shifted location: after
    # quantile normalization the mapped means must (nearly) coincide
    rows = [("a", float(i)) for i in range(100)] + [("b", float(i + 500)) for i in range(100)]
    df = spark.createDataFrame(rows, "lang string, n_chars double")
    out = {r.group: r for r in
           profiling.quantile_normalize_stats(df, "lang", "n_chars").collect()}
    raw_gap = abs(out["a"].mean_raw - out["b"].mean_raw)
    mapped_gap = abs(out["a"].mean_mapped - out["b"].mean_mapped)
    assert raw_gap == 500.0
    assert mapped_gap < raw_gap / 10
    assert out["a"].var_mapped >= 0 and out["b"].var_mapped >= 0


# ------------------------------------------------------------- kcore_peel

from kairos_spark.operators import graph, multimodal, sampling


def test_kcore_path_graph_dissolves(spark):
    # path a-b-c-d: endpoints have degree 1 -> peel; the surviving
    # b-c edge leaves both with degree 1 -> second peel empties it
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "a long, b long")
    out = {r.round: r for r in graph.kcore_peel(edges, k=2, rounds=3).collect()}
    assert (out[1].n_nodes, out[1].n_edges) == (2, 1)
    assert (out[2].n_nodes, out[2].n_edges) == (0, 0)
    assert (out[3].n_nodes, out[3].n_edges) == (0, 0)


def test_kcore_triangle_survives(spark):
    # triangle 1-2-3 plus pendant 4: the pendant peels off, the
    # triangle is the stable 2-core
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "a long, b long"
    )
    out = {r.round: r for r in graph.kcore_peel(edges, k=2, rounds=3).collect()}
    for rnd in (1, 2, 3):
        assert (out[rnd].n_nodes, out[rnd].n_edges) == (3, 3)


# ------------------------------------------------------ signature_buckets


def test_signature_buckets_group_identical_payloads(spark):
    rows = [
        (0, "aaaa aaaa aaaa"),
        (1, "aaaa aaaa aaaa"),
        (2, "ZZZZ!!!! 0099 ~~~~"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    media = multimodal.attach_media(docs)
    out = multimodal.signature_buckets(media).collect()
    assert sum(r.n_media for r in out) == 3
    by_n = sorted(r.n_media for r in out)
    assert by_n == [1, 2]  # the identical pair shares a bucket
    dup = [r for r in out if r.n_media == 2][0]
    assert dup.min_media_id == 0


# ----------------------------------------------------- weight_diagnostics


def test_weight_diagnostics_uniform_weights(spark):
    df = spark.createDataFrame([("a", 5.0)] * 10, "lang string, w double")
    r = sampling.weight_diagnostics(df, "lang", "w").collect()[0]
    assert r.n == 10
    assert r.ess == 10.0 and r.ess_ratio == 1.0
    assert r.max_share == 0.1 and r.weight_cv == 0.0


def test_weight_diagnostics_dominant_weight(spark):
    rows = [("a", 1.0)] * 9 + [("a", 1000.0)]
    r = sampling.weight_diagnostics(
        spark.createDataFrame(rows, "lang string, w double"), "lang", "w"
    ).collect()[0]
    assert r.ess_ratio < 0.2
    assert r.max_share > 0.95
    assert r.weight_cv > 1.0


# --------------------------------------------------------------- cvm_drift

import datetime as _dt


def _halves(spark, first, second):
    base = _dt.datetime(2024, 1, 1)
    rows = [(i, "t", float(v), base + _dt.timedelta(hours=i))
            for i, v in enumerate(first)]
    rows += [(1000 + i, "t", float(v), base + _dt.timedelta(days=300, hours=i))
             for i, v in enumerate(second)]
    return spark.createDataFrame(
        rows, "event_id long, event_type string, value double, ts timestamp"
    )


def test_cvm_zero_for_identical_halves(spark):
    df = _halves(spark, [1, 2, 3, 4] * 5, [1, 2, 3, 4] * 5)
    r = profiling.cvm_drift(df).collect()[0]
    assert r.cvm == 0.0 and r.n1 == 20 and r.n2 == 20


def test_cvm_detects_broad_shift(spark):
    shifted = profiling.cvm_drift(
        _halves(spark, list(range(20)), [v + 5 for v in range(20)])
    ).collect()[0]
    same = profiling.cvm_drift(
        _halves(spark, list(range(20)), list(range(20)))
    ).collect()[0]
    assert shifted.cvm > same.cvm
    assert shifted.cvm > 0.5  # strong shift trips the statistic


# --------------------------------------------------------- group_fingerprint


def test_fingerprint_order_and_partition_independent(spark):
    rows = [("a", i, f"x{i}") for i in range(50)]
    df1 = spark.createDataFrame(rows, "g string, id long, s string")
    df2 = spark.createDataFrame(list(reversed(rows)), "g string, id long, s string") \
        .repartition(7)
    f1 = profiling.group_fingerprint(df1, "g", ["id", "s"]).collect()[0]
    f2 = profiling.group_fingerprint(df2, "g", ["id", "s"]).collect()[0]
    assert f1.fingerprint == f2.fingerprint and f1.n_rows == f2.n_rows == 50


def test_fingerprint_detects_single_row_change(spark):
    rows = [("a", i, f"x{i}") for i in range(50)]
    mutated = rows[:49] + [("a", 49, "CHANGED")]
    f1 = profiling.group_fingerprint(
        spark.createDataFrame(rows, "g string, id long, s string"), "g", ["id", "s"]
    ).collect()[0]
    f2 = profiling.group_fingerprint(
        spark.createDataFrame(mutated, "g string, id long, s string"), "g", ["id", "s"]
    ).collect()[0]
    assert f1.fingerprint != f2.fingerprint


# --------------------------------------------------------------- ipf_raking


def test_ipf_balances_marginals(spark):
    # skewed 2x2 table: after 2 iterations the weighted row and column
    # marginals should be close to uniform (total/2 each)
    rows = (
        [("en", "s0")] * 70 + [("en", "s1")] * 10
        + [("fr", "s0")] * 10 + [("fr", "s1")] * 10
    )
    df = spark.createDataFrame(rows, "lang string, source string")
    out = profiling.ipf_raking(df, "lang", "source", iters=2).collect()
    cells = {(r.row, r.col): r.n * r.weight for r in out}
    total = sum(cells.values())
    row_m = {g: sum(v for (r, _), v in cells.items() if r == g) for g in ("en", "fr")}
    col_m = {g: sum(v for (_, c), v in cells.items() if c == g) for g in ("s0", "s1")}
    for m in row_m.values():
        assert abs(m - total / 2) / total < 0.02
    for m in col_m.values():
        assert abs(m - total / 2) / total < 0.05  # col pass ran last... row pass first
    # weights stay positive and finite
    assert all(r.weight > 0 for r in out)


# ---------------------------------------------------------------- srm_audit


def test_srm_clean_split_does_not_flag(spark):
    rows = [(i, "t") for i in range(4000)]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    r = profiling.srm_audit(df, "user_id", "event_type").collect()[0]
    assert r.n_a + r.n_b == 4000
    assert r.srm_flag == 0  # md5 half-split on sequential ids is fair


def test_srm_biased_split_flags(spark):
    # fabricate bias: only keep ids whose md5 first digit is 0-7 (all A)
    # plus a few B units -> massive mismatch must flag
    import hashlib
    a_ids = [i for i in range(4000)
             if hashlib.md5(str(i).encode()).hexdigest()[0] in "01234567"][:500]
    b_ids = [i for i in range(4000)
             if hashlib.md5(str(i).encode()).hexdigest()[0] not in "01234567"][:20]
    df = spark.createDataFrame([(i, "t") for i in a_ids + b_ids],
                               "user_id long, event_type string")
    r = profiling.srm_audit(df, "user_id", "event_type").collect()[0]
    assert (r.n_a, r.n_b) == (500, 20)
    assert r.srm_flag == 1


# ---------------------------------------------------------------- bh_adjust


def test_bh_adjust_monotone_and_capped(spark):
    rows = [("a", 0.001), ("b", 0.01), ("c", 0.02), ("d", 0.5), ("e", 0.9)]
    out = {r.key: r for r in profiling.bh_adjust(
        spark.createDataFrame(rows, "key string, p double"), "p", "key"
    ).collect()}
    # adjusted p never below raw, never above 1, non-decreasing in rank
    by_rank = sorted(out.values(), key=lambda r: r.rank)
    for r in by_rank:
        assert r.p_adj >= r.p - 1e-9 and r.p_adj <= 1.0
    for x, y in zip(by_rank, by_rank[1:]):
        assert y.p_adj >= x.p_adj - 1e-9
    # textbook: p_adj(a) = 5 * 0.001 / 1 = 0.005 -> reject
    assert out["a"].p_adj == 0.005 and out["a"].reject == 1
    assert out["e"].reject == 0


# ----------------------------------------------------------- freshness_audit


def test_freshness_lag_and_window(spark):
    base = _dt.datetime(2024, 1, 1)
    rows = [("live", base + _dt.timedelta(hours=h)) for h in range(48)]
    rows += [("stale", base + _dt.timedelta(hours=h)) for h in range(10)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {r.group: r for r in
           profiling.freshness_audit(df, "event_type", "ts").collect()}
    assert out["live"].staleness_sec == 0.0
    # stale feed stopped at hour 9; live ran to hour 47 -> 38h behind
    assert out["stale"].staleness_sec == 38 * 3600.0
    # trailing 24h before the global anchor: live has hours 24..47
    assert out["live"].n_window == 24
    assert out["stale"].n_window == 0


# ------------------------------------------------------------- policy_replay


def test_policy_replay_match_rate_and_mean(spark):
    # uniform logging over 2 arms: match rate ~1/2; arm rewards are
    # constant so the replay mean per arm equals that constant
    rows = [(i, "x" if i % 2 == 0 else "y", 1.0 if i % 2 == 0 else 3.0)
            for i in range(2000)]
    df = spark.createDataFrame(rows, "user_id long, event_type string, value double")
    out = {r.arm: r for r in
           profiling.policy_replay(df, "user_id", "event_type", "value").collect()}
    assert out["x"].replay_mean == 1.0 and out["y"].replay_mean == 3.0
    for r in out.values():
        assert 0.3 < r.n_matched / r.n_logged < 0.7  # ~1/2 with 2 arms
        assert r.n_matched > 0


def test_policy_replay_deterministic(spark):
    rows = [(i, "abc"[i % 3], float(i % 7)) for i in range(300)]
    df = spark.createDataFrame(rows, "user_id long, event_type string, value double")
    a = sorted(profiling.policy_replay(df, "user_id", "event_type", "value").collect())
    b = sorted(profiling.policy_replay(df, "user_id", "event_type", "value").collect())
    assert a == b


# --------------------------------------------------------- growth_accounting


def test_growth_accounting_ledger(spark):
    # periods are 10s; u1 active p0,p1,p2; u2 active p0 then gone;
    # u3 active p0, skips p1, returns p2 (resurrected)
    rows = [(1, 5.0), (1, 15.0), (1, 25.0),
            (2, 5.0),
            (3, 5.0), (3, 25.0)]
    df = spark.createDataFrame(rows, "user_id long, ts double")
    out = {r.period_start: r for r in
           windows.growth_accounting(df, "user_id", "ts", period_sec=10).collect()}
    p0, p1, p2 = out[0], out[10], out[20]
    assert (p0.n_active, p0.n_new) == (3, 3) and p0.n_churned == 0
    assert (p1.n_active, p1.n_retained) == (1, 1)
    assert p1.n_churned == 2  # u2 and u3 left after p0
    assert p2.n_resurrected == 1  # u3 came back
    assert p2.n_churned == 0  # u1 stayed
    # ledger identity: active = new + retained + resurrected
    for r in out.values():
        assert r.n_active == r.n_new + r.n_retained + r.n_resurrected


# ------------------------------------------------------------ vocab_coverage


def test_vocab_coverage_monotone_and_exact(spark):
    # 'a' x6, 'b' x3, 'c' x1 -> top-1 covers 0.6, top-2 covers 0.9
    docs = spark.createDataFrame(
        [(0, "a a a a a a b b"), (1, "b c")], "doc_id long, text string"
    )
    out = {r.k: r for r in text.vocab_coverage(docs, ks=[1, 2, 100]).collect()}
    assert out[1].coverage == 0.6
    assert out[2].coverage == 0.9
    assert out[100].coverage == 1.0  # clamped to vocab size
    assert out[100].vocab_size == 3


# ------------------------------------------------------------------ ab_lift


def test_ab_lift_aa_near_zero(spark):
    # A/A: same distribution both variants -> small |t|
    rows = [(i, "t", float(i % 10)) for i in range(4000)]
    df = spark.createDataFrame(rows, "user_id long, event_type string, value double")
    r = profiling.ab_lift(df, "user_id", "event_type", "value").collect()[0]
    assert abs(r.t_welch) < 2.5
    assert abs(r.lift) < 0.5


def test_ab_lift_detects_true_effect(spark):
    # inject a real treatment effect aligned with the hash split
    import hashlib
    rows = []
    for i in range(3000):
        is_a = hashlib.md5(str(i).encode()).hexdigest()[0] in "01234567"
        rows.append((i, "t", 10.0 + (5.0 if is_a else 0.0) + (i % 3)))
    df = spark.createDataFrame(rows, "user_id long, event_type string, value double")
    r = profiling.ab_lift(df, "user_id", "event_type", "value").collect()[0]
    assert abs(r.lift - 5.0) < 0.2
    assert r.t_welch > 10


# ------------------------------------------------------------- simpson_check


def test_simpson_detects_sign_flip(spark):
    # classic construction: within each group y DECREASES with x, but
    # the groups are offset so the pooled slope is positive
    rows = []
    for i in range(50):
        rows.append(("g1", float(i % 5), 10.0 - (i % 5)))          # x 0-4, y ~10
        rows.append(("g2", 10.0 + (i % 5), 30.0 - (i % 5)))        # x 10-14, y ~30
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r.group: r for r in profiling.simpson_check(df, "g", "x", "y").collect()}
    assert out["g1"].slope < 0 and out["g2"].slope < 0
    assert out["g1"].pooled_slope > 0
    assert out["g1"].flip == 1 and out["g2"].flip == 1


def test_simpson_no_flip_when_consistent(spark):
    rows = [("g%d" % (i % 2), float(i), 2.0 * i + (i % 3)) for i in range(100)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    assert all(r.flip == 0 for r in profiling.simpson_check(df, "g", "x", "y").collect())


# ------------------------------------------------------ post_stratified_mean


def test_post_stratification_corrects_skewed_mix(spark):
    # stratum a (value 1) oversampled 9:1 vs stratum b (value 3):
    # raw mean ~1.2, post-stratified mean = (1+3)/2 = 2
    rows = [("a", 1.0)] * 900 + [("b", 3.0)] * 100
    df = spark.createDataFrame(rows, "event_type string, value double")
    r = profiling.post_stratified_mean(df, "event_type", "value").collect()[0]
    assert r.raw_mean == 1.2
    assert r.post_mean == 2.0
    assert r.max_stratum_share == 0.9
    assert r.n == 1000 and r.n_strata == 2


# --------------------------------------------------------- capture_recapture


def test_capture_recapture_estimates_population(spark):
    # 100 users; first quarter sees users 0-59, last quarter 40-99:
    # n1=60, n2=60, m=20 -> Chapman (61*61/21)-1 = 176.2 (upward-biased
    # here because capture isn't independent, but the arithmetic is
    # what's under test)
    rows = [(u, float(u)) for u in range(60)]                 # t 0..59 (q1 cutoff 24.75)
    rows += [(u, float(40 + (u - 40) + 40)) for u in range(40, 100)]
    df = spark.createDataFrame(rows, "user_id long, t double").selectExpr(
        "user_id", "timestamp_seconds(t) AS ts"
    )
    r = profiling.capture_recapture(df, "user_id", "ts").collect()[0]
    assert r.n_observed == 100
    assert r.n1 > 0 and r.n2 > 0 and r.m >= 0
    assert r.chapman_est > 0
    assert abs(r.coverage - r.n_observed / r.chapman_est) < 1e-6


def test_capture_recapture_full_overlap(spark):
    # every user active in both windows -> m = n1 = n2 = N, coverage ~1
    rows = [(u, t) for u in range(50) for t in (0.0, 1000.0)]
    df = spark.createDataFrame(rows, "user_id long, t double").selectExpr(
        "user_id", "timestamp_seconds(t) AS ts"
    )
    r = profiling.capture_recapture(df, "user_id", "ts").collect()[0]
    assert r.n1 == r.n2 == r.m == 50
    assert abs(r.chapman_est - (51 * 51 / 51 - 1)) < 1e-6  # = 50
    assert abs(r.coverage - 1.0) < 1e-6


# ------------------------------------------------------------ powerlaw_alpha


def test_powerlaw_alpha_recovers_exponent(spark):
    # counts drawn from an exact Zipf tail x = round(C * r^(-1/(a-1)))
    # with a=2: alpha-hat should land near 2
    import math
    rows = [(i, max(5, int(10000 / (i + 1)))) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, n long")
    r = profiling.powerlaw_alpha(df, "n", xmin=5).collect()[0]
    assert r.n_tail == 500
    # continuous-Hill on a truncated discrete Zipf tail lands a bit
    # under the ideal alpha=2; the point is the right neighbourhood
    assert 1.2 < r.alpha < 2.5
    assert r.tail_mass_share == 1.0  # all rows in tail


def test_powerlaw_alpha_flat_counts_give_large_alpha(spark):
    # near-constant counts just above xmin -> tiny log terms -> huge alpha
    flat = spark.createDataFrame([(i, 6) for i in range(100)], "id long, n long")
    zipf = spark.createDataFrame(
        [(i, max(5, int(10000 / (i + 1)))) for i in range(100)], "id long, n long"
    )
    a_flat = profiling.powerlaw_alpha(flat, "n").collect()[0].alpha
    a_zipf = profiling.powerlaw_alpha(zipf, "n").collect()[0].alpha
    assert a_flat > a_zipf


# --------------------------------------------------------------- scale_drift


def test_scale_drift_detects_spread_change(spark):
    # same mean both halves, 3x the spread in the second half
    rows = [(i, "t", 10.0 + (i % 5 - 2) * 0.5, float(i)) for i in range(500)]
    rows += [(1000 + i, "t", 10.0 + (i % 5 - 2) * 1.5, float(100000 + i)) for i in range(500)]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, value double, t double"
    ).selectExpr("event_id", "event_type", "value", "timestamp_seconds(t) AS ts")
    r = profiling.scale_drift(df).collect()[0]
    assert r.var_ratio < 0.5  # first half much tighter
    assert r.log_ratio < -0.5


def test_scale_drift_stable_near_one(spark):
    rows = [(i, "t", float(i % 7), float(i)) for i in range(1000)]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, value double, t double"
    ).selectExpr("event_id", "event_type", "value", "timestamp_seconds(t) AS ts")
    r = profiling.scale_drift(df).collect()[0]
    assert 0.8 < r.var_ratio < 1.25


# --------------------------------------------------------------- rbo_rankings


def test_rbo_identical_rankings_give_one(spark):
    # every token appears once per doc -> tf == df -> identical lists
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(i + 1))) for i in range(10)],
        "doc_id long, text string",
    )
    r = text.rbo_rankings(docs, k=5, p=0.5).collect()[0]
    assert r.rbo == 1.0 - 0.5 ** 5  # truncated-RBO max at k=5, p=0.5
    assert r.overlap_at_k == 5


def test_rbo_tf_df_divergence_lowers_score(spark):
    # 'bursty' dominates tf via repetition in one doc but has df=1;
    # compare against a corpus where rankings agree
    agree = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(i + 1))) for i in range(10)],
        "doc_id long, text string",
    )
    diverge = spark.createDataFrame(
        [(0, "bursty " * 200), (1, "w0 w1 w2 w3 w4"), (2, "w0 w1 w2 w3"),
         (3, "w0 w1 w2"), (4, "w0 w1"), (5, "w0")],
        "doc_id long, text string",
    )
    r_a = text.rbo_rankings(agree, k=5, p=0.5).collect()[0].rbo
    r_d = text.rbo_rankings(diverge, k=5, p=0.5).collect()[0].rbo
    assert r_d < r_a


# ----------------------------------------------------------------- churn_auc


def test_churn_recency_baseline_beats_coin(spark):
    # users 0-49 active early only (churn); users 50-99 active early
    # AND late (return); returners' last early event is later ->
    # recency perfectly separates -> AUC == 1
    rows = [(u, float(u % 10)) for u in range(50)]            # churners: t 0..9
    rows += [(u, float(100 + u % 10)) for u in range(50, 100)]  # returners: later
    rows += [(u, 100000.0) for u in range(50, 100)]           # their return visit
    df = spark.createDataFrame(rows, "user_id long, t double").selectExpr(
        "user_id", "timestamp_seconds(t) AS ts"
    )
    r = windows.churn_baseline_auc(df, "user_id", "ts").collect()[0]
    assert (r.n_pos, r.n_neg) == (50, 50)
    assert r.auc == 1.0


# ---------------------------------------------------------- session_gap_sweep


def test_session_gap_sweep_monotone(spark):
    # gaps of 10 and 100 seconds: threshold below 10 -> 3 sessions,
    # between -> 2, above 100 -> 1
    rows = [(1, 0.0), (1, 10.0), (1, 110.0)]
    df = spark.createDataFrame(rows, "user_id long, t double").selectExpr(
        "user_id", "timestamp_seconds(t) AS ts"
    )
    out = {r.gap_sec: r.n_sessions for r in
           windows.session_gap_sweep(df, "user_id", "ts", gaps_sec=[5, 50, 500]).collect()}
    assert out == {5: 3, 50: 2, 500: 1}


def test_session_gap_sweep_matches_sessionize(spark):
    # the sweep's session count at gap g must equal sessionize's
    rows = [(u, float(u * 1000 + i * 40)) for u in range(5) for i in range(20)]
    df = spark.createDataFrame(rows, "user_id long, t double").selectExpr(
        "user_id", "timestamp_seconds(t) AS ts"
    )
    sweep = {r.gap_sec: r.n_sessions for r in
             windows.session_gap_sweep(df, "user_id", "ts", gaps_sec=[30, 60]).collect()}
    for g in (30, 60):
        s = windows.sessionize(df, "user_id", "ts", float(g))
        n = s.groupBy("user_id").agg(F.max("session_id").alias("m")) \
             .agg(F.sum("m")).collect()[0][0]
        assert sweep[g] == n


# --------------------------------------------------------------- cohens_kappa

from kairos_spark.operators import dedup


def test_kappa_perfect_and_chance(spark):
    perfect = spark.createDataFrame(
        [("x", "x")] * 30 + [("y", "y")] * 30, "a string, b string"
    )
    r = profiling.cohens_kappa(perfect, "a", "b").collect()[0]
    assert r.kappa == 1.0 and r.po == 1.0
    # b constant while a is split: po equals pe -> kappa 0
    chance = spark.createDataFrame(
        [("x", "x")] * 30 + [("y", "x")] * 30, "a string, b string"
    )
    r2 = profiling.cohens_kappa(chance, "a", "b").collect()[0]
    assert r2.kappa == 0.0
    assert r2.po == 0.5 and r2.pe == 0.5


def test_kappa_penalizes_majority_class_predictor(spark):
    # 90/10 class skew, predictor always says majority: accuracy 0.9
    # but kappa must be 0
    rows = [("maj", "maj")] * 90 + [("min", "maj")] * 10
    r = profiling.cohens_kappa(
        spark.createDataFrame(rows, "a string, b string"), "a", "b"
    ).collect()[0]
    assert r.po == 0.9 and r.kappa == 0.0


# ---------------------------------------------------------------- event_study


def test_event_study_alignment(spark):
    # user 1 purchases at day 2 (t=2d); events on days 0..4 -> offsets
    # -2..2; user 2 never purchases -> excluded
    day = 86400.0
    rows = [(1, "view", 1.0, d * day) for d in range(5)]
    rows += [(1, "purchase", 10.0, 2 * day)]
    rows += [(2, "view", 99.0, 0.0)]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, value double, t double"
    ).selectExpr("user_id", "event_type", "value", "timestamp_seconds(t) AS ts")
    out = {r.offset_day: r for r in
           windows.event_study(df, window_days=5).collect()}
    assert set(out) == {-2, -1, 0, 1, 2}
    assert out[0].n_events == 2  # the day-2 view + the purchase itself
    assert out[0].mean_value == 5.5
    assert all(r.n_users == 1 for r in out.values())


# ------------------------------------------------------ jaccard_threshold_sweep


def test_threshold_sweep_monotone_and_exact(spark):
    pairs = spark.createDataFrame(
        [(1, 2, 0.95), (1, 3, 0.55), (2, 3, 0.15), (4, 5, 0.55)],
        "id_a long, id_b long, jaccard double",
    )
    out = {r.threshold: r for r in
           dedup.jaccard_threshold_sweep(pairs, [0.1, 0.5, 0.9]).collect()}
    assert (out[0.1].n_pairs, out[0.5].n_pairs, out[0.9].n_pairs) == (4, 3, 1)
    # drops: id_b with best jaccard >= t: {2,3,5} at 0.1; {2,3,5} at 0.5
    # (3's best is 0.55); {2} at 0.9
    assert (out[0.1].n_dropped, out[0.5].n_dropped, out[0.9].n_dropped) == (3, 3, 1)


# --------------------------------------------------------------- did_estimate


def test_did_nets_out_common_trend(spark):
    # both groups drift +2 after midpoint; treated gets an EXTRA +3:
    # DiD must recover 3 exactly, ignoring the shared trend
    rows = []
    for u in range(20):
        treated = u < 10
        for i in range(10):
            rows.append((u, 5.0 + (3.0 if treated else 0.0) * 0, float(i)))          # pre
            rows.append((u, 7.0 + (3.0 if treated else 0.0), float(100000 + i)))     # post
    df = spark.createDataFrame(rows, "user_id long, value double, t double") \
        .selectExpr("user_id", "value", "timestamp_seconds(t) AS ts")
    treated_units = spark.createDataFrame([(u,) for u in range(10)], "user_id long")
    r = profiling.did_estimate(df, "user_id", treated_units, "value", "ts").collect()[0]
    assert (r.n_treated, r.n_control) == (10, 10)
    assert r.did == 3.0
    assert r.c_post - r.c_pre == 2.0  # the common trend


# ---------------------------------------------------------- source_similarity


def test_source_similarity_identical_vs_disjoint(spark):
    rows = [(0, "alpha beta gamma", "s1"), (1, "alpha beta gamma", "s2"),
            (2, "delta epsilon zeta", "s3")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {(r.src_a, r.src_b): r.cosine for r in
           text.source_similarity(docs).collect()}
    assert out[("s1", "s2")] == 1.0       # identical profiles
    assert ("s1", "s3") not in out        # zero shared tokens -> no pair row
    assert ("s2", "s3") not in out


# ------------------------------------------------------------ absorption_prob

from kairos_spark.operators import graph


def test_absorption_linear_chain(spark):
    # deterministic chain a -> b -> c (target): P(reach c | a, 2 steps)=1,
    # 1 step short from a -> only via full 3-step run still 1 at steps>=2
    rows = [(u, float(i), "abc"[i]) for u in range(10) for i in range(3)]
    df = spark.createDataFrame(rows, "user_id long, t double, event_type string") \
        .selectExpr("user_id", "timestamp_seconds(t) AS ts", "event_type")
    out = {r.state: r.p_reach for r in
           graph.absorption_prob(df, target="c", steps=2).collect()}
    assert out["c"] == 1.0
    assert out["b"] == 1.0   # one hop
    assert out["a"] == 1.0   # two hops
    one = {r.state: r.p_reach for r in
           graph.absorption_prob(df, target="c", steps=1).collect()}
    assert one["a"] == 0.0   # can't reach in one hop
    assert one["b"] == 1.0


def test_absorption_probabilistic_split(spark):
    # from 'a' half the users go to target 'c', half to dead-end 'd'
    rows = []
    for u in range(10):
        rows.append((u, 0.0, "a"))
        rows.append((u, 1.0, "c" if u % 2 == 0 else "d"))
    df = spark.createDataFrame(rows, "user_id long, t double, event_type string") \
        .selectExpr("user_id", "timestamp_seconds(t) AS ts", "event_type")
    out = {r.state: r.p_reach for r in
           graph.absorption_prob(df, target="c", steps=3).collect()}
    assert out["a"] == 0.5


# ------------------------------------------------------------------ bfs_reach


def test_bfs_reach_path_graph(spark):
    # path 1-2-3-4-5: per-hop reach from any seed grows by adjacency
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "a long, b long"
    )
    out = {(r.seed, r.hop): r.n_reached for r in
           graph.bfs_reach(edges, n_seeds=1, hops=3).collect()}
    seed = next(s for s, _ in out)
    # cumulative reach is monotone in hops
    assert out[(seed, 1)] <= out[(seed, 2)] <= out[(seed, 3)]
    # on a 5-path every node reaches everything within 4 hops; 3 hops
    # reach at least 3 others from any seed
    assert out[(seed, 3)] >= 3


def test_bfs_reach_disconnected(spark):
    # two components: a seed can never cross
    edges = spark.createDataFrame([(1, 2), (10, 11)], "a long, b long")
    out = graph.bfs_reach(edges, n_seeds=4, hops=2).collect()
    for r in out:
        assert r.n_reached == 1  # each node reaches only its partner


# --------------------------------------------------------- audience_stability


def test_audience_stability_jaccard(spark):
    # day0 users {1,2,3}, day1 {2,3,4}: overlap 2, union 4 -> 0.5
    rows = [(1, 0.0), (2, 0.0), (3, 0.0), (2, 86400.0), (3, 86400.0), (4, 86400.0)]
    df = spark.createDataFrame(rows, "user_id long, t double").selectExpr(
        "user_id", "timestamp_seconds(t) AS ts"
    )
    r = windows.audience_stability(df).collect()[0]
    assert (r.n_active, r.n_next, r.n_overlap) == (3, 3, 2)
    assert r.jaccard == 0.5


def test_audience_stability_disjoint_days(spark):
    rows = [(1, 0.0), (2, 0.0), (10, 86400.0), (11, 86400.0)]
    df = spark.createDataFrame(rows, "user_id long, t double").selectExpr(
        "user_id", "timestamp_seconds(t) AS ts"
    )
    r = windows.audience_stability(df).collect()[0]
    assert r.n_overlap == 0 and r.jaccard == 0.0


# --------------------------------------------------------------- max_drawdown


def test_max_drawdown_exact(spark):
    # daily sums: +10, -4, -3, +20 -> cum 10,6,3,23; peak 10,10,10,23
    # drawdowns 0,4,7,0 -> MDD 7
    rows = [(10.0, 0.0), (-4.0, 86400.0), (-3.0, 2 * 86400.0), (20.0, 3 * 86400.0)]
    df = spark.createDataFrame(rows, "value double, t double").selectExpr(
        "value", "timestamp_seconds(t) AS ts"
    )
    r = windows.max_drawdown(df).collect()[0]
    assert r.n_buckets == 4
    assert r.final_cum == 23.0 and r.peak == 23.0
    assert r.max_drawdown == 7.0


def test_max_drawdown_monotone_series_is_zero(spark):
    rows = [(5.0, float(d * 86400)) for d in range(10)]
    df = spark.createDataFrame(rows, "value double, t double").selectExpr(
        "value", "timestamp_seconds(t) AS ts"
    )
    assert windows.max_drawdown(df).collect()[0].max_drawdown == 0.0


# ------------------------------------------------------- zonemap_prune_audit

from kairos_spark.operators import layout


def test_zonemap_sorted_layout_prunes_more(spark):
    # values 0..999 shuffled by hash order in "natural" layout; a
    # narrow predicate prunes almost everything under the sorted
    # layout and nearly nothing under a scrambled natural order
    import hashlib
    rows = sorted(
        [(i, float(i)) for i in range(1000)],
        key=lambda r: hashlib.md5(str(r[0]).encode()).hexdigest(),
    )
    rows = [(i, v) for i, (_, v) in enumerate(rows)]  # ids follow scrambled order
    df = spark.createDataFrame(rows, "id long, x double")
    out = {r.layout: r for r in
           layout.zonemap_prune_audit(df, "x", "id", chunk_rows=50,
                                      lo=100.0, hi=150.0).collect()}
    assert out["sorted"].n_chunks == out["natural"].n_chunks == 20
    assert out["sorted"].prune_rate > out["natural"].prune_rate
    assert out["sorted"].n_pruned >= 17  # ~2 of 20 chunks overlap [100,150]


def test_zonemap_conservation(spark):
    df = spark.createDataFrame([(i, float(i % 7)) for i in range(100)], "id long, x double")
    out = layout.zonemap_prune_audit(df, "x", "id", chunk_rows=10, lo=0.0, hi=10.0).collect()
    for r in out:
        assert 0 <= r.n_pruned <= r.n_chunks
        assert r.prune_rate == r.n_pruned / r.n_chunks


# ------------------------------------------------------ incremental_join_audit

from kairos_spark.operators import joins


def test_incremental_join_identity(spark):
    lbase = spark.createDataFrame([(1,), (2,)], "k long")
    ldelta = spark.createDataFrame([(3,)], "k long")
    rbase = spark.createDataFrame([(1, 10.0), (3, 30.0)], "k long, v double")
    rdelta = spark.createDataFrame([(2, 20.0), (3, 33.0)], "k long, v double")
    out = {r.component: r for r in joins.incremental_join_audit(
        lbase, ldelta, rbase, rdelta, "k", "v").collect()}
    # IVM identity: full = base + delta_l + delta_r + delta_both
    parts = ["base", "delta_l", "delta_r", "delta_both"]
    assert out["full"].n_rows == sum(out[p].n_rows for p in parts)
    assert abs(out["full"].value_sum - sum(out[p].value_sum for p in parts)) < 1e-6
    assert out["base"].n_rows == 1      # (1,10)
    assert out["delta_l"].n_rows == 1   # (3,30)
    assert out["delta_both"].n_rows == 1  # (3,33)


# -------------------------------------------------------- theil_decomposition


def test_theil_zero_for_equal_values(spark):
    df = spark.createDataFrame([("a", 5.0)] * 10 + [("b", 5.0)] * 10,
                               "source string, n_chars double")
    r = profiling.theil_decomposition(df, "source", "n_chars").collect()[0]
    assert r.theil_total == 0.0 and r.theil_between == 0.0 and r.theil_within == 0.0


def test_theil_between_captures_group_gap(spark):
    # equal within groups, unequal between: all inequality is BETWEEN
    df = spark.createDataFrame([("a", 1.0)] * 10 + [("b", 9.0)] * 10,
                               "source string, n_chars double")
    r = profiling.theil_decomposition(df, "source", "n_chars").collect()[0]
    assert r.theil_total > 0
    assert abs(r.theil_within) < 1e-6
    assert abs(r.theil_between - r.theil_total) < 1e-6
    # zero/negative rows are dropped and counted
    df2 = spark.createDataFrame([("a", 1.0), ("a", 0.0), ("a", -3.0)],
                                "source string, n_chars double")
    r2 = profiling.theil_decomposition(df2, "source", "n_chars").collect()[0]
    assert r2.n == 1 and r2.n_dropped == 2


# ---------------------------------------------------------- wasserstein_drift


def test_wasserstein_recovers_shift(spark):
    # second half = first half + 5: W1 must equal 5 exactly
    first = [float(v) for v in range(20)]
    second = [v + 5.0 for v in first]
    df = _halves(spark, first, second)
    r = profiling.wasserstein_drift(df).collect()[0]
    assert r.w1 == 5.0


def test_wasserstein_zero_for_identical(spark):
    df = _halves(spark, [1, 2, 3, 4] * 5, [1, 2, 3, 4] * 5)
    assert profiling.wasserstein_drift(df).collect()[0].w1 == 0.0


# ------------------------------------------------------ variance_decomposition


def test_variance_decomposition_factor_a_dominates(spark):
    # value fully determined by factor a; b is noise-free constant
    rows = [("x", i % 4, 10.0) for i in range(40)]
    rows += [("y", i % 4, 20.0) for i in range(40)]
    df = spark.createDataFrame(rows, "a string, b long, v double")
    r = profiling.variance_decomposition(df, "a", "b", "v").collect()[0]
    assert r.eta2_a == 1.0
    assert r.eta2_b == 0.0
    assert r.residual_share == 0.0


def test_variance_decomposition_shares_bounded(spark):
    rows = [("ab"[i % 2], i % 3, float((i * 7) % 11)) for i in range(200)]
    df = spark.createDataFrame(rows, "a string, b long, v double")
    r = profiling.variance_decomposition(df, "a", "b", "v").collect()[0]
    for x in (r.eta2_a, r.eta2_b, r.eta2_cells, r.residual_share):
        assert -1e-9 <= x <= 1.0 + 1e-9
    # cells explain at least as much as either factor alone
    assert r.eta2_cells >= max(r.eta2_a, r.eta2_b) - 1e-9
    assert abs(r.eta2_cells + r.residual_share - 1.0) < 1e-6


# ------------------------------------------------------------------ wilson_ci


def test_wilson_brackets_and_beats_wald_at_extremes(spark):
    rows = [("a", 1)] * 50 + [("a", 0)] * 50 + [("b", 1)] * 20  # b: p_hat = 1
    df = spark.createDataFrame(rows, "g string, s long")
    out = {r.group: r for r in profiling.wilson_ci(df, "g", "s").collect()}
    a = out["a"]
    assert a.ci_lo < a.p_hat < a.ci_hi
    assert abs(a.p_hat - 0.5) < 1e-9
    b = out["b"]
    # Wald would give zero width at p_hat=1; Wilson keeps a real lower bound
    assert b.p_hat == 1.0 and b.ci_lo < 1.0 and b.ci_hi <= 1.0 + 1e-9
    assert b.ci_lo > 0.8  # n=20 all successes -> tight but nonzero


# --------------------------------------------------------------- mann_kendall


def test_mann_kendall_direction(spark):
    day = 86400.0
    rows = [("up", float(d + 1), d * day) for d in range(15)]
    rows += [("down", float(30 - d), d * day) for d in range(15)]
    rows += [("flat", 5.0 + (1.0 if d % 2 == 0 else -1.0), d * day) for d in range(15)]
    df = spark.createDataFrame(rows, "event_type string, value double, t double") \
        .selectExpr("event_type", "value", "timestamp_seconds(t) AS ts")
    out = {r.group: r for r in profiling.mann_kendall(df, "event_type", "value").collect()}
    assert out["up"].s_stat == 15 * 14 // 2        # every pair increases
    assert out["up"].z > 2
    assert out["down"].s_stat == -(15 * 14 // 2)
    assert out["down"].z < -2
    assert abs(out["flat"].z) < 2


# ------------------------------------------------------------- peak_detection


def test_peak_detection_counts_prominent_peaks(spark):
    hour = 3600.0
    # counts per hour: 2, 10, 2, 3, 4, 3  -> one prominent peak (10)
    # and one non-prominent local max (4 vs neighbours 3,3: 4 < 1.5*3)
    counts = [2, 10, 2, 3, 4, 3]
    rows = [("t", h * hour + i) for h, c in enumerate(counts) for i in range(c)]
    df = spark.createDataFrame(rows, "event_type string, t double").selectExpr(
        "event_type", "timestamp_seconds(t) AS ts"
    )
    r = profiling.peak_detection(df, min_prominence=1.5).collect()[0]
    assert r.n_buckets == 6
    assert r.n_peaks == 1
    assert r.max_peak == 10 and r.max_peak_bucket == 1


def test_peak_detection_no_peaks_sentinel(spark):
    rows = [("t", float(h * 3600)) for h in range(5)]  # one event/hour: flat
    df = spark.createDataFrame(rows, "event_type string, t double").selectExpr(
        "event_type", "timestamp_seconds(t) AS ts"
    )
    r = profiling.peak_detection(df).collect()[0]
    assert r.n_peaks == 0 and r.max_peak == -1 and r.max_peak_bucket == -1


# -------------------------------------------------------- hashing_trick_audit


def test_hashing_trick_more_bits_fewer_collisions(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"tok{j}" for j in range(i, i + 20))) for i in range(30)],
        "doc_id long, text string",
    )
    lo = text.hashing_trick_audit(docs, bits=4).collect()[0]
    hi = text.hashing_trick_audit(docs, bits=12).collect()[0]
    assert lo.n_tokens == hi.n_tokens
    assert lo.collision_rate >= hi.collision_rate
    assert lo.n_buckets_used <= 16
    assert 0.0 <= hi.collided_mass_share <= 1.0


def test_hashing_trick_tiny_vocab_no_collisions(spark):
    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    r = text.hashing_trick_audit(docs, bits=12).collect()[0]
    assert r.n_tokens == 3 and r.collision_rate == 0.0


# ----------------------------------------------------------- path_conformance


def test_path_conformance_exact_and_deviant(spark):
    # user 1 follows the canonical view->click->purchase exactly;
    # user 2 runs view->view->error
    rows = [(1, "view", 0.0), (1, "click", 10.0), (1, "purchase", 20.0),
            (2, "view", 0.0), (2, "view", 10.0), (2, "error", 20.0)]
    df = spark.createDataFrame(rows, "user_id long, event_type string, t double") \
        .selectExpr("user_id", "event_type", "timestamp_seconds(t) AS ts")
    out = {r.edit_distance: r for r in
           windows.path_conformance(df, canonical="vcp").collect()}
    assert out[0].n_sessions == 1          # the conformant session
    assert sum(r.n_sessions for r in out.values()) == 2
    assert abs(sum(r.share for r in out.values()) - 1.0) < 1e-6
    # "vve" vs "vcp": substitutions at positions 2 and 3 -> distance 2
    assert out[2].n_sessions == 1


# --------------------------------------------------------------- schema_drift


def test_schema_drift_flags_new_and_dropped_keys(spark):
    rows = [(i, '{"old_key": 1, "stable": 2}', float(i)) for i in range(10)]
    rows += [(100 + i, '{"new_key": 3, "stable": 2}', float(100000 + i)) for i in range(10)]
    df = spark.createDataFrame(rows, "event_id long, props string, t double") \
        .selectExpr("event_id", "props", "timestamp_seconds(t) AS ts")
    out = {r.key: r for r in profiling.schema_drift(df, "props", "ts").collect()}
    assert out["old_key"].status == "dropped" and out["old_key"].n2 == 0
    assert out["new_key"].status == "new" and out["new_key"].n1 == 0
    assert out["stable"].status == "stable"
    assert out["stable"].share1 == 1.0 and out["stable"].share2 == 1.0


# ------------------------------------------------------------ cluster_ratio_ci


def test_ratio_ci_zero_se_for_constant_per_unit_ratio(spark):
    # every user contributes value == 2 per event: residuals vanish
    rows = [(u, "t", 2.0) for u in range(20) for _ in range(u % 3 + 1)]
    df = spark.createDataFrame(rows, "user_id long, event_type string, value double")
    r = profiling.cluster_ratio_ci(df, "event_type", "user_id", "value").collect()[0]
    assert r.ratio == 2.0 and r.se_cluster == 0.0
    assert r.ci_lo == 2.0 and r.ci_hi == 2.0


def test_ratio_ci_widens_with_cluster_heterogeneity(spark):
    homog = [(u, "t", 5.0) for u in range(20) for _ in range(3)]
    heterog = [(u, "t", 10.0 if u % 2 == 0 else 0.0) for u in range(20) for _ in range(3)]
    mk = lambda rows: spark.createDataFrame(rows, "user_id long, event_type string, value double")
    se_h = profiling.cluster_ratio_ci(mk(homog), "event_type", "user_id", "value").collect()[0].se_cluster
    se_x = profiling.cluster_ratio_ci(mk(heterog), "event_type", "user_id", "value").collect()[0].se_cluster
    assert se_x > se_h


# ---------------------------------------------------------------- logrank_test


def test_logrank_identical_cohorts_small_chi2(spark):
    # every user signs up at t=0 and converts after (u % 5 + 1) days —
    # conversion time independent of the hash split -> tiny chi2
    day = 86400.0
    rows = [(u, "signup", 0.0) for u in range(60)]
    rows += [(u, "purchase", (u % 5 + 1) * day) for u in range(60)]
    df = spark.createDataFrame(rows, "user_id long, event_type string, t double") \
        .selectExpr("user_id", "event_type", "timestamp_seconds(t) AS ts")
    r = windows.logrank_test(df).collect()[0]
    assert r.n_a + r.n_b == 60
    assert r.obs_a + 0 >= 0 and r.chi2 < 4.0  # no real difference


def test_logrank_detects_separated_cohorts(spark):
    # conversion time ALIGNED with the hash split: A converts day 1,
    # B converts day 10 -> large chi2
    import hashlib
    day = 86400.0
    rows = []
    for u in range(80):
        is_a = hashlib.md5(str(u).encode()).hexdigest()[0] in "01234567"
        rows.append((u, "signup", 0.0))
        rows.append((u, "purchase", (1.0 if is_a else 10.0) * day))
    df = spark.createDataFrame(rows, "user_id long, event_type string, t double") \
        .selectExpr("user_id", "event_type", "timestamp_seconds(t) AS ts")
    r = windows.logrank_test(df).collect()[0]
    assert r.chi2 > 10.0


# ---------------------------------------------------------------- qq_shift_fit


def test_qq_recovers_pure_shift_and_scale(spark):
    base_vals = [float(v) for v in range(1, 41)]
    shift = profiling.qq_shift_fit(
        _halves(spark, base_vals, [v + 7.0 for v in base_vals])
    ).collect()[0]
    assert abs(shift.slope - 1.0) < 1e-6 and abs(shift.intercept - 7.0) < 1e-6
    scale = profiling.qq_shift_fit(
        _halves(spark, base_vals, [v * 3.0 for v in base_vals])
    ).collect()[0]
    assert abs(scale.slope - 3.0) < 1e-6 and abs(scale.intercept) < 1e-6


def test_qq_identity_for_identical_halves(spark):
    vals = [float((v * 7) % 23) for v in range(40)]
    r = profiling.qq_shift_fit(_halves(spark, vals, vals)).collect()[0]
    assert abs(r.slope - 1.0) < 1e-6 and abs(r.intercept) < 1e-6


# -------------------------------------------------------------- chao1_richness


def test_chao1_exact_formula(spark):
    # vocabulary: a x3, b x1, c x1, d x2 -> V=4, F1=2, F2=1
    # chao1 = 4 + 2^2/(2*1) = 6
    docs = spark.createDataFrame(
        [(0, "a a a b"), (1, "c d d")], "doc_id long, text string"
    )
    r = profiling.chao1_richness(docs).collect()[0]
    assert (r.v_obs, r.f1, r.f2) == (4, 2, 1)
    assert r.chao1 == 6.0
    assert abs(r.unseen_share - 2.0 / 6.0) < 1e-6


def test_chao1_no_singletons_means_no_unseen(spark):
    docs = spark.createDataFrame([(0, "a a b b c c")], "doc_id long, text string")
    r = profiling.chao1_richness(docs).collect()[0]
    assert r.f1 == 0 and r.chao1 == float(r.v_obs) and r.unseen_share == 0.0


def test_chao1_empty_corpus_emits_sentinel_not_null(spark):
    # ADVICE r7: zero token rows -> sum() is NULL; the coalesce must
    # keep the documented 0.0/0 sentinels (no-NULL invariant)
    docs = spark.createDataFrame([], "doc_id long, text string")
    r = profiling.chao1_richness(docs).collect()[0]
    assert (r.v_obs, r.f1, r.f2) == (0, 0, 0)
    assert r.chao1 == 0.0 and r.unseen_share == 0.0
