"""Unit tests for the round-4 layout/delta/calibration operators:
Morton Z-order keys, period-over-period deltas, MinHash estimator
calibration."""

import datetime as dt

from pyspark.sql import Row, functions as F

from kairos_spark.operators import dedup, layout, windows

UTC = dt.timezone.utc


def _d(day, hour=0):
    return dt.datetime(2024, 1, day, hour, tzinfo=UTC)


# --- morton_z ---


def test_morton_interleaves_bits(spark):
    df = spark.createDataFrame([Row(x=3, y=0), Row(x=0, y=3), Row(x=3, y=3)])
    out = df.select(
        "x", "y", layout.morton_z(F.col("x"), F.col("y"), bits=4).alias("z")
    ).collect()
    got = {(r.x, r.y): r.z for r in out}
    # x on even bits: 3 -> 0b0101 = 5; y on odd bits: 3 -> 0b1010 = 10
    assert got[(3, 0)] == 5
    assert got[(0, 3)] == 10
    assert got[(3, 3)] == 15


def test_morton_locality_neighbors_close(spark):
    # points in the same 2x2 cell share z >> 2
    rows = [Row(x=a, y=b) for a in (4, 5) for b in (2, 3)]
    out = spark.createDataFrame(rows).select(
        F.shiftright(layout.morton_z(F.col("x"), F.col("y"), 4), 2).alias("cell")
    ).collect()
    assert len({r.cell for r in out}) == 1


def test_zorder_stats_partitions_variation(spark):
    rows = [
        Row(user_id=u, ts=_d(1 + d, h))
        for u in range(8)
        for d in range(4)
        for h in (0, 6)
    ]
    out = layout.zorder_stats(
        spark.createDataFrame(rows), "user_id", "ts", step_sec=3600, bits=16,
        bucket_shift=2,
    ).collect()
    assert sum(r.n_rows for r in out) == len(rows)
    assert len(out) > 1  # the shift actually splits the z range
    for r in out:
        assert r.n_keys <= 8 and r.hour_span >= 0


# --- period_delta ---


def test_period_delta_day_over_day(spark):
    rows = [Row(event_type="a", ts=_d(1))] * 2
    rows += [Row(event_type="a", ts=_d(2))] * 6
    rows += [Row(event_type="a", ts=_d(3))] * 3
    out = sorted(
        windows.period_delta(spark.createDataFrame(rows), step_sec=86400).collect(),
        key=lambda r: r.i_time,
    )
    assert out[0].prev_n is None and out[0].pct_change is None  # first day
    assert (out[1].prev_n, out[1].delta, out[1].pct_change) == (2, 4, 2.0)
    assert (out[2].prev_n, out[2].delta, out[2].pct_change) == (6, -3, -0.5)


def test_period_delta_keys_independent(spark):
    rows = [Row(event_type="a", ts=_d(1)), Row(event_type="b", ts=_d(2))]
    out = windows.period_delta(spark.createDataFrame(rows), step_sec=86400).collect()
    # each key's single day is its own "first bucket" — no cross-key lag
    assert all(r.prev_n is None for r in out)


# --- minhash_calibration ---


def test_minhash_calibration_exact_dup_scores_one(spark):
    base = "the quick brown fox jumps over the lazy dog " * 4
    rows = [
        Row(doc_id=1, text=base),
        Row(doc_id=2, text=base),          # exact duplicate
        Row(doc_id=3, text="completely different content here entirely " * 4),
    ]
    out = dedup.minhash_calibration(
        spark.createDataFrame(rows), n=8, num_hashes=16, bands=8, threshold=0.2
    ).collect()
    pairs = {(r.id_a, r.id_b): r for r in out}
    assert (1, 2) in pairs
    r = pairs[(1, 2)]
    assert r.est_jaccard == 1.0 and r.jaccard == 1.0 and r.err == 0.0


def test_minhash_calibration_err_is_est_minus_exact(spark):
    a = "alpha beta gamma delta epsilon zeta eta theta " * 3
    b = a + "iota kappa lambda mu nu xi omicron pi rho sigma"
    rows = [Row(doc_id=1, text=a), Row(doc_id=2, text=b)]
    out = dedup.minhash_calibration(
        spark.createDataFrame(rows), n=8, num_hashes=16, bands=8, threshold=0.0
    ).collect()
    if out:  # candidate generation depends on band collisions
        r = out[0]
        assert 0.0 < r.jaccard < 1.0
        assert r.err == round(r.est_jaccard - r.jaccard, 6)


# --- knn_join ---


def test_knn_join_exact_neighbors_ranked(spark):
    from kairos_spark.operators import similarity

    # corpus on a line: q=[1,0]; neighbors by cosine: all positive-x
    # vectors tie at cos=1 -> vec_id tiebreak; negative-x sorts last
    corpus = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[1.0, 0.0]),
            Row(vec_id=2, embedding=[2.0, 0.0]),
            Row(vec_id=3, embedding=[0.0, 1.0]),
            Row(vec_id=4, embedding=[-1.0, 0.0]),
        ]
    )
    qs = spark.createDataFrame([Row(q_id=100, embedding=[1.0, 0.0])])
    out = sorted(
        similarity.knn_join(qs, corpus, k=3).collect(), key=lambda r: r.rank
    )
    assert [r.vec_id for r in out] == [1, 2, 3]
    assert out[0].cosine == 1.0 and out[1].cosine == 1.0
    assert out[2].cosine == 0.0


def test_knn_join_excludes_self_and_handles_many_queries(spark):
    from kairos_spark.operators import similarity

    corpus = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i + 1), 1.0]) for i in range(20)]
    )
    qs = corpus.where("vec_id IN (0, 7)").selectExpr("vec_id AS q_id", "embedding")
    out = similarity.knn_join(qs, corpus, k=5, n_salt=4).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == {0, 7}
    for q, rows in by_q.items():
        assert len(rows) == 5
        assert all(r.vec_id != q for r in rows)
        ranks = sorted(r.rank for r in rows)
        assert ranks == [1, 2, 3, 4, 5]


def test_knn_join_salted_merge_matches_bruteforce(spark):
    import math

    from kairos_spark.operators import similarity

    vecs = {i: [math.cos(i * 0.37), math.sin(i * 0.37)] for i in range(30)}
    corpus = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in vecs.items()]
    )
    qs = spark.createDataFrame([Row(q_id=0, embedding=vecs[0])])
    out = sorted(
        similarity.knn_join(qs, corpus, k=6, n_salt=8).collect(),
        key=lambda r: r.rank,
    )

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    brute = sorted(
        ((cos(vecs[0], v), i) for i, v in vecs.items() if i != 0),
        key=lambda t: (-t[0], t[1]),
    )[:6]
    assert [(r.vec_id, r.cosine) for r in out] == [(i, c) for c, i in brute]


# --- lsh_recall ---


def test_lsh_recall_full_probe_is_exact(spark):
    import math

    from kairos_spark.operators import similarity

    vecs = {i: [math.cos(i * 0.5), math.sin(i * 0.5)] for i in range(12)}
    corpus = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in vecs.items()]
    )
    qs = spark.createDataFrame([Row(q_id=0, embedding=vecs[0])])
    # probe_hamming >= planes: every bucket probed -> candidates = all,
    # recall must be exactly 1
    r = similarity.lsh_recall(
        qs, corpus, dim=2, k=5, planes=4, probe_hamming=4
    ).collect()[0]
    assert r.n_candidates == 11  # all but self
    assert r.recall == 1.0


def test_lsh_recall_restricted_probe_bounded(spark):
    import math

    from kairos_spark.operators import similarity

    vecs = {i: [math.cos(i * 0.23), math.sin(i * 0.23)] for i in range(40)}
    corpus = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in vecs.items()]
    )
    qs = spark.createDataFrame(
        [Row(q_id=0, embedding=vecs[0]), Row(q_id=20, embedding=vecs[20])]
    )
    out = similarity.lsh_recall(
        qs, corpus, dim=2, k=5, planes=6, probe_hamming=1
    ).collect()
    assert {r.q_id for r in out} == {0, 20}
    for r in out:
        assert 0.0 <= r.recall <= 1.0
        assert r.n_candidates <= 39
