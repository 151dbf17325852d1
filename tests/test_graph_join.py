"""Unit tests for the round-4 join/graph operators: salted join,
unpivot melt, label cluster quality, fixed-iteration PageRank."""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from kairos_spark.operators import graph, joins, profiling, similarity

UTC = dt.timezone.utc


# --- salted_join ---


def test_salted_join_equals_plain_join(spark):
    large = spark.createDataFrame(
        [Row(k=i % 3, payload=i) for i in range(30)]
    )
    small = spark.createDataFrame([Row(k=0, d="a"), Row(k=1, d="b"), Row(k=2, d="c")])
    salted = joins.salted_join(large, small, ["k"], n_salt=4).orderBy("payload")
    plain = large.join(small, "k").orderBy("payload")
    assert [r.asDict() for r in salted.collect()] == [
        r.asDict() for r in plain.collect()
    ]


def test_salted_join_hot_key_splits_buckets(spark):
    # one key dominates; with a per-row salt basis the hot key's rows
    # must land in more than one salt bucket
    large = spark.createDataFrame([Row(k=1, rid=i) for i in range(64)])
    small = spark.createDataFrame([Row(k=1, d="x")])
    l = large.withColumn(
        "__salt",
        F.conv(F.substring(F.md5(F.col("rid").cast("string")), 1, 11), 16, 10).cast(
            "long"
        )
        % 8,
    )
    n_buckets = l.select("__salt").distinct().count()
    assert n_buckets > 1
    out = joins.salted_join(large, small, ["k"], n_salt=8, salt_col="rid")
    assert out.count() == 64


def test_salted_join_no_match_keys_drop(spark):
    large = spark.createDataFrame([Row(k=1, v=1), Row(k=2, v=2)])
    small = spark.createDataFrame([Row(k=1, d="x")])
    out = joins.salted_join(large, small, ["k"], n_salt=4).collect()
    assert len(out) == 1 and out[0].k == 1


# --- unpivot_counts ---


def test_unpivot_inverts_pivot(spark):
    ts = dt.datetime(2024, 1, 1, tzinfo=UTC)
    rows = [Row(event_type="a", ts=ts)] * 2 + [Row(event_type="b", ts=ts)]
    wide = profiling.pivot_counts(
        spark.createDataFrame(rows), "event_type", ["a", "b", "c"], step_sec=3600
    )
    long = profiling.unpivot_counts(wide, ["i_time"]).collect()
    got = {(r.name, r.n) for r in long}
    assert got == {("a", 2), ("b", 1)}  # zero-count c dropped


def test_unpivot_keep_zeros(spark):
    ts = dt.datetime(2024, 1, 1, tzinfo=UTC)
    wide = profiling.pivot_counts(
        spark.createDataFrame([Row(event_type="a", ts=ts)]),
        "event_type",
        ["a", "b"],
        step_sec=3600,
    )
    long = profiling.unpivot_counts(wide, ["i_time"], drop_zeros=False).collect()
    assert {(r.name, r.n) for r in long} == {("a", 1), ("b", 0)}


# --- label_cluster_quality ---


def test_cluster_quality_tight_vs_loose(spark):
    # label 0: two identical vectors (cohesion 0); label 1: two vectors
    # 2 apart on axis 0 (cohesion = 1.0 = mean sq dist to midpoint)
    rows = [
        Row(label=0, embedding=[0.0, 0.0]),
        Row(label=0, embedding=[0.0, 0.0]),
        Row(label=1, embedding=[9.0, 0.0]),
        Row(label=1, embedding=[11.0, 0.0]),
    ]
    out = {
        r.label: r
        for r in similarity.label_cluster_quality(
            spark.createDataFrame(rows)
        ).collect()
    }
    assert out[0].cohesion == 0.0
    assert out[1].cohesion == 1.0
    # centroids at (0,0) and (10,0): separation = 100 for both
    assert out[0].separation == 100.0 and out[1].separation == 100.0
    assert out[1].quality_ratio == 0.01


def test_cluster_quality_nearest_other_centroid(spark):
    rows = [
        Row(label=0, embedding=[0.0]),
        Row(label=1, embedding=[1.0]),
        Row(label=2, embedding=[10.0]),
    ]
    out = {
        r.label: r
        for r in similarity.label_cluster_quality(
            spark.createDataFrame(rows)
        ).collect()
    }
    assert out[0].separation == 1.0   # nearest is label 1
    assert out[2].separation == 81.0  # nearest is label 1 at distance 9
    assert all(out[i].n_vecs == 1 for i in range(3))


# --- pagerank ---


def test_pagerank_ranks_sum_to_one(spark):
    edges = spark.createDataFrame(
        [Row(src="a", dst="b", w=1), Row(src="b", dst="c", w=1), Row(src="c", dst="a", w=1)]
    )
    out = graph.pagerank(edges, iters=3, weight_col="w").collect()
    assert abs(sum(r.rank for r in out) - 1.0) < 1e-5
    # symmetric cycle: uniform ranks
    assert all(r.rank == pytest.approx(1 / 3, abs=1e-6) for r in out)


def test_pagerank_sink_handled_and_authority_wins(spark):
    # star: a,b,c all point at hub; hub has no out-edges (dangling)
    edges = spark.createDataFrame(
        [Row(src=s, dst="hub") for s in ("a", "b", "c")]
    )
    out = {r.node: r.rank for r in graph.pagerank(edges, iters=2).collect()}
    assert out["hub"] > out["a"]
    assert abs(sum(out.values()) - 1.0) < 1e-5


def test_pagerank_weights_shift_rank(spark):
    # a splits rank 9:1 between b and c
    edges = spark.createDataFrame(
        [Row(src="a", dst="b", w=9), Row(src="a", dst="c", w=1),
         Row(src="b", dst="a", w=1), Row(src="c", dst="a", w=1)]
    )
    out = {r.node: r.rank for r in graph.pagerank(edges, weight_col="w", iters=2).collect()}
    assert out["b"] > out["c"]


# --- fuzzy_blocked_match ---


def test_fuzzy_match_finds_best_and_counts_ambiguity(spark):
    clean = spark.createDataFrame(
        [
            Row(cid=1, name="alpha", blk=1),
            Row(cid=2, name="alphz", blk=1),
            Row(cid=3, name="zzzzz", blk=1),
            Row(cid=4, name="alpha", blk=2),  # other block: unreachable
        ]
    )
    dirty = spark.createDataFrame([Row(did=100, name="alphq", blk=1)])
    out = joins.fuzzy_blocked_match(
        dirty, clean, "did", "name", "cid", "name", ["blk"], max_dist=1
    ).collect()
    assert len(out) == 1
    r = out[0]
    # candidates: cid 1 (dist 1) and cid 2 (dist 1); zzzzz filtered
    assert r.n_candidates == 2
    assert r.best_dist == 1 and r.best_id == 1  # tie -> min id


def test_fuzzy_match_blocking_prevents_cross_block(spark):
    clean = spark.createDataFrame([Row(cid=1, name="same", blk=1)])
    dirty = spark.createDataFrame([Row(did=9, name="same", blk=2)])
    out = joins.fuzzy_blocked_match(
        dirty, clean, "did", "name", "cid", "name", ["blk"], max_dist=2
    ).collect()
    assert out == []


def test_fuzzy_match_exact_dup_distance_zero(spark):
    clean = spark.createDataFrame([Row(cid=7, name="hello world", blk=0)])
    dirty = spark.createDataFrame([Row(did=1, name="hello world", blk=0)])
    r = joins.fuzzy_blocked_match(
        dirty, clean, "did", "name", "cid", "name", ["blk"]
    ).collect()[0]
    assert r.best_dist == 0 and r.best_id == 7


# --- interarrival_stats ---


def test_interarrival_gaps_and_percentiles(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    offs = [0, 10, 30, 70]  # gaps 10, 20, 40
    rows = [
        Row(user_id=1, event_id=i, ts=base + dt.timedelta(seconds=o))
        for i, o in enumerate(offs)
    ]
    from kairos_spark.operators import windows as w

    r = w.interarrival_stats(
        spark.createDataFrame(rows), "user_id", "ts", order_col="event_id"
    ).collect()[0]
    assert r.n_gaps == 3
    assert r.median_gap == 20.0
    assert r.max_gap == 40.0
    # percentile(0.9) over [10,20,40]: interpolated = 20 + 0.8*20 = 36
    assert r.p90_gap == 36.0


def test_interarrival_single_event_user_excluded(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = [Row(user_id=1, event_id=1, ts=base)]
    from kairos_spark.operators import windows as w

    assert (
        w.interarrival_stats(spark.createDataFrame(rows), "user_id", "ts").collect()
        == []
    )


# --- knn_label_agreement ---


def test_label_agreement_clean_vs_noisy_cluster(spark):
    from kairos_spark.operators import similarity

    # two tight clusters far apart; one vector of label 1 sits inside
    # cluster 0 -> its neighbors all disagree -> suspect
    rows = [Row(vec_id=i, label=0, embedding=[0.0 + i * 1e-3, 1.0]) for i in range(4)]
    rows += [Row(vec_id=10 + i, label=1, embedding=[1.0, -1.0 + i * 1e-3]) for i in range(4)]
    rows += [Row(vec_id=99, label=1, embedding=[0.002, 1.0])]  # mislabeled
    out = {
        r.label: r
        for r in similarity.knn_label_agreement(
            spark.createDataFrame(rows), k=3
        ).collect()
    }
    assert out[0].n_vecs == 4 and out[1].n_vecs == 5
    # label-0 vectors neighbor each other (and the intruder) — high agreement
    assert out[0].mean_agreement > 0.5
    assert out[1].n_suspect >= 1  # the intruder's neighbors are label 0
