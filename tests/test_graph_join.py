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
