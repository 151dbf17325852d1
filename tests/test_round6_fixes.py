"""Round-6 ADVICE fixes: bounded-cache iterative graph operators,
no-NULL sentinels on empty-input aggregates, and the interval_allocate
descending-sequence guard."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from kairos_spark.operators import dedup, graph, profiling, windows


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ------------------------------------------------- graph cache hygiene


def _cached_rdd_ids(spark) -> set:
    # delta-based, not absolute: earlier suite tests may leave
    # localCheckpoint blocks that clearCache() doesn't touch (RDD-level
    # storage, reclaimed by GC) — only NEW blocks matter here
    return {
        info.id()
        for info in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }


def test_kcore_peel_leaves_no_cached_blocks(spark):
    spark.catalog.clearCache()
    before = _cached_rdd_ids(spark)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "a long, b long"
    )
    out = graph.kcore_peel(edges, k=2, rounds=3).collect()
    assert len(out) == 3
    # eager operator unpersists every superseded round before returning
    assert _cached_rdd_ids(spark) <= before


def test_bfs_reach_leaves_no_cached_blocks(spark):
    spark.catalog.clearCache()
    before = _cached_rdd_ids(spark)
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "a long, b long")
    out = graph.bfs_reach(edges, n_seeds=2, hops=2).collect()
    assert len(out) == 4  # 2 seeds x 2 hops
    assert _cached_rdd_ids(spark) <= before


def test_peel_round_plan_shape(spark):
    # plan_audit.py can't see the per-round plan on the eager
    # operator's local-relation result; assert it here instead
    edges = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    text = _plan(graph._peel_round(edges, k=2))
    assert "LeftSemi" in text
    assert "HashAggregate" in text
    assert "CartesianProduct" not in text


def test_bfs_hop_plan_shape(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    und = edges.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
        edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    seeds = edges.select(F.col("a").alias("seed")).limit(1)
    visited = seeds.select("seed", F.col("seed").alias("node"))
    text = _plan(graph._bfs_hop(visited, und, visited))
    assert "LeftAnti" in text
    assert "HashAggregate" in text  # the distinct
    assert "CartesianProduct" not in text


def test_kcore_values_unchanged_by_eager_rewrite(spark):
    # triangle 1-2-3 plus pendant 4 (same fixture as the r5 test):
    # pendant peels, triangle is the stable 2-core
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "a long, b long"
    )
    out = {r.round: r for r in graph.kcore_peel(edges, k=2, rounds=3).collect()}
    for rnd in (1, 2, 3):
        assert (out[rnd].n_nodes, out[rnd].n_edges) == (3, 3)


# ------------------------------------------- no-NULL empty aggregates


def test_threshold_sweep_empty_pairs_yields_zeros(spark):
    pairs = spark.createDataFrame(
        [], "id_a long, id_b long, jaccard double"
    )
    out = dedup.jaccard_threshold_sweep(pairs, [0.1, 0.5]).collect()
    assert len(out) == 2
    for r in out:
        assert r.n_pairs == 0 and r.n_dropped == 0  # not None


def test_policy_replay_unmatched_arm_sentinel(spark):
    # one unit, two arms: the md5 rule targets exactly one arm, so the
    # other arm's group has sum(m)=0 -> sentinel -1.0, never NULL
    df = spark.createDataFrame(
        [("u1", "arm_a", 5.0), ("u1", "arm_b", 7.0)],
        "user_id string, event_type string, value double",
    )
    out = {r.arm: r for r in
           profiling.policy_replay(df, "user_id", "event_type", "value").collect()}
    means = sorted(r.replay_mean for r in out.values())
    assert means[0] == -1.0
    assert means[1] in (5.0, 7.0)
    for r in out.values():
        assert r.replay_mean is not None


# --------------------------------------- interval_allocate degenerate


def test_interval_allocate_drops_end_before_start(spark):
    df = spark.createDataFrame(
        [
            (0.0, 7200.0, 10.0),   # spans 2 buckets -> 5.0 each
            (9000.0, 5000.0, 99.0),  # malformed: end < start -> dropped
        ],
        "s double, e double, v double",
    )
    out = {r.bucket_start: r for r in
           windows.interval_allocate(df, "s", "e", "v", 3600).collect()}
    # end-boundary bucket 7200 gets a zero-overlap row by design
    assert set(out) == {0, 3600, 7200}
    assert out[0].allocated == 5.0 and out[3600].allocated == 5.0
    assert out[7200].allocated == 0.0
    # the malformed row contributed nowhere (no negative fractions,
    # no buckets 5000-9000 beyond the well-formed row's span)
    assert all(r.n_intervals == 1 for r in out.values())


def test_dedup_recall_audit_zero_truth_yields_zero(spark):
    # no doc_id divisible by mod -> zero planted pairs -> recall 0.0
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (3, "epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    out = dedup.dedup_recall_audit(docs, mod=4).collect()
    assert len(out) == 1
    assert out[0].n_truth == 0
    assert out[0].recall == 0.0 and out[0].recall is not None


def test_fk_conformance_empty_child_yields_zero_rate(spark):
    child = spark.createDataFrame([], "k long")
    parent = spark.createDataFrame([(1,)], "k long")
    out = profiling.fk_conformance(child, parent, "k", "k", "t.k").collect()
    assert out[0].n_child == 0 and out[0].orphan_rate == 0.0


# -------------------------------------------- injectable media decoder


def test_extract_features_custom_decoder_plumbs_through(spark):
    # a decoder callable ships to executors inside the mapInPandas
    # closure — the exact seam a real Pillow/ffmpeg decode drops into
    from kairos_spark.operators import multimodal

    docs = spark.createDataFrame(
        [(1, "abcd"), (2, "zzzzzzzz")], "doc_id long, text string"
    )
    media = multimodal.attach_media(docs)
    out = {r.media_id: r for r in multimodal.extract_features(
        media, decoder=lambda p: [float(len(p))] + [0.0] * 15
    ).collect()}
    assert out[1].features[0] == 4.0 and out[2].features[0] == 8.0
    assert all(len(r.features) == 16 for r in out.values())


def test_extract_features_strict_still_raises_without_pil(spark):
    from kairos_spark.operators import multimodal

    if multimodal._HAS_PIL:  # container gained Pillow: strict decodes
        return
    import pytest

    docs = spark.createDataFrame([(1, "abcd")], "doc_id long, text string")
    media = multimodal.attach_media(docs)
    with pytest.raises(Exception):
        multimodal.extract_features(media, strict=True).collect()


def test_interval_allocate_zero_length_point(spark):
    df = spark.createDataFrame([(3700.0, 3700.0, 4.0)], "s double, e double, v double")
    out = windows.interval_allocate(df, "s", "e", "v", 3600).collect()
    assert len(out) == 1
    assert out[0].bucket_start == 3600 and out[0].allocated == 4.0
