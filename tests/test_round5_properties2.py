"""Property-based tests for the round-5 second-wave invariants:
prefix-filter losslessness (AllPairs == brute force), union-find CC
local finish ≡ distributed loop on random graphs, incremental rollup
merge ≡ batch recompute, CDC upsert idempotence/latest-wins, ECE and
histogram-overlap range laws, OLS exact-plane recovery. Few examples
each (every example runs Spark jobs)."""

import math
from itertools import combinations

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row, functions as F

from kairos_spark.operators import dedup, joins, profiling


DOC_WORDS = st.lists(
    st.sampled_from("alpha beta gamma delta epsilon zeta eta theta".split()),
    min_size=3,
    max_size=8,
)


@settings(max_examples=5, deadline=None)
@given(st.lists(DOC_WORDS, min_size=2, max_size=6), st.sampled_from([0.5, 0.7, 0.9]))
def test_prefix_jaccard_equals_bruteforce(spark, docs, t):
    rows = [Row(doc_id=i, text=" ".join(ws)) for i, ws in enumerate(docs)]
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.prefix_jaccard_pairs(
            spark.createDataFrame(rows), threshold=t
        ).collect()
    }

    def jac(x, y):
        sx, sy = set(docs[x]), set(docs[y])
        return len(sx & sy) / len(sx | sy) if sx | sy else 0.0

    want = {
        (x, y): round(jac(x, y), 6)
        for x, y in combinations(range(len(docs)), 2)
        if jac(x, y) >= t
    }
    assert got == want  # lossless: no misses, no spurious pairs


EDGES = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=15,
)


@settings(max_examples=5, deadline=None)
@given(EDGES)
def test_cc_local_finish_equals_loop_random_graphs(spark, edges):
    pairs = spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in edges]
    )
    local = {
        (r.node, r.cluster_id) for r in dedup.connected_components(pairs).collect()
    }
    loop = {
        (r.node, r.cluster_id)
        for r in dedup.connected_components(
            pairs, local_finish_max_edges=0
        ).collect()
    }
    assert local == loop


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(-50, 50)),
        min_size=1,
        max_size=20,
    ),
    st.integers(0, 19),
)
def test_merge_rollup_equals_batch_property(spark, rows, cut):
    cut = min(cut, len(rows) - 1)
    part_a, part_b = rows[: cut + 1], rows[cut + 1 :]
    measures = {"cnt": "sum", "sv": "sum", "mn": "min", "mx": "max"}

    def agg(part):
        return (
            spark.createDataFrame([Row(k=k, v=v) for k, v in part])
            .groupBy("k")
            .agg(
                F.count("*").cast("long").alias("cnt"),
                F.sum("v").cast("long").alias("sv"),
                F.min("v").alias("mn"),
                F.max("v").alias("mx"),
            )
        )

    if not part_b:
        return  # empty delta: nothing to merge
    merged = {
        r.k: (r.cnt, r.sv, r.mn, r.mx)
        for r in profiling.merge_rollup(
            agg(part_a), agg(part_b), ["k"], measures
        ).collect()
    }
    full = {r.k: (r.cnt, r.sv, r.mn, r.mx) for r in agg(rows).collect()}
    assert merged == full


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 5), st.integers(1, 9), st.sampled_from("UD")),
        min_size=1,
        max_size=12,
    )
)
def test_cdc_upsert_reapply_is_idempotent(spark, ops):
    # applying the same changelog to the merged result changes nothing:
    # the same winners win again, deletes stay deleted
    base = spark.createDataFrame([Row(k=k, v=f"base{k}") for k in range(1, 6)])
    # make seq unique per (k, i) so latest-wins is deterministic
    changes = spark.createDataFrame(
        [
            Row(k=k, v=f"v{k}_{i}", seq=seq * 100 + i, op=op)
            for i, (k, seq, op) in enumerate(ops)
        ]
    )
    once = joins.cdc_upsert(base, changes, ["k"], "seq")
    twice = joins.cdc_upsert(once, changes, ["k"], "seq")
    a = {(r.k, r.v) for r in once.collect()}
    b = {(r.k, r.v) for r in twice.collect()}
    assert a == b


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(0.0, 1.0, allow_nan=False, width=32), st.booleans()
        ),
        min_size=2,
        max_size=30,
    )
)
def test_calibration_ece_bounded_by_max_gap(spark, pts):
    rows = [Row(s=float(s), y=bool(y)) for s, y in pts]
    out = profiling.calibration_bins(
        spark.createDataFrame(rows), "s", "y", n_bins=5
    ).collect()
    ece = out[0].ece
    assert 0.0 <= ece <= 1.0
    max_gap = max(abs(r.gap) for r in out)
    assert ece <= max_gap + 1e-6  # weighted mean of |gap| <= max |gap|


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.floats(-100, 100, allow_nan=False, width=32), min_size=2, max_size=25),
    st.lists(st.floats(-100, 100, allow_nan=False, width=32), min_size=2, max_size=25),
)
def test_dist_overlap_range_and_self_similarity(spark, va, vb):
    rows = [Row(g="a", v=float(v)) for v in va] + [
        Row(g="b", v=float(v)) for v in vb
    ] + [Row(g="c", v=float(v)) for v in va]  # c duplicates a
    out = profiling.dist_overlap(spark.createDataFrame(rows), "g", "v", n_bins=8)
    got = {(r.group_a, r.group_b): r.overlap for r in out.collect()}
    for v in got.values():
        assert -1e-9 <= v <= 1.0 + 1e-9
    assert got[("a", "c")] == 1.0  # identical distributions
