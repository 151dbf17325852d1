"""Property-based tests for the late-round-5 operator invariants:
interval allocation conserves mass, the group fingerprint is a pure
multiset function (order/partition-invariant, injective-modulo-hash),
BH adjustment is monotone and bounded, kcore peeling reaches a fixed
point that IS a k-core, the IVM join identity holds on random splits,
Wilson intervals bracket p-hat, and RRF fusion respects rank algebra.
Few examples each (every example runs Spark jobs)."""

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row, functions as F

from kairos_spark.operators import dedup, graph, joins, profiling, windows


INTERVALS = st.lists(
    st.tuples(
        st.integers(0, 5000),               # start
        st.integers(0, 4000),               # length
        st.integers(-50, 50),               # value
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=5, deadline=None)
@given(INTERVALS)
def test_interval_allocate_conserves_mass(spark, ivs):
    rows = [(float(s), float(s + l), float(v)) for s, l, v in ivs]
    df = spark.createDataFrame(rows, "s double, e double, v double")
    out = windows.interval_allocate(df, "s", "e", "v", bucket_seconds=600).collect()
    assert abs(sum(r.allocated for r in out) - sum(v for _, _, v in rows)) < 1e-4
    # every bucket touched lies inside the hull of the intervals
    lo = min(s for s, _, _ in ivs) // 600 * 600
    hi = max(s + l for s, l, _ in ivs)
    for r in out:
        assert lo <= r.bucket_start <= hi


ROWS = st.lists(
    st.tuples(st.integers(0, 30), st.text("abcf", min_size=0, max_size=4)),
    min_size=1,
    max_size=20,
)


@settings(max_examples=5, deadline=None)
@given(ROWS, st.randoms())
def test_fingerprint_is_multiset_function(spark, rows, rnd):
    shuffled = list(rows)
    rnd.shuffle(shuffled)
    mk = lambda rs, parts: spark.createDataFrame(
        [Row(g="x", id=i, s=s) for i, s in rs]
    ).repartition(parts)
    f1 = profiling.group_fingerprint(mk(rows, 1), "g", ["id", "s"]).collect()[0]
    f2 = profiling.group_fingerprint(mk(shuffled, 5), "g", ["id", "s"]).collect()[0]
    assert (f1.n_rows, f1.fingerprint) == (f2.n_rows, f2.fingerprint)


PVALS = st.lists(
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False), min_size=1, max_size=10
)


@settings(max_examples=5, deadline=None)
@given(PVALS)
def test_bh_adjust_laws(spark, ps):
    rows = [Row(key=f"k{i}", p=float(p)) for i, p in enumerate(ps)]
    out = sorted(
        profiling.bh_adjust(spark.createDataFrame(rows), "p", "key").collect(),
        key=lambda r: r.rank,
    )
    for r in out:
        assert 0.0 <= r.p_adj <= 1.0
        assert r.p_adj >= r.p - 1e-6            # adjustment never shrinks p
    for a, b in zip(out, out[1:]):
        assert b.p_adj >= a.p_adj - 1e-9        # monotone in rank
    # the top-ranked adjusted p equals min over j of m*p_j/j (capped)
    m = len(ps)
    want = min(1.0, min(m * r.p / r.rank for r in out))
    assert abs(out[0].p_adj - round(want, 6)) < 2e-6


GRAPH_EDGES = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 6)).filter(lambda e: e[0] < e[1]),
    min_size=1,
    max_size=10,
    unique=True,
)


@settings(max_examples=3, deadline=None)
@given(GRAPH_EDGES, st.sampled_from([2, 3]))
def test_kcore_fixpoint_is_a_kcore(spark, edges, k):
    df = spark.createDataFrame([Row(a=a, b=b) for a, b in edges])
    # 6 rounds converge on <= 7 nodes (peeling strictly shrinks until
    # stable); kept small — each round persists an edge snapshot and a
    # heavy parameterization here starved the test JVM
    out = {r.round: r for r in graph.kcore_peel(df, k=k, rounds=6).collect()}
    last, prev = out[6], out[5]
    assert (last.n_nodes, last.n_edges) == (prev.n_nodes, prev.n_edges)  # fixed point
    # python reference: iterate peeling to convergence
    es = set(edges)
    while True:
        deg = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        nes = {(a, b) for a, b in es if a in keep and b in keep}
        if nes == es:
            break
        es = nes
    nodes = {n for e in es for n in e}
    assert last.n_edges == len(es) and last.n_nodes == len(nodes)


IVM_ROWS = st.lists(st.tuples(st.integers(0, 8), st.integers(1, 9)), min_size=0, max_size=12)


@settings(max_examples=5, deadline=None)
@given(IVM_ROWS, IVM_ROWS, st.integers(0, 8))
def test_ivm_identity_random_splits(spark, lrows, rrows, cutoff):
    mk = lambda rs: spark.createDataFrame(
        [Row(k=k, v=float(v)) for k, v in rs], "k long, v double"
    )
    lb = mk([r for r in lrows if r[0] <= cutoff]).select("k")
    ld = mk([r for r in lrows if r[0] > cutoff]).select("k")
    rb = mk([r for r in rrows if r[0] <= cutoff])
    rd = mk([r for r in rrows if r[0] > cutoff])
    out = {r.component: r for r in
           joins.incremental_join_audit(lb, ld, rb, rd, "k", "v").collect()}
    parts = ["base", "delta_l", "delta_r", "delta_both"]
    assert out["full"].n_rows == sum(out[p].n_rows for p in parts)
    assert abs(out["full"].value_sum - sum(out[p].value_sum for p in parts)) < 1e-4


@settings(max_examples=5, deadline=None)
@given(st.integers(1, 60), st.integers(0, 60))
def test_wilson_brackets_and_orders(spark, n, k_raw):
    k = min(k_raw, n)
    rows = [("g", 1)] * k + [("g", 0)] * (n - k)
    r = profiling.wilson_ci(
        spark.createDataFrame(rows, "g string, s long"), "g", "s"
    ).collect()[0]
    assert 0.0 <= r.ci_lo <= r.p_hat + 1e-9
    assert r.p_hat - 1e-9 <= r.ci_hi <= 1.0 + 1e-9
    assert r.ci_lo <= r.ci_hi


VECS = st.lists(
    st.tuples(st.floats(0.1, 10.0), st.floats(0.1, 10.0)), min_size=4, max_size=10
)


@settings(max_examples=5, deadline=None)
@given(VECS)
def test_rrf_rank_algebra(spark, pts):
    from kairos_spark.operators import similarity

    rows = [Row(vec_id=i, embedding=[float(x), float(y)]) for i, (x, y) in enumerate(pts)]
    out = similarity.rrf_fusion(
        spark.createDataFrame(rows), n_queries=1, top_n=len(pts), topk=len(pts)
    ).collect()
    # with top_n covering everything, every candidate is on both lists
    for r in out:
        assert r.rank_cos > 0 and r.rank_l2 > 0
        want = round(1.0 / (60 + r.rank_cos) + 1.0 / (60 + r.rank_l2), 6)
        assert abs(r.rrf_score - want) < 1e-9
