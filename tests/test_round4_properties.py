"""Property-based tests for the round-4 operator invariants:
salted join ≡ plain join, unpivot∘pivot ≡ identity, Morton key
bijectivity, PageRank mass conservation, merged intervals vs a
brute-force sweep. Few examples each (every example runs Spark jobs);
the fixed-case tests cover the goldens."""

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row

from kairos_spark.operators import graph, joins, layout, profiling, windows
from pyspark.sql import functions as F

UTC = dt.timezone.utc
BASE = 1_700_000_000


def _dt(sec):
    return dt.datetime.fromtimestamp(BASE + sec, tz=UTC)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 4), st.integers(0, 99)), min_size=1, max_size=20),
    st.lists(st.integers(0, 4), min_size=1, max_size=5, unique=True),
)
def test_salted_join_equals_plain_join(spark, large_rows, small_keys):
    large = spark.createDataFrame([Row(k=k, rid=r) for k, r in large_rows])
    small = spark.createDataFrame([Row(k=k, tag=f"t{k}") for k in small_keys])
    salted = joins.salted_join(large, small, ["k"], n_salt=4, salt_col="rid")
    plain = large.join(small, "k")
    key = lambda r: (r.k, r.rid, r.tag)
    assert sorted(map(key, salted.collect())) == sorted(map(key, plain.collect()))


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 5)),
        min_size=1,
        max_size=25,
    )
)
def test_unpivot_of_pivot_is_identity(spark, events):
    rows = [Row(event_type=t, ts=_dt(h * 3600)) for t, h in events]
    df = spark.createDataFrame(rows)
    wide = profiling.pivot_counts(df, "event_type", ["a", "b", "c"], step_sec=3600)
    back = profiling.unpivot_counts(wide, ["i_time"]).collect()
    # expected long counts: bucket = floor(epoch/3600)*3600
    expected = {}
    for t, h in events:
        b = (BASE + h * 3600) // 3600 * 3600
        expected[(t, b)] = expected.get((t, b), 0) + 1
    got = {(r.name, r.i_time): r.n for r in back}
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 255), st.integers(0, 255)), min_size=1, max_size=30, unique=True))
def test_morton_is_injective_and_bounded(spark, points):
    df = spark.createDataFrame([Row(x=x, y=y) for x, y in points])
    out = df.select(
        "x", "y", layout.morton_z(F.col("x"), F.col("y"), bits=8).alias("z")
    ).collect()
    zs = [r.z for r in out]
    assert len(set(zs)) == len(points)  # injective on the domain
    assert all(0 <= z < (1 << 16) for z in zs)
    # de-interleaving recovers the inputs
    for r in out:
        x = sum(((r.z >> (2 * i)) & 1) << i for i in range(8))
        y = sum(((r.z >> (2 * i + 1)) & 1) << i for i in range(8))
        assert (x, y) == (r.x, r.y)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 4)),
        min_size=1,
        max_size=12,
    ).filter(lambda es: any(a != b for a, b in es))
)
def test_pagerank_conserves_mass(spark, edge_list):
    edges = spark.createDataFrame(
        [Row(src=f"n{a}", dst=f"n{b}") for a, b in edge_list if a != b]
    )
    out = graph.pagerank(edges, iters=2).collect()
    assert abs(sum(r.rank for r in out) - 1.0) < 1e-4
    assert all(r.rank > 0 for r in out)


@settings(max_examples=6, deadline=None)
@given(st.lists(st.integers(0, 3000), min_size=1, max_size=15))
def test_merged_intervals_match_bruteforce(spark, offsets):
    pad = 100
    rows = [Row(user_id=1, ts=_dt(o)) for o in offsets]
    out = windows.merged_activity_intervals(
        spark.createDataFrame(rows), pad_sec=pad
    ).collect()[0]

    ivs = sorted((BASE + o - pad, BASE + o + pad) for o in offsets)
    merged = []
    for s, e in ivs:
        if merged and s <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], e))
        else:
            merged.append((s, e))
    assert out.n_intervals == len(merged)
    assert out.covered_sec == float(sum(e - s for s, e in merged))
    assert out.longest_sec == float(max(e - s for s, e in merged))


@settings(max_examples=5, deadline=None)
@given(
    st.sets(st.integers(0, 10_000), min_size=1, max_size=30),
    st.sets(st.integers(0, 10_000), min_size=1, max_size=40),
)
def test_bloom_never_false_negative(spark, build_keys, probe_keys):
    from kairos_spark.operators import joins

    build = spark.createDataFrame([Row(k=k) for k in build_keys])
    probe = spark.createDataFrame([Row(k=k) for k in probe_keys])
    r = joins.bloom_filter_stats(build, probe, "k", "k", m_bits=2048, k_hashes=3).collect()[0]
    n_true = len(build_keys & probe_keys)
    assert r.n_true == n_true
    # every true member must be a candidate (no false negatives, ever)
    assert r.n_candidates >= n_true
    assert r.n_false_pos >= 0


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=60),
)
def test_cms_never_undercounts(spark, terms):
    from collections import Counter

    from kairos_spark.operators import sketches

    df = spark.createDataFrame([Row(term=t) for t in terms])
    out = sketches.cms_heavy_hitters(df, top_k=4, d=3, w=4).collect()
    truth = Counter(terms)
    for r in out:
        assert r.exact_n == truth[r.term]
        assert r.est_n >= r.exact_n  # CMS one-sided error guarantee
