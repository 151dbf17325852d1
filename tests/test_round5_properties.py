"""Property-based tests for the round-5 operator invariants:
the winnowing match guarantee, HLL register merge ≡ union, weighted
median bounds + weight-scale invariance, KS/AUC range and symmetry
laws, SCD2 interval tiling. Few examples each (every example runs
Spark jobs); the fixed-case tests cover the goldens."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row, functions as F

from kairos_spark.operators import dedup, profiling, sketches

WORDS = st.lists(
    st.text(alphabet="abcdefgh", min_size=3, max_size=6), min_size=4, max_size=12
)


@settings(max_examples=5, deadline=None)
@given(WORDS, WORDS, st.text(alphabet="mnopqrst", min_size=20, max_size=40))
def test_winnowing_guarantee_planted_common_substring(spark, wa, wb, common):
    # any shared verbatim run of length >= w + k - 1 (= 11 at k=8, w=4)
    # must share a fingerprint — the winnowing paper's core guarantee
    a = " ".join(wa) + " " + common + " " + " ".join(wb)
    b = " ".join(wb) + "x " + common + " y" + " ".join(wa)
    df = spark.createDataFrame([Row(doc_id=1, text=a), Row(doc_id=2, text=b)])
    fps = dedup.winnow_fingerprints(df, k=8, w=4).collect()
    fa = {r.fp for r in fps if r.doc_id == 1}
    fb = {r.fp for r in fps if r.doc_id == 2}
    assert fa & fb


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.integers(0, 500), min_size=1, max_size=60),
    st.lists(st.integers(0, 500), min_size=1, max_size=60),
)
def test_hll_register_merge_equals_union(spark, xs, ys):
    # max-merge of two register tables == registers of the union —
    # the mergeability contract that lets sketches roll up
    da = spark.createDataFrame([Row(g="g", v=x) for x in xs])
    db = spark.createDataFrame([Row(g="g", v=y) for y in ys])
    du = spark.createDataFrame([Row(g="g", v=v) for v in xs + ys])
    ra = {r.reg: r.rho for r in sketches.hll_registers(da, ["g"], "v").collect()}
    rb = {r.reg: r.rho for r in sketches.hll_registers(db, ["g"], "v").collect()}
    ru = {r.reg: r.rho for r in sketches.hll_registers(du, ["g"], "v").collect()}
    merged = {k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)}
    assert merged == ru


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(-50, 50), st.integers(1, 9)),
        min_size=1,
        max_size=25,
    ),
    st.integers(2, 5),
)
def test_weighted_median_bounds_and_weight_scale_invariance(spark, vw, scale):
    df = spark.createDataFrame([Row(g="g", v=v, w=w) for v, w in vw])
    out = profiling.weighted_median(df, ["g"], "v", "w").collect()[0]
    vals = [v for v, _ in vw]
    assert min(vals) <= out.wmedian <= max(vals)
    # scaling every weight by a constant must not move the median
    df2 = spark.createDataFrame([Row(g="g", v=v, w=w * scale) for v, w in vw])
    out2 = profiling.weighted_median(df2, ["g"], "v", "w").collect()[0]
    assert out2.wmedian == out.wmedian


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.floats(0, 100, allow_nan=False), st.booleans()),
        min_size=4,
        max_size=30,
    )
)
def test_auc_range_and_negation_antisymmetry(spark, data):
    if not (any(y for _, y in data) and any(not y for _, y in data)):
        return
    df = spark.createDataFrame([Row(g="g", s=float(s), y=y) for s, y in data])
    auc = profiling.rank_auc(df, "s", "y", ["g"]).collect()[0].auc
    assert 0.0 <= auc <= 1.0
    neg = spark.createDataFrame([Row(g="g", s=-float(s), y=y) for s, y in data])
    auc_neg = profiling.rank_auc(neg, "s", "y", ["g"]).collect()[0].auc
    assert abs(auc + auc_neg - 1.0) < 1e-9


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 47)),
        min_size=2,
        max_size=40,
    )
)
def test_scd2_intervals_tile_without_overlap(spark, ev):
    # per user: intervals sorted by valid_from must tile end-to-start
    # and event counts must sum to the user's event count
    rows = [
        Row(user_id=1, event_id=i, event_type=f"s{s}",
            ts=f"2024-01-01 {h // 2:02d}:{(h % 2) * 30:02d}:00")
        for i, (s, h) in enumerate(ev)
    ]
    from kairos_spark.operators import windows

    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    out = sorted(windows.scd2_intervals(df).collect(), key=lambda r: r.valid_from_us)
    assert sum(r.n_events for r in out) == len(rows)
    for cur, nxt in zip(out, out[1:]):
        assert cur.valid_to_us == nxt.valid_from_us
        assert cur.state != nxt.state or cur.valid_to_us > cur.valid_from_us
    assert out[-1].valid_to_us == 253402300799999999
