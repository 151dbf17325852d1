"""Unit tests for the round-4 quality/drift operators: tolerance
as-of join, boilerplate chunk detection, PMI pairs, PSI drift."""

import datetime as dt
import math

from pyspark.sql import Row

from kairos_spark.operators import profiling, text, windows

UTC = dt.timezone.utc


def _t(hour, minute=0):
    return dt.datetime(2024, 1, 1, hour, minute, tzinfo=UTC)


# --- asof_join tolerance ---


def test_asof_tolerance_masks_stale_match(spark):
    left = spark.createDataFrame([Row(k=1, ts=_t(10))])
    right = spark.createDataFrame([Row(k=1, ts=_t(1))])  # 9h earlier
    fresh = windows.asof_join(
        left, right, ["k"], tolerance_sec=10 * 3600.0
    ).collect()[0]
    assert fresh.ts_r is not None
    stale = windows.asof_join(
        left, right, ["k"], tolerance_sec=3600.0
    ).collect()[0]
    assert stale.ts_r is None


def test_asof_tolerance_boundary_inclusive(spark):
    left = spark.createDataFrame([Row(k=1, ts=_t(2))])
    right = spark.createDataFrame([Row(k=1, ts=_t(1))])  # exactly 3600s
    r = windows.asof_join(left, right, ["k"], tolerance_sec=3600.0).collect()[0]
    assert r.ts_r is not None


def test_asof_tolerance_null_without_match_unchanged(spark):
    left = spark.createDataFrame([Row(k=1, ts=_t(1))])
    right = spark.createDataFrame([Row(k=2, ts=_t(0))])  # different key
    r = windows.asof_join(left, right, ["k"], tolerance_sec=60.0).collect()[0]
    assert r.ts_r is None


# --- boilerplate_chunks ---


def test_boilerplate_shared_chunk_flagged(spark):
    shared = "alpha beta gamma delta"
    rows = [
        Row(doc_id=1, text=shared + " unique one two three"),
        Row(doc_id=2, text=shared + " other four five six"),
        Row(doc_id=3, text="totally different words here indeed"),
    ]
    out = {
        r.doc_id: r
        for r in text.boilerplate_chunks(
            spark.createDataFrame(rows), size=4, min_docs=2
        ).collect()
    }
    # docs 1/2: chunk0 = shared 4 words (flagged), chunk1 unique
    assert out[1].n_chunks == 2 and out[1].n_boiler == 1
    assert out[1].boiler_frac == 0.5
    assert out[3].n_boiler == 0 and out[3].boiler_frac == 0.0


def test_boilerplate_within_doc_repeat_not_flagged(spark):
    # the same chunk twice in ONE doc is repetition, not boilerplate
    # (min_docs counts DISTINCT docs)
    rows = [Row(doc_id=1, text="a b a b"), Row(doc_id=2, text="c d e f")]
    out = {
        r.doc_id: r
        for r in text.boilerplate_chunks(
            spark.createDataFrame(rows), size=2, min_docs=2
        ).collect()
    }
    assert out[1].n_boiler == 0


# --- pmi_pairs ---


def test_pmi_collocated_vs_independent(spark):
    # x and y always together (4 docs); z alone in 4 other docs
    rows = [Row(doc_id=i, text="x y") for i in range(4)]
    rows += [Row(doc_id=10 + i, text="z w") for i in range(4)]
    out = {
        (r.ta, r.tb): r
        for r in text.pmi_pairs(spark.createDataFrame(rows), min_pair_docs=1).collect()
    }
    # P(x,y)=4/8, P(x)=P(y)=4/8 -> pmi = ln(0.5/0.25) = ln 2
    assert out[("x", "y")].pair_docs == 4
    assert out[("x", "y")].pmi == round(math.log(2), 6)
    assert ("x", "z") not in out  # never co-occur


def test_pmi_min_support_filters(spark):
    rows = [Row(doc_id=1, text="a b"), Row(doc_id=2, text="a c")]
    out = text.pmi_pairs(spark.createDataFrame(rows), min_pair_docs=2).collect()
    assert out == []


def test_pmi_duplicate_terms_count_once_per_doc(spark):
    rows = [Row(doc_id=1, text="a a b b"), Row(doc_id=2, text="a b")]
    out = text.pmi_pairs(spark.createDataFrame(rows), min_pair_docs=1).collect()
    assert len(out) == 1
    r = out[0]
    # df_a = df_b = pair = N = 2 -> pmi = ln(2*2/(2*2)) = 0
    assert r.pair_docs == 2 and r.pmi == 0.0


# --- distribution_drift ---


def test_psi_zero_for_identical_halves(spark):
    rows = []
    for h, t0 in ((1, 0), (2, 12)):
        for i in range(10):
            rows.append(Row(event_type="a", value=float(i), ts=_t(t0, i)))
    out = profiling.distribution_drift(
        spark.createDataFrame(rows), bins=5
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_first == 10 and r.n_second == 10
    assert r.psi == 0.0


def test_psi_positive_when_distribution_moves(spark):
    rows = [Row(event_type="a", value=0.0, ts=_t(0, i)) for i in range(10)]
    rows += [Row(event_type="a", value=100.0, ts=_t(12, i)) for i in range(10)]
    out = profiling.distribution_drift(spark.createDataFrame(rows), bins=5).collect()
    assert out[0].psi > 1.0  # total mass shift -> large PSI


def test_psi_groups_isolated(spark):
    rows = [Row(event_type="stable", value=float(i % 5), ts=_t(h, i)) for h in (0, 12) for i in range(10)]
    rows += [Row(event_type="moved", value=(0.0 if h == 0 else 4.0), ts=_t(h, i)) for h in (0, 12) for i in range(10)]
    out = {
        r.name: r
        for r in profiling.distribution_drift(
            spark.createDataFrame(rows), bins=5
        ).collect()
    }
    assert out["stable"].psi < 0.05
    assert out["moved"].psi > out["stable"].psi


# --- language_metrics / conversion_latency / revenue_pareto ---


def test_language_metrics_perfect_and_confused(spark):
    from kairos_spark.operators import text as text_ops

    rows = [
        Row(doc_id=1, text="the quick and brown fox of the hill", lang="en"),
        Row(doc_id=2, text="der hund ist nicht mit das ein und", lang="de"),
        Row(doc_id=3, text="el perro es para los que una con", lang="es"),
        # labeled fr but written with English stopwords -> predicted en
        Row(doc_id=4, text="the and of to in is that for with", lang="fr"),
    ]
    out = {
        r.lang: r
        for r in text_ops.language_metrics(spark.createDataFrame(rows)).collect()
    }
    assert out["de"].precision == 1.0 and out["de"].recall == 1.0 and out["de"].f1 == 1.0
    assert out["fr"].recall == 0.0 and out["fr"].f1 == 0.0
    # en: 1 true positive, but 2 predicted en -> precision 0.5, recall 1
    assert out["en"].precision == 0.5 and out["en"].recall == 1.0


def test_conversion_latency_first_pair_semantics(spark):
    base = dt.datetime(2024, 1, 1, tzinfo=UTC)

    def ev(u, t, s):
        return Row(user_id=u, event_type=t, ts=base + dt.timedelta(seconds=s))

    rows = [
        ev(1, "signup", 0), ev(1, "purchase", 100), ev(1, "purchase", 50_000),
        ev(2, "signup", 0),                    # never converts
        ev(3, "purchase", 10), ev(3, "signup", 20), ev(3, "purchase", 80),
    ]
    r = windows.conversion_latency(spark.createDataFrame(rows)).collect()[0]
    assert r.n_started == 3 and r.n_converted == 2
    assert r.conv_rate == round(2 / 3, 6)
    # latencies: user1 -> 100 (first purchase AFTER signup), user3 -> 60
    assert r.p50_sec == 80.0  # interpolated median of [60, 100]
    assert r.mean_sec == 80.0


def test_revenue_pareto_cumulative_and_head(spark):
    from kairos_spark.operators import profiling
    from pyspark.sql import functions as SF

    fact = spark.createDataFrame(
        [Row(k=1, amt=70.0), Row(k=1, amt=10.0), Row(k=2, amt=15.0), Row(k=3, amt=5.0)]
    )
    dim = spark.createDataFrame(
        [Row(dk=1, nm="big"), Row(dk=2, nm="mid"), Row(dk=3, nm="small")]
    )
    out = sorted(
        profiling.revenue_pareto(
            fact, dim, "k", "dk", "nm", SF.col("amt"), top_share=0.8
        ).collect(),
        key=lambda r: -r.revenue,
    )
    assert [r.entity_name for r in out] == ["big", "mid", "small"]
    assert [r.revenue for r in out] == [80.0, 15.0, 5.0]
    assert [r.cum_share for r in out] == [0.8, 0.95, 1.0]
    assert [r.in_head for r in out] == [True, False, False]
