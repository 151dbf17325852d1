"""Round-11 training-data operators: char-grain repetition (Gopher
rep-10), URL-grain dedup (RefinedWeb), fused per-doc disposition
(Dolma)."""

from __future__ import annotations

from pyspark.sql import Row

from kairos_spark.operators import dedup, text


# ------------------------------------------------------------- char_rep_rate

def test_char_rep_rate_repeated_block(spark):
    # stride=10, k=10 → non-overlapping windows; "abcdefghij" * 4 gives
    # 4 identical grams → all 4 positions duplicated
    d = spark.createDataFrame(
        [
            Row(doc_id=1, text="abcdefghij" * 4, source="s1"),
            Row(doc_id=2, text="0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcd", source="s2"),
        ]
    )
    out = {r.grp: r for r in text.char_rep_rate(d, k=10, stride=10).collect()}
    assert out["s1"].n_grams == 4 and out["s1"].dup_grams == 4
    assert out["s1"].rep_rate == 1.0
    assert out["s2"].n_grams == 4 and out["s2"].dup_grams == 0
    assert out["s2"].rep_rate == 0.0


def test_char_rep_rate_short_doc_sentinel(spark):
    d = spark.createDataFrame(
        [Row(doc_id=1, text="tiny", source="s1")]
    )
    (r,) = text.char_rep_rate(d, k=10, stride=4).collect()
    assert r.n_docs == 0 and r.n_grams == 0 and r.rep_rate == -1.0


def test_char_rep_rate_within_doc_only(spark):
    # the SAME gram in two different docs is NOT a repetition (Gopher's
    # rule is per-document)
    t = "zzzzzzzzzz" + "unique tail one"
    u = "zzzzzzzzzz" + "other ending two"
    d = spark.createDataFrame(
        [Row(doc_id=1, text=t, source="s"), Row(doc_id=2, text=u, source="s")]
    )
    (r,) = text.char_rep_rate(d, k=10, stride=10).collect()
    assert r.dup_grams == 0


# ----------------------------------------------------------------- url_dedup

def test_url_dedup_normalization_collapses_variants(spark):
    d = spark.createDataFrame(
        [
            Row(doc_id=1, text="x https://Example.com/page y", source="a"),
            Row(doc_id=2, text="x http://example.com/page/ y", source="a"),
            Row(doc_id=3, text="no links here", source="a"),
            Row(doc_id=4, text="z https://other.org/q", source="b"),
        ]
    )
    out = {r.grp: r for r in dedup.url_dedup(d).collect()}
    a = out["a"]
    # scheme/case/trailing-slash variants normalize to ONE url:
    # doc 1 keeps, doc 2 drops
    assert a.n_docs == 3 and a.url_docs == 2 and a.uniq_urls == 1
    assert a.dup_docs == 1
    assert a.dup_frac == 0.333333
    b = out["b"]
    assert b.url_docs == 1 and b.dup_docs == 0 and b.dup_frac == 0.0


def test_url_dedup_first_url_is_canonical(spark):
    # only the FIRST extracted url counts as the doc's canonical url
    d = spark.createDataFrame(
        [
            Row(doc_id=1, text="https://a.com/1 then https://b.com/2", source="s"),
            Row(doc_id=2, text="https://b.com/2 alone", source="s"),
        ]
    )
    (r,) = dedup.url_dedup(d).collect()
    assert r.uniq_urls == 2 and r.dup_docs == 0


def test_url_dedup_cross_source_keeper(spark):
    # the keep rule is GLOBAL min-id: the later source's copy drops
    d = spark.createDataFrame(
        [
            Row(doc_id=1, text="https://x.io/p", source="a"),
            Row(doc_id=9, text="https://x.io/p", source="b"),
        ]
    )
    out = {r.grp: r for r in dedup.url_dedup(d).collect()}
    assert out["a"].dup_docs == 0 and out["b"].dup_docs == 1


# ----------------------------------------------------------- doc_disposition

def _disp_docs(spark):
    good = (
        "the quick brown fox jumps over the lazy dog and that is fine "
        "for with to of in is that the and " * 12
    )
    return spark.createDataFrame(
        [
            Row(doc_id=1, text=good, source="s"),          # keep (keeper)
            Row(doc_id=2, text=good, source="s"),          # dup of 1
            Row(doc_id=3, text="$$$ !!! ###", source="s"),  # low quality
            Row(
                doc_id=4,
                text=good + " All Rights Reserved.",
                source="s",
            ),                                              # blocked
        ]
    )


def test_doc_disposition_priority_and_counts(spark):
    out = {
        r.disposition: r
        for r in dedup.doc_disposition(_disp_docs(spark)).collect()
    }
    assert out["dup"].n_docs == 1
    assert out["low_quality"].n_docs == 1
    assert out["blocked"].n_docs == 1
    assert out["keep"].n_docs == 1
    assert out["keep"].frac == 0.25


def test_doc_disposition_dup_beats_blocked(spark):
    blocked_text = "short Privacy Policy note"
    d = spark.createDataFrame(
        [
            Row(doc_id=1, text=blocked_text, source="s"),
            Row(doc_id=2, text=blocked_text, source="s"),
        ]
    )
    out = {
        r.disposition: r.n_docs
        for r in dedup.doc_disposition(d).collect()
    }
    # doc 2 is an exact dup AND blocked AND low-quality: dup wins
    assert out["dup"] == 1 and "keep" not in out
