"""Unit tests for the round-4 indexing/sketch operators: word
chunking, inverted-index posting heads, count-min heavy hitters,
bloom-filter pre-join stats."""

import hashlib

from pyspark.sql import Row, functions as F

from kairos_spark.operators import joins, sketches, text


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# --- chunk_words ---


def test_chunk_words_short_doc_single_chunk(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    out = text.chunk_words(df, size=4, stride=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.chunk_idx, r.n_words) == (0, 3)
    assert r.digest == _md5("a b c")


def test_chunk_words_overlap_and_tail(spark):
    # 7 words, size 4, stride 2 -> ceil((7-4)/2)+1 = 3 chunks:
    # [w1..w4], [w3..w6], [w5..w7] (tail short)
    words = "w1 w2 w3 w4 w5 w6 w7"
    df = spark.createDataFrame([Row(doc_id=1, text=words)])
    out = sorted(
        text.chunk_words(df, size=4, stride=2).collect(), key=lambda r: r.chunk_idx
    )
    assert [r.n_words for r in out] == [4, 4, 3]
    assert out[0].digest == _md5("w1 w2 w3 w4")
    assert out[1].digest == _md5("w3 w4 w5 w6")
    assert out[2].digest == _md5("w5 w6 w7")


def test_chunk_words_exact_fit_no_extra_chunk(spark):
    # exactly size words -> 1 chunk (n <= size branch)
    df = spark.createDataFrame([Row(doc_id=1, text="a b c d")])
    out = text.chunk_words(df, size=4, stride=2).collect()
    assert len(out) == 1 and out[0].n_words == 4


def test_chunk_words_normalizes_case_and_ws(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="  A   b\tC ")])
    out = text.chunk_words(df, size=10, stride=5).collect()
    assert out[0].digest == _md5("a b c")


# --- inverted_index ---


def test_inverted_index_df_and_postings(spark):
    rows = [Row(doc_id=i, text="common " + ("rare" if i == 3 else "filler"))
            for i in range(1, 6)]
    out = {
        r.term: r
        for r in text.inverted_index(
            spark.createDataFrame(rows), min_df=1, k=3
        ).collect()
    }
    assert out["common"].doc_freq == 5
    assert out["common"].top_postings == "1,2,3"  # first 3 ascending
    assert out["rare"].doc_freq == 1 and out["rare"].top_postings == "3"
    assert out["filler"].doc_freq == 4 and out["filler"].top_postings == "1,2,4"


def test_inverted_index_min_df_filter_and_distinct(spark):
    # term repeated inside one doc counts once toward df
    rows = [Row(doc_id=1, text="dup dup dup"), Row(doc_id=2, text="dup")]
    out = text.inverted_index(spark.createDataFrame(rows), min_df=2, k=5).collect()
    assert len(out) == 1
    assert out[0].doc_freq == 2 and out[0].top_postings == "1,2"


def test_inverted_index_salted_merge_exact(spark):
    # doc ids spanning many salt groups: min-k across salts must be the
    # global ascending head, identical to the naive answer
    rows = [Row(doc_id=i, text="t") for i in (33, 2, 17, 48, 1, 16)]
    out = text.inverted_index(
        spark.createDataFrame(rows), min_df=1, k=4, n_salt=16
    ).collect()
    assert out[0].doc_freq == 6
    assert out[0].top_postings == "1,2,16,17"


# --- cms_heavy_hitters ---


def test_cms_estimate_never_undercounts(spark):
    rows = [Row(term=t) for t in ["a"] * 50 + ["b"] * 30 + ["c"] * 20 + ["d"] * 5]
    out = sketches.cms_heavy_hitters(
        spark.createDataFrame(rows), top_k=3, d=4, w=8
    ).collect()
    assert len(out) == 3  # top-3 of 4 terms
    assert {r.term for r in out} == {"a", "b", "c"}
    for r in out:
        assert r.est_n >= r.exact_n
        assert r.overcount == r.est_n - r.exact_n


def test_cms_wide_sketch_is_exact(spark):
    # w >> vocab: no collisions, estimate == exact
    rows = [Row(term=t) for t in ["x"] * 7 + ["y"] * 3]
    out = sketches.cms_heavy_hitters(
        spark.createDataFrame(rows), top_k=2, d=4, w=4096
    ).collect()
    assert all(r.overcount == 0 for r in out)
    assert {(r.term, r.exact_n) for r in out} == {("x", 7), ("y", 3)}


def test_cms_topk_tiebreak_by_term(spark):
    rows = [Row(term=t) for t in ["b", "a", "c"]]  # all count 1
    out = sketches.cms_heavy_hitters(
        spark.createDataFrame(rows), top_k=2, d=2, w=4096
    ).collect()
    assert {r.term for r in out} == {"a", "b"}


# --- bloom_filter_stats ---


def test_bloom_no_false_negatives(spark):
    build = spark.createDataFrame([Row(k=i) for i in range(50)])
    probe = spark.createDataFrame([Row(k=i) for i in range(100)])
    r = joins.bloom_filter_stats(build, probe, "k", "k", m_bits=4096, k_hashes=3).collect()[0]
    assert r.n_build == 50 and r.n_probe == 100
    assert r.n_true == 50
    # every true member MUST be a candidate (no false negatives)
    assert r.n_candidates >= r.n_true
    assert r.n_false_pos == r.n_candidates - r.n_true
    assert r.fp_rate >= 0.0


def test_bloom_tiny_filter_saturates(spark):
    # m=32 bits with 50 keys x 3 hashes: filter saturates, everything
    # becomes a candidate -> fp_rate 1.0 (how undersizing shows up)
    build = spark.createDataFrame([Row(k=i) for i in range(50)])
    probe = spark.createDataFrame([Row(k=i) for i in range(200)])
    r = joins.bloom_filter_stats(build, probe, "k", "k", m_bits=32, k_hashes=3).collect()[0]
    assert r.n_candidates == 200
    assert r.fp_rate == 1.0


def test_bloom_disjoint_sets_low_fp(spark):
    build = spark.createDataFrame([Row(k=i) for i in range(20)])
    probe = spark.createDataFrame([Row(k=i) for i in range(1000, 1100)])
    r = joins.bloom_filter_stats(build, probe, "k", "k", m_bits=16384, k_hashes=3).collect()[0]
    assert r.n_true == 0
    # 20*3 bits in 16384: fp probability ~ (60/16384)^3 ~ 5e-8
    assert r.n_candidates == 0


# --- dedup_recall_audit ---


def test_dedup_recall_finds_planted_copies(spark):
    from kairos_spark.operators import dedup as dd

    base = "the quick brown fox jumps over the lazy dog again and again "
    rows = [Row(doc_id=i, text=base + f"variant {i} " + base) for i in range(8)]
    r = dd.dedup_recall_audit(
        spark.createDataFrame(rows), id_offset=1000, mod=2, keep_frac=0.7,
        n=8, num_hashes=16, bands=8, threshold=0.2,
    ).collect()[0]
    assert r.n_truth == 4
    assert r.n_hit >= 3  # a 70% truncation keeps high jaccard; near-total recall
    assert r.recall == round(r.n_hit / 4, 6)
    assert 0.0 <= r.precision_lb <= 1.0
