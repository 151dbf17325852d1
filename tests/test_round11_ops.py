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


# ------------------------------------------------------------- knn_stability

def test_knn_stability_identical_spaces_full_overlap(spark):
    # planes == dim with an identity-like projection is not available,
    # but a RANK-PRESERVING scalar multiple is: projecting 2-d vectors
    # with the SAME hyperplanes both ways must give overlap == k for
    # every query when the projection IS the full space (planes large
    # enough to preserve 2-d geometry almost surely). Instead pin the
    # structural contract: overlaps sum to the query count and stay in
    # [0, k].
    from kairos_spark.operators import similarity
    from pyspark.sql import Row

    rows = [
        Row(vec_id=i, embedding=[float((i * 7 + j * 3) % 11) for j in range(8)])
        for i in range(24)
    ]
    d = spark.createDataFrame(rows)
    out = similarity.knn_stability(d, dim=8, planes=16, k=5, max_id=24).collect()
    assert sum(r.n_queries for r in out) == 24
    assert all(0 <= r.overlap <= 5 for r in out)


def test_knn_stability_duplicate_vectors_rank_deterministically(spark):
    # identical vectors → cosine ties everywhere; ranking must still be
    # total (id tiebreak), so every query sees the same k neighbors in
    # both spaces → overlap == k
    from kairos_spark.operators import similarity
    from pyspark.sql import Row

    d = spark.createDataFrame(
        [Row(vec_id=i, embedding=[1.0, 2.0, 3.0, 4.0]) for i in range(12)]
    )
    out = similarity.knn_stability(d, dim=4, planes=8, k=3, max_id=12).collect()
    assert len(out) == 1 and out[0].overlap == 3 and out[0].n_queries == 12


# ------------------------------------------------------------ bloom_fpr_audit

def test_bloom_fpr_saturated_filter_flags_everything(spark):
    from kairos_spark.operators import sketches
    from pyspark.sql import Row

    d = spark.createDataFrame(
        [Row(doc_id=i, text=f"doc number {i}") for i in range(64)]
    )
    # m=4 bits, j=2: with 64 digests every bit is set many times over →
    # every digest FP-prone
    (r,) = sketches.bloom_fpr_audit(d, m=4, j=2).collect()
    assert r.n_digests == 64 and r.fp_prone == 64 and r.fp_rate == 1.0
    assert r.n_set_bits <= 4 and r.load_frac == r.n_set_bits / 4


def test_bloom_fpr_huge_filter_flags_nothing(spark):
    from kairos_spark.operators import sketches
    from pyspark.sql import Row

    d = spark.createDataFrame(
        [Row(doc_id=i, text=f"unique text {i}") for i in range(5)]
    )
    (r,) = sketches.bloom_fpr_audit(d, m=1 << 20, j=3).collect()
    assert r.n_digests == 5 and r.fp_prone == 0 and r.fp_rate == 0.0


def test_bloom_fpr_duplicate_texts_collapse(spark):
    from kairos_spark.operators import sketches
    from pyspark.sql import Row

    d = spark.createDataFrame(
        [Row(doc_id=i, text="same payload") for i in range(10)]
    )
    (r,) = sketches.bloom_fpr_audit(d, m=64, j=3).collect()
    assert r.n_digests == 1 and r.fp_prone == 0


# -------------------------------------------------------- cross_shard_novelty

def test_cross_shard_novelty_stale_and_local_dups(spark):
    from pyspark.sql import Row

    rows = (
        [Row(doc_id=i, text=f"novel {i}") for i in range(4)]
        # shard 1: two docs re-serving shard 0 content, one novel,
        # one WITHIN-shard dup pair (not stale)
        + [
            Row(doc_id=10, text="novel 0"),
            Row(doc_id=11, text="novel 1"),
            Row(doc_id=12, text="fresh a"),
            Row(doc_id=13, text="local dup"),
            Row(doc_id=14, text="local dup"),
        ]
    )
    d = spark.createDataFrame(rows)
    out = {r.shard: r for r in dedup.cross_shard_novelty(d, shard_size=10).collect()}
    s0, s1 = out[0], out[1]
    assert s0.n_docs == 4 and s0.stale_docs == 0 and s0.novel_digests == 4
    assert s1.n_docs == 5 and s1.stale_docs == 2
    # fresh a + local dup debut here (local dup counts ONCE)
    assert s1.novel_digests == 2
    assert s1.stale_frac == 0.4


# --------------------------------------------------- near_dup_family_agreement

def test_near_dup_family_agreement_identical_docs_agree(spark):
    # exact copies are near-dups under BOTH families → both_pairs > 0,
    # agreement 1.0 when no other candidates exist
    t = "the quick brown fox jumps over the lazy dog again and again today"
    d = spark.createDataFrame(
        [Row(doc_id=1, text=t), Row(doc_id=2, text=t),
         Row(doc_id=9, text="a completely different standalone body of words here")]
    )
    (r,) = dedup.near_dup_family_agreement(d).collect()
    assert r.both_pairs >= 1 and r.agreement == 1.0
    assert r.minhash_only == 0 and r.simhash_only == 0


def test_near_dup_family_agreement_empty_sentinel(spark):
    d = spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta gamma delta epsilon zeta eta"),
         Row(doc_id=2, text="one two three four five six seven eight")]
    )
    (r,) = dedup.near_dup_family_agreement(d).collect()
    assert (r.both_pairs, r.minhash_only, r.simhash_only) == (0, 0, 0)
    assert r.agreement == -1.0


# ---------------------------------------------------------- source_containment

def test_source_containment_full_copy_scores_one(spark):
    # source b is a strict subset of source a's content → containment 1.0
    t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    t2 = "one two three four five six seven eight nine ten eleven"
    d = spark.createDataFrame(
        [Row(doc_id=1, text=t1, source="a"),
         Row(doc_id=2, text=t2, source="a"),
         Row(doc_id=3, text=t1, source="b")]
    )
    (r,) = dedup.source_containment(d, n=8).collect()
    assert (r.grp_a, r.grp_b) == ("a", "b")
    assert r.containment == 1.0 and r.size_b == r.n_shared
    assert r.size_a > r.size_b


def test_source_containment_disjoint_pairs_omitted(spark):
    d = spark.createDataFrame(
        [Row(doc_id=1, text="aaaaaaaaaaaaaaaa", source="a"),
         Row(doc_id=2, text="bbbbbbbbbbbbbbbb", source="b")]
    )
    assert dedup.source_containment(d, n=8).count() == 0


# ------------------------------------------------------------ dup_run_lengths

def test_dup_run_lengths_detects_contiguous_runs(spark):
    rows = (
        [Row(doc_id=i, text=f"unique {i}") for i in range(5)]
        + [Row(doc_id=10 + j, text="replayed batch") for j in range(4)]  # run of 4
        + [Row(doc_id=20, text="pair"), Row(doc_id=21, text="pair")]     # run of 2
        + [Row(doc_id=30, text="scattered"), Row(doc_id=40, text="unique 2")]
    )
    d = spark.createDataFrame(rows)
    out = {r.run_len: r.n_runs for r in dedup.dup_run_lengths(d).collect()}
    assert out == {4: 1, 2: 1}


def test_dup_run_lengths_same_content_nonadjacent_not_a_run(spark):
    d = spark.createDataFrame(
        [Row(doc_id=1, text="x"), Row(doc_id=2, text="gap"),
         Row(doc_id=3, text="x")]
    )
    assert dedup.dup_run_lengths(d).count() == 0


def test_dup_run_lengths_shard_boundary_splits(spark):
    # a run straddling the shard edge counts as two runs (documented)
    d = spark.createDataFrame(
        [Row(doc_id=998, text="s"), Row(doc_id=999, text="s"),
         Row(doc_id=1000, text="s"), Row(doc_id=1001, text="s")]
    )
    out = {r.run_len: r.n_runs for r in dedup.dup_run_lengths(d, shard_size=1000).collect()}
    assert out == {2: 2}
