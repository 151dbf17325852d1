"""Round-13 training-data operators: vocab-size OOV sweep, chained BPE
merges, license/opt-out signal audit, UniMax epoch-capped language
budget allocation, product-quantization recall, crawl-dump overlap
matrix, and SimHash hamming-radius sweep."""

from __future__ import annotations

from pyspark.sql import Row

from kairos_spark.operators import text


# ---------------------------------------------------------- vocab_size_sweep

def test_vocab_size_sweep_nested_cuts_monotone(spark):
    # 5 distinct tokens with distinct counts; cuts at 1/3/5
    rows = [Row(doc_id=i, text=t) for i, t in enumerate(
        ["aa aa aa aa aa", "bb bb bb bb", "cc cc cc", "dd dd", "ee"]
    )]
    d = spark.createDataFrame(rows)
    out = {r.vocab_size: r for r in
           text.vocab_size_sweep(d, sizes=(1, 3, 5)).collect()}
    assert list(sorted(out)) == [1, 3, 5]
    # total instances identical at every cut (the volume counter)
    assert {r.n_tokens for r in out.values()} == {15}
    # larger vocab -> monotonically less OOV, less fallback
    assert out[1].oov_tokens > out[3].oov_tokens > out[5].oov_tokens == 0
    assert out[1].fallback_tokens > out[3].fallback_tokens
    # V=5 holds the whole vocab: no inflation
    assert out[5].fallback_tokens == 15 and out[5].inflation == 1.0
    assert out[5].vocab_types == 5
    # V=1 keeps only 'aa' (count 5): OOV = 10 instances x 2 bytes each
    assert out[1].vocab_types == 1
    assert out[1].oov_tokens == 10
    assert out[1].fallback_tokens == 5 + 10 * 2


def test_vocab_size_sweep_empty_corpus_spine(spark):
    d = spark.createDataFrame([Row(doc_id=1, text="   ")])
    out = text.vocab_size_sweep(d, sizes=(2, 4)).collect()
    assert len(out) == 2
    for r in out:
        assert r.n_tokens == 0 and r.oov_rate == 0.0 and r.inflation == 0.0


def test_vocab_size_sweep_multibyte_fallback_bytes(spark):
    # one CJK char token (3 UTF-8 bytes) OOV under a vocab holding
    # only the more frequent ascii token
    d = spark.createDataFrame(
        [Row(doc_id=1, text="xx xx 中")]
    )
    out = {r.vocab_size: r for r in
           text.vocab_size_sweep(d, sizes=(1,)).collect()}
    r = out[1]
    assert r.n_tokens == 3 and r.oov_tokens == 1
    assert r.fallback_tokens == 2 + 3  # two in-vocab + 3 bytes


# -------------------------------------------------------------- dump_overlap

def test_dump_overlap_planted_cross_dump_dups(spark):
    from kairos_spark.operators import dedup

    # block=1, 3 dumps: ids 0,3 -> dump 0; 1,4 -> dump 1; 2,5 -> dump 2.
    # texts: "a" in dumps 0 and 1; "b" only in dump 2.
    d = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "b")],
        "doc_id long, text string",
    )
    out = {(r.dump_a, r.dump_b): r for r in
           dedup.dump_overlap(d, n_dumps=3, block=1).collect()}
    assert set(out) == {(0, 1), (0, 2), (1, 2)}
    r01 = out[(0, 1)]
    assert r01.shared == 1 and r01.n_a == 2 and r01.n_b == 2
    assert r01.jaccard == round(1 / 3, 6)
    # "b" appears twice WITHIN dump 2 (ids 2 and 5): distinct first,
    # so it cannot inflate any pair
    assert out[(0, 2)].shared == 0 and out[(1, 2)].shared == 0
    assert out[(0, 2)].n_b == 1  # dump 2 holds one distinct digest


def test_dump_overlap_all_pairs_present_with_zeros(spark):
    from kairos_spark.operators import dedup

    d = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    out = dedup.dump_overlap(d, n_dumps=4, block=1).collect()
    assert len(out) == 6
    for r in out:
        assert r.shared == 0 and r.jaccard == 0.0


def test_dump_overlap_rejects_single_dump(spark):
    from kairos_spark.operators import dedup
    import pytest

    d = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dedup.dump_overlap(d, n_dumps=1)


# ------------------------------------------------------------- license_audit

def test_license_audit_panel_detection(spark):
    d = spark.createDataFrame(
        [
            (1, "s", "code here\nSPDX-License-Identifier: Apache-2.0"),
            (2, "s", "Copyright 2020 Acme. All rights reserved."),
            (3, "s", "released into the PUBLIC DOMAIN for all"),
            (4, "s", "robots: noai; please Do Not Train on this"),
            (5, "s", "plain text with none of the signals"),
        ],
        "doc_id long, source string, text string",
    )
    r = text.license_audit(d).collect()[0]
    assert r.n_docs == 5
    assert r.n_spdx == 1
    assert r.n_copyright == 1
    assert r.n_permissive == 1  # public domain (case-insensitive)
    assert r.n_restrictive == 1  # all rights reserved
    assert r.n_optout == 1
    assert r.restrictive_share == 0.2 and r.optout_share == 0.2


def test_license_audit_multi_signal_doc_counts_once_per_signal(spark):
    d = spark.createDataFrame(
        [(1, "s", "MIT License. Copyright X. All rights reserved. noai")],
        "doc_id long, source string, text string",
    )
    r = text.license_audit(d).collect()[0]
    assert (r.n_permissive, r.n_copyright, r.n_restrictive, r.n_optout) == (
        1, 1, 1, 1,
    )


# -------------------------------------------------------------- unimax_alloc

def test_unimax_alloc_waterfilling_exact(spark):
    from kairos_spark.operators import sampling

    # langs with 2/4/10 tokens; budget = 2*16 = 32; caps = 3x avail.
    # sorted by cap: a(6), b(12), c(30).
    #   a: 6*3 = 18 <= 32           -> capped, alloc 6
    #   b: 12*2 = 24 <= 32 - 6 = 26 -> capped, alloc 12
    #   c: 30*1 = 30 >  26 - 12 = 14 -> uncapped, alloc 14
    d = spark.createDataFrame(
        [(1, "a", "x y"), (2, "b", "x y z w"),
         (3, "c", "a b c d e f g h i j")],
        "doc_id long, lang string, text string",
    )
    out = {r.grp: r for r in
           sampling.unimax_alloc(d, max_epochs=3, budget_factor=2).collect()}
    assert out["a"].capped == 1 and out["a"].alloc_tokens == 6
    assert out["b"].capped == 1 and out["b"].alloc_tokens == 12
    assert out["c"].capped == 0 and out["c"].alloc_tokens == 14
    # allocations sum exactly to B
    assert sum(r.alloc_tokens for r in out.values()) == 32
    assert out["a"].epochs == 3.0
    assert out["c"].epochs == 1.4


def test_unimax_alloc_remainder_distribution(spark):
    from kairos_spark.operators import sampling

    # 3 equal langs of 3 tokens, budget 1x total = 9 < caps: nobody
    # caps; base = 3, rem = 0 -> 3/3/3
    d = spark.createDataFrame(
        [(1, "a", "x y z"), (2, "b", "x y z"), (3, "c", "x y z"),
         (4, "d", "x")],
        "doc_id long, lang string, text string",
    )
    out = {r.grp: r for r in
           sampling.unimax_alloc(d, max_epochs=2, budget_factor=1).collect()}
    # B = 10, caps: d=2 (capped: 2*4=8<=10), a/b/c base=(10-2)/3=2 rem 2
    # -> a,b get 3; c gets 2
    assert out["d"].alloc_tokens == 2 and out["d"].capped == 1
    assert out["a"].alloc_tokens == 3 and out["b"].alloc_tokens == 3
    assert out["c"].alloc_tokens == 2
    assert sum(r.alloc_tokens for r in out.values()) == 10


def test_unimax_alloc_all_capped_leaves_budget(spark):
    from kairos_spark.operators import sampling

    # budget 4x total but caps at 2 epochs: everyone caps, allocation
    # = caps, leftover budget legitimately unassigned (k=0 guard)
    d = spark.createDataFrame(
        [(1, "a", "x y"), (2, "b", "p q")],
        "doc_id long, lang string, text string",
    )
    out = {r.grp: r for r in
           sampling.unimax_alloc(d, max_epochs=2, budget_factor=4).collect()}
    assert all(r.capped == 1 for r in out.values())
    assert all(r.alloc_tokens == r.cap_tokens for r in out.values())
    assert all(r.epochs == 2.0 for r in out.values())


# ------------------------------------------------------- simhash_radius_sweep

def test_simhash_radius_sweep_identical_docs_radius_zero(spark):
    from kairos_spark.operators import dedup

    t = "the quick brown fox jumps over the lazy dog"
    u = "completely different words entirely unrelated content here!"
    d = spark.createDataFrame(
        [(1, t), (2, t), (3, u)], "doc_id long, text string"
    )
    out = {r.radius: r for r in
           dedup.simhash_radius_sweep(d, max_hamming=3, blocks=4).collect()}
    assert sorted(out) == [0, 1, 2, 3]
    # the identical pair sits at radius 0
    assert out[0].n_pairs == 1
    # cumulative is monotone and ends >= n at every radius
    cums = [out[r].cum_pairs for r in sorted(out)]
    assert cums == sorted(cums)
    assert out[3].cum_pairs == sum(out[r].n_pairs for r in out)


def test_simhash_radius_sweep_guards(spark):
    from kairos_spark.operators import dedup
    import pytest

    d = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dedup.simhash_radius_sweep(d, max_hamming=4, blocks=4)
    with pytest.raises(ValueError):
        dedup.simhash_radius_sweep(d, max_hamming=3, bits=60, blocks=7)


# ------------------------------------------------------------------ pq_recall

def _unit_vecs(spark, rows, dim=8):
    return spark.createDataFrame(rows, f"vec_id long, embedding array<double>")


def test_pq_recall_perfect_when_corpus_is_codebook(spark):
    from kairos_spark.operators import similarity

    # corpus = 4 one-hot-ish vectors; codebook = those same 4 vectors
    # (n_codes=4 lowest ids = whole corpus) -> reconstruction is exact
    # in every subspace -> recall 1.0 at every m
    import itertools
    rows = []
    for i in range(4):
        v = [0.0] * 8
        v[i] = 1.0
        v[i + 4] = 1.0
        rows.append((i, v))
    corpus = _unit_vecs(spark, rows)
    qs = corpus.selectExpr("vec_id as q_id", "embedding")
    out = similarity.pq_recall(
        qs, corpus, k=2, m_list=(1, 2), n_codes=4, dim=8
    ).collect()
    assert {r.m_subspaces for r in out} == {1, 2}
    for r in out:
        assert r.recall == 1.0 and r.n_hits == r.n_exact
        assert r.n_queries == 4 and r.n_exact == 8  # k=2 each


def test_pq_recall_code_bits_and_guard(spark):
    from kairos_spark.operators import similarity
    import pytest

    rows = [(i, [float(i), 1.0, 0.5, 2.0]) for i in range(4)]
    corpus = _unit_vecs(spark, rows, 4)
    qs = corpus.selectExpr("vec_id as q_id", "embedding")
    out = {r.m_subspaces: r for r in similarity.pq_recall(
        qs, corpus, k=1, m_list=(2,), n_codes=4, dim=4).collect()}
    assert out[2].code_bits == 2 * 2  # log2(4) bits per subspace
    with pytest.raises(ValueError):
        similarity.pq_recall(qs, corpus, m_list=(3,), dim=4)


# ------------------------------------------------------------ bpe_merge_chain

def test_bpe_merge_chain_recounts_after_merge(spark):
    # vocabulary: "abab" x3. step 1 pairs: (a,b)x2, (b,a)x1 per word
    # -> merge (a,b). After re-encoding the word is [ab][ab], so step
    # 2's winning pair MUST be (ab, ab) — the signature that pair
    # counts really re-run on merged symbols, not on raw chars.
    d = spark.createDataFrame(
        [(1, "abab abab"), (2, "abab")], "doc_id long, text string"
    )
    rows = text.bpe_merge_chain(d, iters=2).collect()
    assert [(r.step, r.left_sym, r.right_sym, r.merged) for r in rows] == [
        (1, "a", "b", "ab"),
        (2, "ab", "ab", "abab"),
    ]
    assert rows[0].pair_count == 6  # 2 per word x 3 words
    assert rows[1].pair_count == 3


def test_bpe_merge_chain_overlap_left_to_right(spark):
    # "aaa": step 1 merge (a,a) counts 2 per word but merges
    # left-to-right non-overlapping -> [aa][a]
    d = spark.createDataFrame([(1, "aaa")], "doc_id long, text string")
    rows = text.bpe_merge_chain(d, iters=2).collect()
    assert (rows[0].left_sym, rows[0].right_sym) == ("a", "a")
    # step 2 then merges [aa][a]
    assert (rows[1].left_sym, rows[1].right_sym, rows[1].merged) == (
        "aa", "a", "aaa",
    )


def test_bpe_merge_chain_stops_when_dry(spark):
    # single-char words only: no pairs at all -> empty trace
    d = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert text.bpe_merge_chain(d, iters=3).count() == 0


def test_bpe_chain_first_pairs_matches_loop_step1(spark):
    d = spark.createDataFrame(
        [(1, "abab abab"), (2, "abab")], "doc_id long, text string"
    )
    first = text.bpe_chain_first_pairs(d).collect()[0]
    loop = text.bpe_merge_chain(d, iters=1).collect()[0]
    assert (first.a, first.b, first.pair_count) == (
        loop.left_sym, loop.right_sym, loop.pair_count,
    )


# --------------------------------------------------------- temperature_sweep

def test_temperature_sweep_alpha_extremes(spark):
    from kairos_spark.operators import sampling

    d = spark.createDataFrame(
        [(i, "big" if i < 90 else "small") for i in range(100)],
        "doc_id long, lang string",
    )
    out = {(r.alpha_pct, r.name): r for r in sampling.temperature_sweep(
        d, group_col="lang", alpha_pcts=(0, 100), budget=10).collect()}
    # alpha=0: uniform split regardless of supply
    assert out[(0, "big")].target_n == 5 and out[(0, "small")].target_n == 5
    # alpha=1: natural proportions
    assert out[(100, "big")].target_n == 9 and out[(100, "small")].target_n == 1
    # targets sum to budget at every alpha
    for pct in (0, 100):
        assert sum(r.target_n for (a, _), r in out.items() if a == pct) == 10
    # feasible clips at supply
    assert out[(0, "small")].feasible_n == 5  # 10 available >= 5


def test_temperature_sweep_rejects_pow_alphas(spark):
    from kairos_spark.operators import sampling
    import pytest

    d = spark.createDataFrame([(1, "x")], "doc_id long, lang string")
    with pytest.raises(ValueError):
        sampling.temperature_sweep(d, alpha_pcts=(30,))


# ------------------------------------------------- contamination_ngram_sweep

def test_contamination_ngram_sweep_knee(spark):
    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),   # verbatim: hits every n
            (1, "alpha beta unrelated x"),   # shares the 2-gram only
            (2, "nothing in common here"),
        ],
        "doc_id long, text string",
    )
    out = {r.ngram_n: r for r in
           text.contamination_ngram_sweep(docs, bench, ns=(2, 4)).collect()}
    assert out[2].n_docs == 3 and out[4].n_docs == 3
    assert out[2].contaminated_docs == 2   # docs 0 and 1
    assert out[4].contaminated_docs == 1   # only the verbatim copy
    # monotone: longer n can only flag fewer docs
    assert out[4].contaminated_docs <= out[2].contaminated_docs
    assert out[2].contaminated_share == round(2 / 3, 6)


def test_contamination_ngram_sweep_zero_rows_kept(spark):
    bench = spark.createDataFrame([(0, "zzz qqq www")], "doc_id long, text string")
    docs = spark.createDataFrame([(1, "aaa bbb ccc")], "doc_id long, text string")
    out = {r.ngram_n: r for r in
           text.contamination_ngram_sweep(docs, bench, ns=(2, 3)).collect()}
    assert set(out) == {2, 3}
    for r in out.values():
        assert r.contaminated_docs == 0 and r.contaminated_share == 0.0


# ------------------------------------------------------------ prototypicality

def test_prototypicality_profile_shape(spark):
    from kairos_spark.operators import similarity

    # 10 vectors, k=2: per cluster the profile must satisfy
    # min <= p20 <= max and mean within [min, max]; n_vecs sums to 10
    rows = [(i, [float((i * 7 + j * 3) % 5), float(i % 3), 1.0, 0.0])
            for i in range(10) for j in [0]]
    d = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.prototypicality(d, k=2, iters=1).collect()
    assert sum(r.n_vecs for r in out) == 10
    for r in out:
        assert r.min_dist <= r.p20_dist <= r.max_dist
        assert r.min_dist <= r.mean_dist <= r.max_dist


def test_prototypicality_identical_vectors_zero_distances(spark):
    from kairos_spark.operators import similarity

    d = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    out = similarity.prototypicality(d, k=1, iters=1).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_vecs == 6
    assert r.mean_dist == 0.0 and r.min_dist == 0.0 and r.max_dist == 0.0


# ----------------------------------------------------------- minhash_len_bias

def test_minhash_len_bias_identical_docs_zero_error(spark):
    from kairos_spark.operators import dedup

    # two identical docs: exact J = 1 and every hash agrees -> error 0;
    # the pair lands in a bin determined by its shingle count
    t = "the quick brown fox jumps over the lazy dog again and again"
    d = spark.createDataFrame(
        [(1, t), (2, t)], "doc_id long, text string"
    )
    out = dedup.minhash_len_bias(d, bucket_width=8, max_bucket=7).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_pairs == 1
    assert r.mae == 0.0 and r.bias == 0.0 and r.max_abs_err == 0.0


def test_minhash_len_bias_bin_assignment_min_side(spark):
    from kairos_spark.operators import dedup

    # one short doc (few shingles) paired with one long doc: the bin
    # must come from the SHORT side (min shingle count)
    short = "tiny text"                      # ~2 shingles
    long_ = "x" * 300
    d = spark.createDataFrame(
        [(1, short), (2, long_)], "doc_id long, text string"
    )
    out = dedup.minhash_len_bias(d, bucket_width=8, max_bucket=7).collect()
    assert len(out) == 1 and out[0].len_bin == 0  # min side < 8 shingles


# ------------------------------------------------------------- lsh_br_planner

def test_lsh_br_planner_extreme_jaccards_exact(spark):
    """J=1 pair → P(candidate)=1 under every config (fn_mass 0);
    J=0 pairs → P=0 (fp_mass 0); miss_mass 0 everywhere."""
    from kairos_spark.operators import dedup

    t = "the quick brown fox jumps over the lazy dog"
    u = "completely different words entirely unrelated content here!"
    d = spark.createDataFrame(
        [(1, t), (2, t), (3, u)], "doc_id long, text string"
    )
    out = {(r.bands, r.rows_per_band): r for r in dedup.lsh_br_planner(
        d, threshold_pct=50).collect()}
    assert sorted(out) == [(4, 8), (8, 4), (16, 2), (32, 1)]
    for r in out.values():
        assert r.n_pos == 1 and r.n_neg == 2
        assert r.fp_mass == 0.0 and r.fn_mass == 0.0 and r.miss_mass == 0.0


def test_lsh_br_planner_t_star_values(spark):
    """t* = (1/b)^(1/r) quantized half-up at 1e-6 — the sqrt chain."""
    from kairos_spark.operators import dedup

    d = spark.createDataFrame([(1, "ab"), (2, "abc")], "doc_id long, text string")
    got = {(r.bands, r.rows_per_band): r.t_star
           for r in dedup.lsh_br_planner(d).collect()}
    assert got[(32, 1)] == 0.03125
    assert got[(16, 2)] == 0.25
    assert got[(8, 4)] == 0.594604
    assert got[(4, 8)] == 0.840896


def test_lsh_br_planner_dyadic_midcurve_and_no_neg_sentinel(spark):
    """One pair at exactly J=1/2 with 2-char shingles: under (2,2) the
    curve value is the dyadic 1−(1−0.25)² = 0.4375 EXACTLY; with no
    negative pairs in the sample fp_mass takes the 0.0 sentinel."""
    from kairos_spark.operators import dedup

    d = spark.createDataFrame([(1, "ab"), (2, "abc")], "doc_id long, text string")
    out = {(r.bands, r.rows_per_band): r for r in dedup.lsh_br_planner(
        d, n=2, num_hashes=4, configs=((4, 1), (2, 2), (1, 4)),
        threshold_pct=50).collect()}
    r22 = out[(2, 2)]
    assert r22.n_pos == 1 and r22.n_neg == 0
    assert r22.fp_mass == 0.0  # sentinel: no negatives exist
    assert r22.fn_mass == 0.5625 and r22.miss_mass == 0.5625
    # b=1 → the chain is a single band of 4 rows: p = J^4 = 0.0625
    r14 = out[(1, 4)]
    assert r14.t_star == 1.0
    assert r14.fn_mass == 0.9375


def test_lsh_br_planner_guards(spark):
    from kairos_spark.operators import dedup
    import pytest

    d = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dedup.lsh_br_planner(d, num_hashes=32, configs=((8, 3),))
    with pytest.raises(ValueError):
        dedup.lsh_br_planner(d, num_hashes=36, configs=((6, 6),))
    with pytest.raises(ValueError):
        dedup.lsh_br_planner(d, threshold_pct=0)
    with pytest.raises(ValueError):
        dedup.lsh_br_planner(d, threshold_pct=100)


# --------------------------------------------------------- readability_scores

def test_readability_known_text_exact(spark):
    """Hand-computed panel: 'the cat sat. the dog ran!' → W=6, S=2,
    Y=6 vowel runs, C=18 alnum chars; every score is the exact
    rational of those counts."""
    from kairos_spark.operators import text as T

    d = spark.createDataFrame(
        [(1, "the cat sat. the dog ran!", "s1")],
        "doc_id long, text string, source string",
    )
    r = T.readability_scores(d).collect()[0]
    assert (r.words, r.sentences, r.syll_runs, r.alnum_chars) == (6, 2, 6, 18)
    assert r.wps == 3.0 and r.spw == 1.0
    # flesch = 206.835 - 1.015*3 - 84.6*1 = 119.19
    assert r.flesch_re == 119.19
    # fk = 0.39*3 + 11.8*1 - 15.59 = -2.62 (negative branch exercised)
    assert r.fk_grade == -2.62
    # ari = 4.71*(18/6) + 0.5*3 - 21.43 = -5.8
    assert r.ari == -5.8


def test_readability_clamps_and_drops(spark):
    """Terminator-free doc counts as ONE sentence; a zero-word doc is
    dropped from scoring (n_docs counts only what was scored)."""
    from kairos_spark.operators import text as T

    d = spark.createDataFrame(
        [(1, "no terminator here", "s"), (2, "   ", "s"), (3, "", "s")],
        "doc_id long, text string, source string",
    )
    r = T.readability_scores(d).collect()[0]
    assert r.n_docs == 1 and r.sentences == 1 and r.words == 3


def test_readability_digit_only_words_zero_syllables(spark):
    from kairos_spark.operators import text as T

    d = spark.createDataFrame(
        [(1, "1234 5678", "s")], "doc_id long, text string, source string"
    )
    r = T.readability_scores(d).collect()[0]
    assert r.syll_runs == 0 and r.words == 2 and r.alnum_chars == 8


# ----------------------------------------------------------- kcenter_coreset

def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kcenter_hand_trace(spark):
    """4 planar points: seed id1 (0,0); farthest (0,4) d=16; then
    (3,0) d=9; sentinel carries the remaining point's dmin=2."""
    from kairos_spark.operators import similarity as S

    d = _vecs(spark, [(1, [0.0, 0.0]), (2, [3.0, 0.0]),
                      (3, [0.0, 4.0]), (4, [1.0, 1.0])])
    got = [(r.step, r.vec_id, r.radius)
           for r in S.kcenter_coreset(d, k=3).collect()]
    assert got == [(1, 1, 0.0), (2, 3, 16.0), (3, 2, 9.0), (4, -1, 2.0)]


def test_kcenter_exhaustion_and_ties(spark):
    from kairos_spark.operators import similarity as S

    # fewer vectors than k: trace ends early, sentinel radius 0.0
    d = _vecs(spark, [(7, [1.0]), (9, [5.0])])
    got = [(r.step, r.vec_id, r.radius)
           for r in S.kcenter_coreset(d, k=5).collect()]
    assert got == [(1, 7, 0.0), (2, 9, 16.0), (3, -1, 0.0)]
    # identical vectors: zero radii, id-ascending picks
    d2 = _vecs(spark, [(3, [2.0]), (1, [2.0]), (2, [2.0])])
    got2 = [(r.step, r.vec_id, r.radius)
            for r in S.kcenter_coreset(d2, k=3).collect()]
    assert got2 == [(1, 1, 0.0), (2, 2, 0.0), (3, 3, 0.0), (4, -1, 0.0)]


def test_kcenter_empty_frame(spark):
    from kairos_spark.operators import similarity as S

    d = _vecs(spark, [])
    assert S.kcenter_coreset(d, k=4).count() == 0


# --------------------------------------------------------------- hits_scores

def test_hits_single_edge_polarizes(spark):
    """a->b: after one alternation authority concentrates on b and
    hub on a — and it is already the fixed point."""
    from kairos_spark.operators import graph as G

    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    got = {r.node: r for r in G.hits_scores(e, iters=2).collect()}
    assert got["a"].authority == 0.0 and got["a"].hub == 1.0
    assert got["b"].authority == 1.0 and got["b"].hub == 0.0


def test_hits_chain_values(spark):
    """a->b->c, 1 iteration by hand: auth (0, 1/2, 1/2),
    hub (1/2, 1/2, 0)."""
    from kairos_spark.operators import graph as G

    e = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    got = {r.node: r for r in G.hits_scores(e, iters=1).collect()}
    assert got["a"].authority == 0.0 and got["c"].hub == 0.0
    assert got["b"].authority == 0.5 and got["c"].authority == 0.5
    assert got["a"].hub == 0.5 and got["b"].hub == 0.5


def test_hits_weights_shift_mass(spark):
    """Same topology, heavier edge wins more authority."""
    from kairos_spark.operators import graph as G

    e = spark.createDataFrame(
        [("a", "b", 3), ("a", "c", 1)], "src string, dst string, w long"
    )
    got = {r.node: r for r in G.hits_scores(e, "src", "dst", "w", iters=2).collect()}
    assert got["b"].authority > got["c"].authority > 0.0
    assert got["a"].hub == 1.0


def test_hits_empty_edges(spark):
    from kairos_spark.operators import graph as G

    e = spark.createDataFrame([], "src string, dst string")
    assert G.hits_scores(e, iters=2).count() == 0


# ------------------------------------------------------------ mattr_diversity

def test_mattr_hand_segments(spark):
    """10 tokens at seg_len=4: two complete segments (distinct 4 and
    2), ragged tail dropped; ttr over ALL 10 tokens."""
    from kairos_spark.operators import text as T

    d = spark.createDataFrame(
        [(1, "a b c d x x x x y z", "s")],
        "doc_id long, text string, source string",
    )
    r = T.mattr_diversity(d, seg_len=4).collect()[0]
    assert r.n_segs == 2 and r.seg_distinct_sum == 5
    assert r.msttr == 0.625  # 5 / 8
    assert r.n_tokens == 10 and r.n_types == 7 and r.ttr == 0.7


def test_mattr_short_docs_drop_from_segments_only(spark):
    """A 2-token doc adds volume to ttr but no segments; a group with
    zero complete segments vanishes from the output."""
    from kairos_spark.operators import text as T

    d = spark.createDataFrame(
        [(1, "a b c d", "big"), (2, "e f", "big"), (3, "x y", "tiny")],
        "doc_id long, text string, source string",
    )
    out = {r.group: r for r in T.mattr_diversity(d, seg_len=4).collect()}
    assert set(out) == {"big"}
    assert out["big"].n_tokens == 6 and out["big"].n_segs == 1
    assert out["big"].msttr == 1.0


def test_mattr_guard_and_empty_docs(spark):
    from kairos_spark.operators import text as T
    import pytest

    d = spark.createDataFrame(
        [(1, "  ", "s"), (2, "", "s")], "doc_id long, text string, source string"
    )
    assert T.mattr_diversity(d, seg_len=2).count() == 0
    with pytest.raises(ValueError):
        T.mattr_diversity(d, seg_len=0)


# ---------------------------------------------------- data_constrained_epochs

def test_epochs_no_repetition_branch_exact(spark):
    """mult=1 with one source: B = U exactly — the no-repetition
    branch gives eff == budget and value_ratio == 1.0."""
    from kairos_spark.operators import sampling as S

    d = spark.createDataFrame(
        [(1, "a b c d e", "s")], "doc_id long, text string, source string"
    )
    r = S.data_constrained_epochs(d, mults=(1,)).collect()[0]
    assert r.u_tokens == 5 and r.budget == 5
    assert r.epochs == 1.0 and r.eff_tokens == 5.0 and r.value_ratio == 1.0


def test_epochs_value_decays_with_mult(spark):
    """Muennighoff decay: value_ratio strictly falls as the budget
    multiple grows; epochs stays the exact integer ratio."""
    from kairos_spark.operators import sampling as S

    d = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(100)), "s")],
        "doc_id long, text string, source string",
    )
    out = {r.mult: r for r in S.data_constrained_epochs(d, mults=(1, 4, 16)).collect()}
    assert out[4].epochs == 4.0 and out[16].epochs == 16.0
    assert 1.0 == out[1].value_ratio > out[4].value_ratio > out[16].value_ratio > 0
    # effective tokens still grow in absolute terms (value is positive)
    assert out[16].eff_tokens > out[4].eff_tokens > out[1].eff_tokens


def test_epochs_uniform_budget_small_source_burns(spark):
    """Two sources, one 10x bigger: the uniform slice gives the small
    one many epochs and a lower value_ratio."""
    from kairos_spark.operators import sampling as S

    big = " ".join(f"w{i}" for i in range(200))
    small = " ".join(f"v{i}" for i in range(20))
    d = spark.createDataFrame(
        [(1, big, "big"), (2, small, "small"), (3, "", "empty")],
        "doc_id long, text string, source string",
    )
    out = {r.group: r for r in S.data_constrained_epochs(d, mults=(4,)).collect()}
    assert set(out) == {"big", "small"}  # empty source dropped
    assert out["small"].epochs > out["big"].epochs
    assert out["small"].value_ratio < out["big"].value_ratio


# -------------------------------------------------------------- ndcg_sessions

def test_ndcg_hand_session(spark):
    """view,click,purchase in one session: DCG = 1*d2 + 3*d3,
    IDCG = 3*d1 + 1*d2 — quantized at 1e-12 then round-6."""
    from kairos_spark.operators import windows as W
    import math

    B = 1_800_000_000_000  # anchor us
    rows = [(1, "view", B, 1), (1, "click", B + 1_000_000, 2),
            (1, "purchase", B + 2_000_000, 3)]
    d = spark.createDataFrame(
        [(u, t, us, e) for (u, t, us, e) in rows],
        "user_id long, event_type string, us long, event_id long",
    ).selectExpr("user_id", "event_type",
                 "timestamp_micros(us) AS ts", "event_id")
    out = W.ndcg_sessions(d).collect()
    assert len(out) == 1 and out[0].entry_type == "view"
    d2, d3 = W.NDCG_DISCOUNTS_10[1], W.NDCG_DISCOUNTS_10[2]
    nd = (1 * d2 + 3 * d3) / (3 * 1.0 + 1 * d2)
    q = math.floor(nd * 1e12 + 0.5)
    exp = math.floor((2_000_000 * q + 1e12) / (2 * 1e12)) / 1e6
    assert out[0].mean_ndcg == exp and out[0].n_norel == 0


def test_ndcg_norel_and_gap_split(spark):
    """Zero-grade session scores 0.0 and counts in n_norel; a >gap
    pause splits sessions (second session scores 1.0)."""
    from kairos_spark.operators import windows as W

    B = 1_800_000_000_000
    rows = [(1, "view", B, 1), (1, "error", B + 1_000_000, 2),
            (1, "purchase", B + 4_000_000_000, 3)]
    d = spark.createDataFrame(
        rows, "user_id long, event_type string, us long, event_id long"
    ).selectExpr("user_id", "event_type",
                 "timestamp_micros(us) AS ts", "event_id")
    out = {r.entry_type: r for r in W.ndcg_sessions(d, gap_sec=1800.0).collect()}
    assert out["view"].n_norel == 1 and out["view"].mean_ndcg == 0.0
    assert out["purchase"].mean_ndcg == 1.0 and out["purchase"].n_norel == 0


def test_ndcg_k_guard(spark):
    from kairos_spark.operators import windows as W
    import pytest

    d = spark.createDataFrame(
        [(1, "view", 0, 1)], "user_id long, event_type string, us long, event_id long"
    ).selectExpr("user_id", "event_type", "timestamp_micros(us) AS ts", "event_id")
    with pytest.raises(ValueError):
        W.ndcg_sessions(d, k=5)


# ------------------------------------------------------ value_precision_audit

def test_value_precision_hand_panel(spark):
    """6 values incl. a negative: 2 whole-unit, 3 dime-grid, 1 charm
    .99; negative cents take the pmod path (-3.50 -> digit 0)."""
    from kairos_spark.operators import profiling as P

    d = spark.createDataFrame(
        [(1, "a", 2.00), (2, "a", 5.00), (3, "a", -3.50),
         (4, "a", 1.99), (5, "a", 0.07), (6, "a", 0.13)],
        "event_id long, event_type string, value double",
    )
    r = P.value_precision_audit(d).collect()[0]
    assert r.n == 6
    assert r.share_int == 0.333333      # 2/6
    assert r.share_dime == 0.5          # 2.00, 5.00, -3.50
    assert r.share_99 == 0.166667       # 1.99
    # digits: 0,0,0,9,7,3 -> modal 0 (count 3)
    assert r.top_digit == 0 and r.top_digit_share == 0.5


def test_value_precision_modal_tie_breaks_low_and_nulls_drop(spark):
    from kairos_spark.operators import profiling as P

    d = spark.createDataFrame(
        [(1, "a", 0.01), (2, "a", 0.02), (3, "a", None)],
        "event_id long, event_type string, value double",
    )
    r = P.value_precision_audit(d).collect()[0]
    assert r.n == 2 and r.top_digit == 1 and r.top_digit_share == 0.5


# ----------------------------------------------------------- good_turing_mass

def test_good_turing_hand_table(spark):
    """'a a a b b c' at unigram grain: n1=n2=n3=1, N=6 — every cell
    hand-checked, incl. the r=3 discount-to-zero (no n_4 stratum)."""
    from kairos_spark.operators import text as T

    d = spark.createDataFrame([(1, "a a a b b c")], "doc_id long, text string")
    out = {r.r: r for r in T.good_turing_mass(d, gram_n=1, max_r=5).collect()}
    assert sorted(out) == [0, 1, 2, 3]
    assert out[0].n_r == 0 and out[0].mass_share == 0.166667  # p0 = 1/6
    assert out[1].r_star == 2.0 and out[1].mass_share == 0.166667
    assert out[2].r_star == 3.0 and out[2].mass_share == 0.333333
    assert out[3].r_star == 0.0 and out[3].mass_share == 0.5


def test_good_turing_hapax_free_keeps_unseen_row(spark):
    from kairos_spark.operators import text as T

    d = spark.createDataFrame([(1, "a a b b")], "doc_id long, text string")
    out = {r.r: r for r in T.good_turing_mass(d, gram_n=1).collect()}
    assert 0 in out and out[0].mass_share == 0.0  # p0 = 0, row kept


def test_good_turing_partial_gram_convention(spark):
    """A 2-word doc at trigram grain yields ONE partial gram."""
    from kairos_spark.operators import text as T

    d = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    out = {r.r: r for r in T.good_turing_mass(d, gram_n=3).collect()}
    assert out[1].n_r == 1 and out[0].mass_share == 1.0


# ------------------------------------------------------ cluster_stability_ari

def test_ari_chance_level_agreement(spark):
    """d1==d2, d3 weakly similar: lo merges all three, hi keeps only
    the identical pair -> a=1,b=2,d=0: Rand 1/3, ARI exactly 0."""
    from kairos_spark.operators import dedup as D

    d = spark.createDataFrame(
        [(1, "abcd"), (2, "abcd"), (3, "abxy")], "doc_id long, text string"
    )
    r = D.cluster_stability_ari(d, n=2, t_lo=0.1, t_hi=0.5).collect()[0]
    assert (r.together_both, r.together_lo_only, r.together_hi_only,
            r.together_neither) == (1, 2, 0, 0)
    assert r.n_clusters_lo == 1 and r.n_clusters_hi == 2
    assert r.rand_index == 0.333333 and r.ari == 0.0


def test_ari_identical_partitions(spark):
    from kairos_spark.operators import dedup as D

    d = spark.createDataFrame(
        [(1, "abcd"), (2, "abcd"), (3, "zzzz")], "doc_id long, text string"
    )
    r = D.cluster_stability_ari(d, n=2, t_lo=0.4, t_hi=0.6).collect()[0]
    assert r.rand_index == 1.0 and r.ari == 1.0
    assert r.together_lo_only == 0 and r.together_hi_only == 0


def test_ari_trivial_singletons_sentinel(spark):
    """All-distinct docs: both partitions all-singletons, den=0 ->
    ARI sentinels to 1.0 (identical trivial partitions)."""
    from kairos_spark.operators import dedup as D

    d = spark.createDataFrame(
        [(1, "aaaa"), (2, "bbbb"), (3, "cccc")], "doc_id long, text string"
    )
    r = D.cluster_stability_ari(d, n=2, t_lo=0.3, t_hi=0.7).collect()[0]
    assert r.together_both == 0 and r.rand_index == 1.0 and r.ari == 1.0


# -------------------------------------------------------- participation_ratio

def test_participation_ratio_hand_spectrum(spark):
    """Axis-aligned vectors give S = diag(2,1): PR = 9/5 = 1.8."""
    from kairos_spark.operators import similarity as S

    d = _vecs(spark, [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])])
    r = S.participation_ratio(d).collect()[0]
    assert r.n_vecs == 3 and r.dims == 2
    assert r.pr == 1.8 and r.pr_norm == 0.9


def test_participation_ratio_rank_one_and_zero(spark):
    from kairos_spark.operators import similarity as S

    r = S.participation_ratio(_vecs(spark, [(1, [2.0, 0.0])])).collect()[0]
    assert r.pr == 1.0  # a single direction has effective dim 1
    z = S.participation_ratio(_vecs(spark, [(1, [0.0, 0.0])])).collect()[0]
    assert z.pr == 0.0 and z.pr_norm == 0.0  # all-zero sentinel
    assert S.participation_ratio(_vecs(spark, [])).count() == 0
