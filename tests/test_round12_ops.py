"""Round-12 training-data operators: MinHash banding S-curve sweep,
boilerplate-line removal ROI, fixed-vocab OOV/byte-fallback rate,
benchmark-pair contamination matrix, multi-bit quantization sweep,
MinHash signature-size accuracy sweep, instruction/chat-format
detection, per-source TLD mix, first-iteration BPE merge candidates,
and greedy facility-location selection."""

from __future__ import annotations

from pyspark.sql import Row

from kairos_spark.operators import dedup, similarity, text


# ------------------------------------------------------------ minhash_scurve

def test_minhash_scurve_identical_docs_always_candidates(spark):
    # two identical docs: J = 1.0 (bin 9), every band agrees under
    # every config; an unrelated doc lands in a low bin
    t = "the quick brown fox jumps over the lazy dog again and again"
    u = "completely different content with no shared shingles at all!"
    d = spark.createDataFrame(
        [Row(doc_id=1, text=t), Row(doc_id=2, text=t), Row(doc_id=3, text=u)]
    )
    rows = dedup.minhash_scurve(d, sample_docs=8).collect()
    configs = {(r.bands, r.rows_per_band) for r in rows}
    assert configs == {(32, 1), (16, 2), (8, 4), (4, 8)}
    for r in rows:
        if r.j_bin == 9:
            # the identical pair is a candidate under every config
            assert r.n_cand == r.n_pairs and r.cand_rate == 1.0
    # every config sees all 3 pairs
    for cfg in configs:
        assert sum(r.n_pairs for r in rows if (r.bands, r.rows_per_band) == cfg) == 3


def test_minhash_scurve_monotone_in_bands(spark):
    # for a FIXED pair set, more bands with shorter rows can only make
    # candidacy easier: cand(32,1) >= cand(16,2) >= cand(8,4) >= cand(4,8)
    # (a full r-run of agreement under (b, r) contains full r'-runs for
    # every r' < r at aligned offsets... alignment holds because each
    # config's bands tile the same 32 components)
    docs = [
        Row(doc_id=i, text=f"shared prefix text block {i % 3} " * 4 + str(i))
        for i in range(12)
    ]
    d = spark.createDataFrame(docs)
    rows = dedup.minhash_scurve(d, sample_docs=12).collect()
    tot = {}
    for r in rows:
        tot[(r.bands, r.rows_per_band)] = tot.get((r.bands, r.rows_per_band), 0) + r.n_cand
    assert tot[(32, 1)] >= tot[(16, 2)] >= tot[(8, 4)] >= tot[(4, 8)]


def test_minhash_scurve_sample_cap(spark):
    # only the `sample_docs` LOWEST ids participate
    docs = [Row(doc_id=i, text=f"document number {i} body text") for i in range(10)]
    d = spark.createDataFrame(docs)
    rows = dedup.minhash_scurve(d, sample_docs=4).collect()
    # 4 docs → 6 pairs per config
    for cfg in {(32, 1), (16, 2), (8, 4), (4, 8)}:
        assert sum(r.n_pairs for r in rows if (r.bands, r.rows_per_band) == cfg) == 6


# ----------------------------------------------------------- boilerplate_roi

def test_boilerplate_roi_strips_common_lines(spark):
    banner = "COOKIE BANNER ACCEPT ALL"
    d = spark.createDataFrame(
        [
            Row(doc_id=1, source="a", text=banner + "\nunique one"),
            Row(doc_id=2, source="a", text=banner + "\nunique two"),
            Row(doc_id=3, source="b", text=banner + "\nunique three"),
            Row(doc_id=4, source="b", text="no boilerplate here"),
        ]
    )
    out = {r.grp: r for r in text.boilerplate_roi(d, min_docs=3).collect()}
    # banner appears in 3 distinct docs → boilerplate
    assert out["a"].n_lines == 4 and out["a"].bp_lines == 2
    assert out["a"].docs_affected == 2
    assert out["a"].bp_chars == 2 * len(banner)
    assert out["b"].bp_lines == 1 and out["b"].docs_affected == 1
    assert out["b"].line_share == 0.333333  # round-6 half-up of 1/3


def test_boilerplate_roi_distinct_doc_frequency(spark):
    # a line repeated INSIDE one doc does not count toward min_docs
    d = spark.createDataFrame(
        [
            Row(doc_id=1, source="a", text="dup\ndup\ndup"),
            Row(doc_id=2, source="a", text="other"),
        ]
    )
    out = {r.grp: r for r in text.boilerplate_roi(d, min_docs=2).collect()}
    assert out["a"].bp_lines == 0 and out["a"].docs_affected == 0


def test_boilerplate_roi_empty_source_sentinels(spark):
    d = spark.createDataFrame(
        [
            Row(doc_id=1, source="a", text="   \n  "),
            Row(doc_id=2, source="b", text="real line"),
        ]
    )
    out = {r.grp: r for r in text.boilerplate_roi(d).collect()}
    assert out["a"].n_lines == 0 and out["a"].line_share == 0.0
    assert out["a"].char_share == 0.0 and out["a"].docs_affected == 0


# ------------------------------------------------------------------ oov_rate

def test_oov_rate_top_vocab_and_fallback(spark):
    # vocab_size=1 → only the most frequent token ("aa") is in-vocab;
    # every other occurrence falls back to its UTF-8 bytes
    d = spark.createDataFrame(
        [
            Row(doc_id=1, source="s", text="aa aa aa bb"),
            Row(doc_id=2, source="t", text="aa ccc"),
        ]
    )
    out = {r.grp: r for r in text.oov_rate(d, vocab_size=1).collect()}
    assert out["s"].n_tokens == 4 and out["s"].oov_tokens == 1
    # 3 in-vocab + 2 bytes for "bb" = 5
    assert out["s"].fallback_tokens == 5 and out["s"].inflation == 1.25
    assert out["t"].n_tokens == 2 and out["t"].oov_tokens == 1
    # 1 + 3 bytes for "ccc" = 4 → inflation 2.0
    assert out["t"].fallback_tokens == 4 and out["t"].inflation == 2.0


def test_oov_rate_multibyte_fallback(spark):
    # a 3-byte UTF-8 char (€ U+20AC) as an OOV token costs 3 fallback
    # tokens — byte grain, not codepoint grain
    d = spark.createDataFrame(
        [Row(doc_id=1, source="s", text="aa aa €")]
    )
    out = {r.grp: r for r in text.oov_rate(d, vocab_size=1).collect()}
    assert out["s"].n_tokens == 3 and out["s"].oov_tokens == 1
    assert out["s"].fallback_tokens == 2 + 3


def test_oov_rate_zero_token_source_sentinels(spark):
    d = spark.createDataFrame(
        [Row(doc_id=1, source="empty", text=" "), Row(doc_id=2, source="s", text="x")]
    )
    out = {r.grp: r for r in text.oov_rate(d, vocab_size=8).collect()}
    assert out["empty"].n_tokens == 0 and out["empty"].oov_rate == 0.0
    assert out["empty"].inflation == 0.0


# -------------------------------------------------------- contamination_matrix

def test_contamination_matrix_shared_and_disjoint(spark):
    # two benchmarks; doc 10 shares a 3-gram with BOTH, doc 11 only
    # with b0, doc 12 with neither
    d = spark.createDataFrame(
        [
            Row(doc_id=10, text="alpha beta gamma delta"),
            Row(doc_id=11, text="epsilon zeta eta theta"),
            Row(doc_id=12, text="iota kappa lambda mu"),
        ]
    )
    bench = spark.createDataFrame(
        [
            Row(benchmark="b0", text="alpha beta gamma / epsilon zeta eta"),
            Row(benchmark="b1", text="beta gamma delta tail"),
            Row(benchmark="b2", text="nothing matches this suite"),
        ]
    )
    rows = {(r.bench_a, r.bench_b): r for r in
            text.contamination_matrix(d, bench, n=3).collect()}
    assert set(rows) == {("b0", "b1"), ("b0", "b2"), ("b1", "b2")}
    r01 = rows[("b0", "b1")]
    assert r01.n_a == 2 and r01.n_b == 1 and r01.n_both == 1
    assert r01.jaccard == 0.5
    # zero-overlap pairs still appear with sentinels
    r02 = rows[("b0", "b2")]
    assert r02.n_b == 0 and r02.n_both == 0 and r02.jaccard == 0.0


def test_contamination_matrix_empty_sets_sentinel(spark):
    d = spark.createDataFrame([Row(doc_id=1, text="totally unrelated words")])
    bench = spark.createDataFrame(
        [Row(benchmark="x", text="aaa bbb ccc"), Row(benchmark="y", text="ddd eee fff")]
    )
    (r,) = text.contamination_matrix(d, bench, n=3).collect()
    assert r.n_a == 0 and r.n_b == 0 and r.n_both == 0 and r.jaccard == 0.0


# ------------------------------------------------------------ quant_bits_sweep

def test_quant_bits_sweep_monotone_and_perfect_at_identity(spark):
    import math

    # clustered corpus: recall should be 1.0 at int8 on well-separated
    # vectors and never increase as bits shrink... (monotonicity is not
    # guaranteed in general; assert int8 == 1.0 and all levels present)
    vecs = []
    for i in range(30):
        base = [0.0, 0.0, 0.0, 0.0]
        base[i % 4] = 1.0 + (i // 4) * 0.01
        vecs.append(Row(vec_id=i, embedding=[float(x) for x in base]))
    emb = spark.createDataFrame(vecs)
    qs = emb.where("vec_id % 10 = 0").selectExpr("vec_id AS q_id", "embedding")
    rows = {r.q_levels: r for r in
            similarity.quant_bits_sweep(qs, emb, k=3).collect()}
    assert set(rows) == {15, 63, 255}
    assert rows[15].bits == 4 and rows[63].bits == 6 and rows[255].bits == 8
    for r in rows.values():
        assert r.n_queries == 3 and r.n_exact == 9
        assert 0.0 <= r.recall <= 1.0
        # micro-average consistency: recall == round6(n_hits/n_exact)
        assert abs(r.recall - round(r.n_hits / r.n_exact, 6)) < 2e-6


def test_quant_bits_sweep_exact_reuse_is_full_precision(spark):
    # with degenerate one-hot vectors the int8 grid reproduces the
    # corpus exactly (lo/hi endpoints are grid points) → recall 1.0
    vecs = [Row(vec_id=i, embedding=[1.0 if j == i % 3 else 0.0 for j in range(3)])
            for i in range(12)]
    emb = spark.createDataFrame(vecs)
    qs = emb.where("vec_id % 6 = 0").selectExpr("vec_id AS q_id", "embedding")
    rows = {r.q_levels: r for r in
            similarity.quant_bits_sweep(qs, emb, k=2).collect()}
    for r in rows.values():
        assert r.recall == 1.0


# ------------------------------------------------------------- sig_size_sweep

def test_sig_size_sweep_identical_docs_zero_error(spark):
    # identical pair: m = H exactly, est = 1.0 = exact J → error 0 at
    # every signature size
    t = "the quick brown fox jumps over the lazy dog again and again"
    d = spark.createDataFrame(
        [Row(doc_id=1, text=t), Row(doc_id=2, text=t)]
    )
    rows = dedup.sig_size_sweep(d, sample_docs=4).collect()
    assert {r.sig_size for r in rows} == {16, 32, 64}
    for r in rows:
        assert r.j_bin == 9 and r.n_pairs == 1
        assert r.mae == 0.0 and r.bias == 0.0 and r.max_abs_err == 0.0


def test_sig_size_sweep_error_bounds_and_grain(spark):
    docs = [
        Row(doc_id=i, text=f"common shared base text {i % 2} " * 3 + str(i))
        for i in range(10)
    ]
    d = spark.createDataFrame(docs)
    rows = dedup.sig_size_sweep(d, sample_docs=10).collect()
    per_h = {}
    for r in rows:
        assert 0.0 <= r.mae <= 1.0 and 0.0 <= r.max_abs_err <= 1.0
        assert abs(r.bias) <= r.mae + 1e-6 and r.max_abs_err >= r.mae - 1e-6
        per_h.setdefault(r.sig_size, 0)
        per_h[r.sig_size] += r.n_pairs
    # every size sees the same 45 pairs
    assert per_h == {16: 45, 32: 45, 64: 45}


def test_sig_size_sweep_prefix_nesting(spark):
    # the H=64 estimator uses the first-64 prefix of the same family;
    # a disjoint pair has exact J=0 so mae == mean est — and the est
    # can only be nonzero via hash collisions (rare): assert small
    d = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha bravo charlie delta echo foxtrot"),
            Row(doc_id=2, text="zulu yankee xray whiskey victor uniform"),
        ]
    )
    rows = {r.sig_size: r for r in dedup.sig_size_sweep(d, sample_docs=2).collect()}
    for r in rows.values():
        assert r.j_bin == 0 and r.mae <= 0.2


# --------------------------------------------------------- instruction_detect

def test_instruction_detect_template_doc_flagged(spark):
    chat = (
        "User: what is this?\nAssistant: a test.\n"
        "User: really?\nAssistant: yes.\n"
        "### Instruction\nexplain\n### Response\nfine"
    )
    prose = "Just an ordinary paragraph of text with nothing special in it."
    d = spark.createDataFrame(
        [Row(doc_id=1, source="chat", text=chat), Row(doc_id=2, source="web", text=prose)]
    )
    out = {r.grp: r for r in text.instruction_detect(d).collect()}
    # chat doc: kw>=4 (User:, Assistant:, ### Instruction, ### Response)
    # → 2 pts; 4 turn lines → 1 pt; 4/7 lines >= 15% → 1 pt; '?' density
    # 2/len — scores at least 4 → flagged
    assert out["chat"].inst_docs == 1 and out["chat"].mean_score >= 4.0
    assert out["web"].inst_docs == 0 and out["web"].mean_score == 0.0


def test_instruction_detect_crlf_and_exact_ratio(spark):
    # CRLF turn lines still match after \r removal
    chat = "Q: one?\r\nA: yes.\r\nQ: two?\r\nA: no.\r\n"
    d = spark.createDataFrame(
        [Row(doc_id=1, source="s", text=chat), Row(doc_id=2, source="s", text="plain")]
    )
    (r,) = text.instruction_detect(d).collect()
    assert r.n_docs == 2 and r.inst_docs == 1 and r.inst_frac == 0.5


# ----------------------------------------------------------------- domain_mix

def test_domain_mix_tld_grain_and_shares(spark):
    d = spark.createDataFrame(
        [
            Row(doc_id=1, source="a", text="x https://one.example.com/p y"),
            Row(doc_id=2, source="a", text="x http://two.example.com/q y"),
            Row(doc_id=3, source="a", text="x https://site.org/r y"),
            Row(doc_id=4, source="a", text="no links"),
            Row(doc_id=5, source="b", text="x https://only.net/z y"),
        ]
    )
    out = {(r.grp, r.tld): r for r in dedup.domain_mix(d).collect()}
    assert out[("a", "com")].n_docs == 2 and out[("a", "com")].n_hosts == 2
    assert out[("a", "com")].share == 0.666667  # 2/3 of a's URL docs
    assert out[("a", "org")].n_docs == 1 and out[("a", "org")].share == 0.333333
    assert out[("b", "net")].share == 1.0
    # doc 4 (no URL) is excluded from the denominators entirely
    assert ("a", "") not in out


def test_domain_mix_first_url_only_and_case(spark):
    # only the FIRST URL counts; host lowercases (ASCII-safe)
    d = spark.createDataFrame(
        [Row(doc_id=1, source="s", text="see https://First.COM/a then https://second.org/b")]
    )
    (r,) = dedup.domain_mix(d).collect()
    assert r.tld == "com" and r.n_hosts == 1 and r.share == 1.0


# -------------------------------------------------------- bpe_merge_candidates

def test_bpe_merge_candidates_weighted_pairs(spark):
    # "ab" appears in 3 word occurrences ("ab" x2 + "abc"), "bc" in 1
    d = spark.createDataFrame(
        [Row(doc_id=1, text="ab ab abc"), Row(doc_id=2, text="x")]
    )
    rows = {r.pair: r for r in text.bpe_merge_candidates(d, k=10).collect()}
    assert rows["ab"].pair_count == 3 and rows["ab"].rank == 1
    assert rows["bc"].pair_count == 1
    # 1-char words contribute no pairs
    assert "x" not in rows


def test_bpe_merge_candidates_rank_ties_on_pair(spark):
    d = spark.createDataFrame([Row(doc_id=1, text="zz aa")])
    rows = sorted(text.bpe_merge_candidates(d, k=10).collect(),
                  key=lambda r: r.rank)
    assert [r.pair for r in rows] == ["aa", "zz"]  # tie -> pair asc


# ------------------------------------------------------------- facility_select

def test_facility_select_greedy_order_and_coverage(spark):
    # doc 1 covers {g1..g4}, doc 2 {g1, g2}, doc 3 {g5}: greedy picks
    # 1 (gain 4), then 3 (gain 1), then 2 (gain 0)
    t1 = "a b c d e f"            # grams: abc bcd cde def (4)
    t2 = "a b c d"                # grams: abc bcd (2, all covered by t1)
    t3 = "x y z"                  # gram: xyz (1)
    d = spark.createDataFrame(
        [Row(doc_id=1, text=t1), Row(doc_id=2, text=t2), Row(doc_id=3, text=t3)]
    )
    rows = {r.step: r for r in
            text.facility_select(d, n=3, k=3, sample_docs=8).collect()}
    assert rows[1].doc_id == 1 and rows[1].gain == 4 and rows[1].covered == 4
    assert rows[2].doc_id == 3 and rows[2].gain == 1 and rows[2].covered == 5
    assert rows[3].doc_id == 2 and rows[3].gain == 0 and rows[3].covered == 5


def test_facility_select_diminishing_gains(spark):
    docs = [Row(doc_id=i, text=f"w{i} common base text tail {i % 2}")
            for i in range(10)]
    d = spark.createDataFrame(docs)
    rows = sorted(text.facility_select(d, n=3, k=5, sample_docs=10).collect(),
                  key=lambda r: r.step)
    gains = [r.gain for r in rows]
    # greedy marginal gains are non-increasing (submodularity)
    assert all(a >= b for a, b in zip(gains, gains[1:]))
    assert rows[-1].covered == sum(gains)


def test_facility_select_fewer_docs_than_k(spark):
    d = spark.createDataFrame([Row(doc_id=1, text="only one doc here")])
    rows = text.facility_select(d, n=3, k=4, sample_docs=8).collect()
    # trace stops when the sample is exhausted
    assert len(rows) == 1 and rows[0].doc_id == 1
