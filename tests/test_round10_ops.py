"""Round-10 operator tests.

Covers the r10 additions: the LSH-path keep-best composition
(VERDICT r9 #3) and the new training-data operators added this round.
"""

from pyspark.sql import Row, functions as F

from kairos_spark.operators import dedup, sampling, similarity, text


# --- cluster_keep_best LSH path (VERDICT r9 #3) ---


def _dup_corpus(spark):
    """Three exact-dup groups + two singletons. Exact duplicates have
    identical MinHash signatures, so the banded LSH path is guaranteed
    to surface every within-group candidate pair — the exact and LSH
    compositions must then agree on these clusters."""
    t1 = "the quick brown fox jumps over the lazy dog again and again"
    t2 = "pack my box with five dozen liquor jugs right now please ok"
    t3 = "sphinx of black quartz judge my vow said the old professor"
    rows = [
        Row(doc_id=1, text=t1),
        Row(doc_id=2, text=t1),
        Row(doc_id=3, text=t1),
        Row(doc_id=10, text=t2),
        Row(doc_id=11, text=t2),
        Row(doc_id=20, text=t3),
        Row(doc_id=30, text="completely unrelated singleton content here"),
        Row(doc_id=31, text="another standalone document nothing shared"),
    ]
    return spark.createDataFrame(rows)


def test_cluster_keep_best_lsh_matches_exact_on_exact_dups(spark):
    d = _dup_corpus(spark)
    scored = text.quality_score(d)

    exact_pairs = dedup.ngram_jaccard_pairs(d, n=8, threshold=0.25)
    exact = {
        r.cluster_id: r
        for r in dedup.cluster_representatives(
            dedup.connected_components(exact_pairs), scored
        ).collect()
    }

    lsh_pairs = dedup.minhash_lsh_pairs(
        d, n=8, num_hashes=32, bands=16, threshold=0.2
    )
    lsh = {
        r.cluster_id: r
        for r in dedup.cluster_representatives(
            dedup.connected_components(lsh_pairs), scored
        ).collect()
    }

    # every exact-dup cluster appears on both paths with the same
    # membership count and the same keep pick
    assert set(exact) == set(lsh) == {1, 10}
    for cid in exact:
        assert exact[cid].n_members == lsh[cid].n_members
        assert exact[cid].keep_doc_id == lsh[cid].keep_doc_id
        assert exact[cid].keep_score == lsh[cid].keep_score
    # keep policy: argmax quality, id tiebreak — identical texts tie,
    # so the smallest id wins
    assert lsh[1].keep_doc_id == 1 and lsh[1].n_members == 3
    assert lsh[10].keep_doc_id == 10 and lsh[10].n_members == 2


def test_cluster_keep_best_lsh_oracle_registered():
    from kairos_spark import queries as q

    assert "cluster_keep_best_lsh" in q.QUERIES
    sql = q.ORACLES["cluster_keep_best_lsh"]
    # the surgery must carry BOTH halves: the banded-LSH candidate CTEs
    # and the keep-best quality/argmax tail
    assert "band" in sql or "bnd" in sql
    assert "keep_doc_id" in sql and "quality" in sql
    assert "reach" in sql


# --- dup_line_stats ---


def test_dup_line_stats_gopher_fractions(spark):
    rows = [
        # 4 lines, "aa" twice: dup_line_frac = 1/4; chars 2+2+3+4=11,
        # dup chars = 2 (the repeat "aa") -> 2/11
        Row(doc_id=1, text="aa\naa\nbbb\ncccc"),
        # all distinct
        Row(doc_id=2, text="x\ny"),
        # empty + whitespace-only lines are dropped entirely
        Row(doc_id=3, text="\n   \n"),
    ]
    out = {r.doc_id: r for r in text.dup_line_stats(spark.createDataFrame(rows)).collect()}
    assert out[1].n_lines == 4 and out[1].n_distinct_lines == 3
    assert out[1].dup_line_frac == 0.25
    assert out[1].dup_char_frac == round(2 / 11, 6)
    assert out[2].dup_line_frac == 0.0 and out[2].dup_char_frac == 0.0
    assert out[3].n_lines == 0 and out[3].dup_line_frac == 0.0


# --- quality_threshold_sweep ---


def test_quality_threshold_sweep_monotone(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=("the and of to in is that for with word " * (i + 1)))
         for i in range(6)]
    )
    out = sorted(
        text.quality_threshold_sweep(docs).collect(), key=lambda r: r.threshold
    )
    assert [r.threshold for r in out] == [round(0.1 * i, 1) for i in range(1, 10)]
    kept = [r.n_docs_kept for r in out]
    toks = [r.tokens_kept for r in out]
    # monotone non-increasing in the threshold
    assert kept == sorted(kept, reverse=True)
    assert toks == sorted(toks, reverse=True)
    assert out[0].doc_share <= 1.0 and out[-1].token_share >= 0.0


# --- blocklist_audit ---


def test_blocklist_audit_counts(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="Lorem Ipsum dolor { lorem ipsum", source="a"),
            Row(doc_id=2, text="clean prose only", source="a"),
            Row(doc_id=3, text="see our Privacy Policy", source="b"),
        ]
    )
    out = {
        (r.source, r.phrase): r for r in text.blocklist_audit(docs).collect()
    }
    # every (source, phrase) pair reported, zeros included
    assert len(out) == 2 * len(text.BLOCKLIST_PHRASES)
    assert out[("a", "lorem ipsum")].n_docs_hit == 1
    assert out[("a", "lorem ipsum")].n_occurrences == 2
    assert out[("a", "{")].n_occurrences == 1
    assert out[("a", "lorem ipsum")].hit_rate == 0.5
    assert out[("b", "privacy policy")].n_docs_hit == 1
    assert out[("b", "lorem ipsum")].n_docs_hit == 0


# --- contamination_span_stats ---


def test_contamination_spans_pad_and_union(spark):
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " \
                 "lam mu nu"
    filler = " ".join(f"w{i}" for i in range(60))
    docs = spark.createDataFrame(
        [
            # contaminated: the 13 bench tokens sit in the middle
            Row(doc_id=1, text=filler + " " + bench_text + " " + filler),
            Row(doc_id=2, text=filler),
        ]
    )
    bench = spark.createDataFrame([Row(text=bench_text)])
    out = {
        r.doc_id: r
        for r in dedup.contamination_span_stats(docs, bench, k=13, pad=20).collect()
    }
    assert out[1].n_hits == 1 and out[1].n_spans == 1
    # window [61, 73] padded by 20 each side -> [41, 93] -> 53 tokens
    assert out[1].rm_tokens == 53
    assert out[1].n_tokens == 133
    assert out[2].n_hits == 0 and out[2].rm_tokens == 0


def test_contamination_spans_clamped_at_doc_edge(spark):
    bench_text = "a b c d e f g h i j k l m"
    docs = spark.createDataFrame([Row(doc_id=1, text=bench_text)])
    bench = spark.createDataFrame([Row(text=bench_text)])
    out = dedup.contamination_span_stats(docs, bench, k=13, pad=20).collect()[0]
    # the whole 13-token doc is covered; padding clamps to the doc
    assert out.rm_tokens == 13 and out.rm_token_frac == 1.0


# --- boundary_overlap_pairs ---


def test_boundary_overlap_detects_chain(spark):
    a = "one two three four five six seven eight nine ten"
    # b starts with a's last 8 tokens
    b = "three four five six seven eight nine ten more words follow here"
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=a), Row(doc_id=2, text=b),
         Row(doc_id=3, text="totally unrelated content with many extra tokens")]
    )
    out = dedup.boundary_overlap_pairs(docs, k=8).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(1, 2)]
    assert out[0].n_tokens_a == 10 and out[0].n_tokens_b == 12


def test_boundary_overlap_max_occ_guard(spark):
    # 60 docs all sharing the same head AND tail gram: every boundary
    # digest occurs 120 times > max_occ -> no pairs survive the guard
    t = "same eight tokens here again and again okay"
    docs = spark.createDataFrame([Row(doc_id=i, text=t) for i in range(60)])
    assert dedup.boundary_overlap_pairs(docs, k=8, max_occ=50).count() == 0


# --- pipeline_roi ---


def test_pipeline_roi_stage_accounting(spark):
    good = "the and of to in is that for with word " * 10
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=good, source="s1"),
            Row(doc_id=2, text=good, source="s1"),          # exact dup of 1
            Row(doc_id=3, text="1 2 3 4 5", source="s1"),   # fails quality
            Row(doc_id=4, text=good + "unique tail", source="s2"),
        ]
    )
    out = {r.source: r for r in sampling.pipeline_roi(docs).collect()}
    s1 = out["s1"]
    assert s1.n_raw == 3 and s1.n_quality == 2 and s1.n_kept == 1
    assert s1.quality_rm_frac == round(1 / 3, 6)
    assert s1.dup_rm_frac == 0.5
    s2 = out["s2"]
    assert s2.n_raw == s2.n_quality == s2.n_kept == 1
    # mix weights are an exact partition of ~1
    assert abs(s1.mix_weight + s2.mix_weight - 1.0) < 2e-6


# --- cluster_balanced_sample / ivf_list_balance ---


def test_cluster_balanced_sample_quota_and_determinism(spark):
    import random

    rng = random.Random(7)
    rows = [
        Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(8)])
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows)
    out = similarity.cluster_balanced_sample(emb, k=4, iters=1, per_cluster=3).collect()
    per = {}
    for r in out:
        per.setdefault(r.cluster_id, []).append(r)
    for cid, members in per.items():
        assert len(members) <= 3
        ranks = sorted(m.pick_rank for m in members)
        assert ranks == list(range(1, len(members) + 1))
        # n_in_cluster consistent within the cluster
        assert len({m.n_in_cluster for m in members}) == 1
    # deterministic: second run identical
    out2 = similarity.cluster_balanced_sample(emb, k=4, iters=1, per_cluster=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_ivf_list_balance_shares_sum(spark):
    import random

    rng = random.Random(3)
    rows = [
        Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(8)])
        for i in range(50)
    ]
    out = similarity.ivf_list_balance(
        spark.createDataFrame(rows), k=4, iters=1
    ).collect()
    assert sum(r.n_vecs for r in out) == 50
    assert abs(sum(r.share for r in out) - 1.0) < 1e-5
    for r in out:
        assert r.load_factor == round(r.n_vecs * 4 / 50, 6)


# --- dup_quality_bias ---


def test_dup_quality_bias_buckets_and_means(spark):
    good = "the and of to in is that for with word " * 10
    bad = "1 2 3"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=good),        # group of 2: ids 1, 2
            Row(doc_id=2, text=good),
            Row(doc_id=3, text=bad),         # singleton
            Row(doc_id=4, text=good + "x"),  # singleton
        ]
    )
    out = {r.group_size_bucket: r for r in dedup.dup_quality_bias(docs).collect()}
    assert out[2].n_groups == 1 and out[2].n_docs == 2
    assert out[1].n_groups == 2 and out[1].n_docs == 2
    # identical texts -> identical quality: all == kept in the size-2
    # bucket (the keep policy is quality-neutral on exact dups)
    assert out[2].mean_quality_all == out[2].mean_quality_kept
    # singletons: every doc is its own keep
    assert out[1].mean_quality_all == out[1].mean_quality_kept


def test_dup_quality_bias_size_cap(spark):
    t = "capped bucket text sample with several words here"
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i in range(6)]  # one group of 6
    )
    out = dedup.dup_quality_bias(docs, size_cap=4).collect()
    assert len(out) == 1 and out[0].group_size_bucket == 4
    assert out[0].n_docs == 6 and out[0].n_groups == 1


# --- cluster_source_purity ---


def test_cluster_source_purity_histogram(spark):
    clusters = spark.createDataFrame(
        [
            Row(node=1, cluster_id=1),
            Row(node=2, cluster_id=1),   # cluster 1 spans a, b
            Row(node=3, cluster_id=3),
            Row(node=4, cluster_id=3),   # cluster 3 pure in a
        ]
    )
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, source="a"),
            Row(doc_id=2, source="b"),
            Row(doc_id=3, source="a"),
            Row(doc_id=4, source="a"),
        ]
    )
    out = {
        r.n_sources: r for r in dedup.cluster_source_purity(clusters, docs).collect()
    }
    assert out[1].n_clusters == 1 and out[1].n_docs == 2
    assert out[2].n_clusters == 1 and out[2].n_docs == 2


# --- bigram_entropy_rate ---


def test_bigram_entropy_rate_degenerate_vs_diverse(spark):
    import math

    # template farm: one repeated bigram pattern -> H(w2|w1) ~ 0
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b a b a b a b a b", source="template"),
            Row(doc_id=2, text="q w e r t y u i o p", source="diverse"),
        ]
    )
    out = {r.grp: r for r in text.bigram_entropy_rate(docs).collect()}
    t = out["template"]
    assert t.n_tokens == 10
    # unigram entropy of {a:5, b:5} = 1 bit; bigrams: {a b:5, b a:4}
    assert t.h_unigram == 1.0
    h2 = round(math.log2(9) - (5 * math.log2(5) + 4 * math.log2(4)) / 9, 6)
    assert t.h_bigram == h2
    assert t.h_rate == round(h2 - 1.0, 6)
    d = out["diverse"]
    # all-distinct tokens: H1 = log2(10); all-distinct bigrams: H2 = log2(9)
    assert d.h_unigram == round(math.log2(10), 6)
    assert d.h_bigram == round(math.log2(9), 6)


# --- script_mix ---


def test_script_mix_known_counts(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="Ж a 你 9 😀", source="mix"),
            Row(doc_id=2, text="", source="empty"),
        ]
    )
    out = {r.grp: r for r in text.script_mix(docs).collect()}
    m = out["mix"]
    # 5 chars + 4 spaces = 9 codepoints (astral emoji counts as ONE)
    assert m.n_chars == 9 and m.n_docs == 1
    assert m.frac_latin == round(1 / 9, 6)
    assert m.frac_cyrillic == round(1 / 9, 6)
    assert m.frac_cjk == round(1 / 9, 6)
    assert m.frac_digit == round(1 / 9, 6)
    assert m.frac_whitespace == round(4 / 9, 6)
    assert m.frac_other == round(1 / 9, 6)  # the emoji
    assert m.frac_greek == 0.0 and m.frac_arabic == 0.0
    e = out["empty"]
    # all-empty group: every fraction sentinels to 0.0 (no NULL, no x/0)
    assert e.n_chars == 0 and e.frac_latin == 0.0 and e.frac_other == 0.0


def test_script_mix_fractions_sum_to_one(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="привет мир 42", source="s"),
            Row(doc_id=2, text="ελληνικά και مرحبا", source="s"),
        ]
    )
    (r,) = text.script_mix(docs).collect()
    total = (
        r.frac_latin + r.frac_cyrillic + r.frac_greek + r.frac_cjk
        + r.frac_arabic + r.frac_digit + r.frac_whitespace + r.frac_other
    )
    # eight round-6 ratios of one denominator: off by at most 8 half-ulps
    assert abs(total - 1.0) < 5e-6


# --- cramers_v ---


def test_cramers_v_perfect_and_independent(spark):
    from kairos_spark.operators import profiling

    # perfect association: a == b -> V = 1, chi2 = n
    perfect = spark.createDataFrame(
        [Row(a="x", b="x")] * 4 + [Row(a="y", b="y")] * 6
    )
    (r,) = profiling.cramers_v(perfect, "a", "b").collect()
    assert r.n == 10 and r.n_rows == 2 and r.n_cols == 2
    assert r.cramers_v == 1.0 and r.chi2 == 10.0
    # exact independence: complete uniform cross -> V = 0, chi2 = 0
    indep = spark.createDataFrame(
        [Row(a=a, b=b) for a in "xy" for b in "uv" for _ in range(3)]
    )
    (r,) = profiling.cramers_v(indep, "a", "b").collect()
    assert r.cramers_v == 0.0 and r.chi2 == 0.0


def test_cramers_v_hand_computed_and_degenerate(spark):
    from kairos_spark.operators import profiling

    # O = [[2,1],[1,2]]: chi2 = n(SUM O^2/(r c) - 1) = 6(10/9 - 1) = 2/3,
    # V = sqrt(chi2/(n k)) = sqrt(1/9) = 1/3 (quantized floor shaves
    # < 1e-11 -- invisible at round-6)
    rows = (
        [Row(a="a1", b="b1")] * 2 + [Row(a="a1", b="b2")]
        + [Row(a="a2", b="b1")] + [Row(a="a2", b="b2")] * 2
    )
    (r,) = profiling.cramers_v(spark.createDataFrame(rows), "a", "b").collect()
    assert r.chi2 == 0.666667 and r.cramers_v == 0.333333
    # degenerate: one column category -> k = 0 -> both sentinel 0.0
    deg = spark.createDataFrame([Row(a="a1", b="only"), Row(a="a2", b="only")])
    (r,) = profiling.cramers_v(deg, "a", "b").collect()
    assert r.chi2 == 0.0 and r.cramers_v == 0.0 and r.n_cols == 1


# --- fim_split_audit ---


def test_fim_split_audit_spans_partition_doc(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="x" * (10 + i), source="s") for i in range(20)]
    )
    (r,) = sampling.fim_split_audit(docs, min_middle=4).collect()
    assert r.n_docs == 20 and 0 < r.fim_docs < 20
    # the three span budgets partition the FIM char budget exactly
    total = r.prefix_frac + r.middle_frac + r.suffix_frac
    assert abs(total - 1.0) < 3e-6  # three half-ulps of round-6
    assert 0.0 <= r.short_middle_rate <= 1.0


def test_fim_split_audit_determinism_and_empty(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="", source="empty"),
         Row(doc_id=2, text="", source="empty")]
    )
    (r,) = sampling.fim_split_audit(docs).collect()
    # empty docs: cut points are both 0, spans all empty -> sentinels
    assert r.prefix_frac == 0.0 and r.middle_frac == 0.0 and r.suffix_frac == 0.0
    # any selected empty doc has middle 0 < min_middle -> rate 1.0 (or
    # no doc selected -> 0.0); both are valid deterministic outcomes
    assert r.short_middle_rate in (0.0, 1.0)
    # pure function of ids: a rerun is byte-identical
    (r2,) = sampling.fim_split_audit(docs).collect()
    assert r == r2


# --- rp_distortion ---


def test_rp_distortion_identical_and_opposite(spark):
    # identical vectors -> hamming 0, cosine exactly 1; opposite
    # vectors -> all plane signs flip -> hamming = planes, cosine -1
    v = [1.0, 2.0, -3.0, 0.5]
    docs = spark.createDataFrame(
        [Row(vec_id=0, embedding=v),
         Row(vec_id=1, embedding=v),
         Row(vec_id=2, embedding=[-x for x in v])]
    )
    out = {r.hamming: r for r in
           similarity.rp_distortion(docs, dim=4, planes=8, max_id=10).collect()}
    assert out[0].mean_cosine == 1.0 and out[0].n_pairs == 1
    assert out[8].mean_cosine == -1.0 and out[8].n_pairs == 2
    assert out[8].min_cosine == -1.0 and out[8].max_cosine == -1.0


def test_rp_distortion_zero_norm_sentinel(spark):
    docs = spark.createDataFrame(
        [Row(vec_id=0, embedding=[0.0, 0.0]),
         Row(vec_id=1, embedding=[1.0, 1.0])]
    )
    rows = similarity.rp_distortion(docs, dim=2, planes=4, max_id=10).collect()
    assert len(rows) == 1 and rows[0].mean_cosine == -1.0


# --- ivf_probe_sweep ---


def test_ivf_probe_sweep_monotone_and_full_probe(spark):
    import math

    # 40 vectors on a circle: 16 centroid seeds, queries from the set
    vecs = [
        Row(vec_id=i, embedding=[math.cos(i / 7.0), math.sin(i / 7.0)])
        for i in range(40)
    ]
    emb = spark.createDataFrame(vecs)
    qs = emb.where(F.col("vec_id") % 13 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    out = {r.nprobe: r for r in
           similarity.ivf_probe_sweep(qs, emb, k=5, nlist=8,
                                      probes=(1, 2, 4, 8)).collect()}
    assert set(out) == {1, 2, 4, 8}
    # recall and scanned fraction are monotone non-decreasing in nprobe
    for lo, hi in [(1, 2), (2, 4), (4, 8)]:
        assert out[lo].recall <= out[hi].recall
        assert out[lo].scanned_frac <= out[hi].scanned_frac
    # probing every list (nprobe = nlist = 8) is exhaustive
    assert out[8].recall == 1.0 and out[8].scanned_frac == 1.0
    for r in out.values():
        assert 0.0 <= r.recall <= 1.0 and 0.0 < r.scanned_frac <= 1.0


# --- shard_dup_locality ---


def test_shard_dup_locality_pair_accounting(spark):
    # one group of 4 copies (ids spread over shards), one group of 2,
    # two singletons (excluded)
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="copy A") for i in range(4)]
        + [Row(doc_id=10, text="copy B"), Row(doc_id=11, text="copy B")]
        + [Row(doc_id=20, text="solo x"), Row(doc_id=21, text="solo y")]
    )
    (r,) = dedup.shard_dup_locality(docs, n_shards=8).collect()
    assert r.n_shards == 8
    assert r.n_dup_groups == 2 and r.n_dup_docs == 6
    # total pairs = C(4,2) + C(2,2) = 6 + 1 = 7; intra + cross = total
    assert r.intra_pairs + r.cross_pairs == 7
    assert r.locality == round(r.intra_pairs / 7, 6)


def test_shard_dup_locality_single_shard_and_empty(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="t"), Row(doc_id=2, text="t")]
    )
    # n_shards=1: every pair is intra-shard
    (r,) = dedup.shard_dup_locality(docs, n_shards=1).collect()
    assert r.locality == 1.0 and r.cross_pairs == 0 and r.intra_pairs == 1
    # no duplicates at all: zero counts, 0.0 sentinel, no NULL
    solo = spark.createDataFrame([Row(doc_id=1, text="a"), Row(doc_id=2, text="b")])
    (r,) = dedup.shard_dup_locality(solo).collect()
    assert r.n_dup_groups == 0 and r.intra_pairs == 0 and r.locality == 0.0


# --- quant_recall ---


def test_quant_recall_identity_when_lossless(spark):
    # vectors already ON the quantization grid (lo + j*(hi-lo)/levels
    # for levels=4): dequantization is the identity -> recall 1.0
    vals = [0.0, 0.25, 0.5, 0.75, 1.0]
    docs = spark.createDataFrame(
        [Row(vec_id=i, embedding=[vals[i % 5], vals[(i + 2) % 5]])
         for i in range(12)]
    )
    qs = docs.where(F.col("vec_id") % 6 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    out = similarity.quant_recall(qs, docs, k=3, levels=4).collect()
    assert len(out) == 2
    assert all(r.recall == 1.0 for r in out)


def test_quant_recall_coarse_grid_degrades(spark):
    import math

    # 30 vectors on a tight arc: a 1-level grid collapses geometry, so
    # at least one query must lose a true neighbor (recall < 1), while
    # every recall stays a valid ratio
    docs = spark.createDataFrame(
        [Row(vec_id=i, embedding=[math.cos(0.01 * i), math.sin(0.01 * i)])
         for i in range(30)]
    )
    qs = docs.where(F.col("vec_id") % 9 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    out = similarity.quant_recall(qs, docs, k=5, levels=1).collect()
    assert all(0.0 <= r.recall <= 1.0 for r in out)
    assert any(r.recall < 1.0 for r in out)


# --- frame_dup_rate ---


def test_frame_dup_rate_reupload_detection(spark):
    from kairos_spark.operators import multimodal

    base = "A" * 600          # 3 frames at 256 bytes
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=base),              # original
            Row(doc_id=2, text=base),              # exact re-upload
            Row(doc_id=3, text="B" * 300),         # unique (2 frames)
            Row(doc_id=4, text=base + "tail" * 80),  # shares frames 1-2
        ]
    )
    media = multimodal.attach_media(docs)
    out = {r.media_id: r for r in
           multimodal.frame_dup_rate(media, frame_bytes=256).collect()}
    # re-upload pair: every frame duplicated
    assert out[1].n_frames == 3 and out[1].dup_frame_rate == 1.0
    assert out[2].dup_frame_rate == 1.0
    # unique media: nothing shared
    assert out[3].dup_frames == 0 and out[3].dup_frame_rate == 0.0
    # partial overlap: the first two 256-byte frames match the base,
    # the third differs ('AAAA…' + 'tail' tail vs pure 'A's)
    assert out[4].n_frames == 4 and out[4].dup_frames == 2
    assert out[4].dup_frame_rate == 0.5


def test_frame_dup_rate_empty_payload_floor(spark):
    from kairos_spark.operators import multimodal

    docs = spark.createDataFrame(
        [Row(doc_id=1, text=""), Row(doc_id=2, text=""), Row(doc_id=3, text="x")]
    )
    out = {r.media_id: r for r in
           multimodal.frame_dup_rate(multimodal.attach_media(docs)).collect()}
    # empty payloads still contribute one (empty) frame — the
    # frame_sample floor — and two empties duplicate each other
    assert out[1].n_frames == 1 and out[1].dup_frame_rate == 1.0
    assert out[3].n_frames == 1 and out[3].dup_frame_rate == 0.0


# --- byte_entropy ---


def test_byte_entropy_known_distributions(spark):
    import math

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="aaaa", source="flat"),      # one byte value
            Row(doc_id=2, text="ab", source="coin"),        # two, 50/50
            Row(doc_id=3, text="", source="emptyonly"),     # filtered out
            Row(doc_id=4, text="h\x01i", source="ctrl"),    # control byte
        ]
    )
    out = {r.grp: r for r in text.byte_entropy(docs).collect()}
    assert out["flat"].h_byte == 0.0 and out["flat"].n_distinct_bytes == 1
    assert out["flat"].printable_frac == 1.0
    assert out["coin"].h_byte == 1.0  # exactly 1 bit
    # a group whose every payload is empty has no byte stream at all
    assert "emptyonly" not in out
    c = out["ctrl"]
    assert c.n_bytes == 3 and c.printable_frac == round(2 / 3, 6)
    assert c.h_byte == round(math.log2(3), 6)


def test_byte_entropy_multibyte_utf8_counts_bytes(spark):
    # '你' is 3 UTF-8 bytes: byte grain, never codepoint grain
    docs = spark.createDataFrame([Row(doc_id=1, text="你", source="cjk")])
    (r,) = text.byte_entropy(docs).collect()
    assert r.n_bytes == 3 and r.n_distinct_bytes == 3
    assert r.printable_frac == 0.0  # all three bytes are >= 0x80


# --- cluster_quality_bias ---


def test_cluster_quality_bias_kept_vs_all(spark):
    good = "the and of to in is that for with word " * 10
    bad = "1 2 3 4"
    # cluster 1 = {1, 2}: keep id 1 (good), member 2 is bad -> kept
    # mean must exceed all-member mean in the size-2 bucket
    clusters = spark.createDataFrame(
        [Row(node=1, cluster_id=1), Row(node=2, cluster_id=1),
         Row(node=5, cluster_id=5), Row(node=6, cluster_id=5),
         Row(node=7, cluster_id=5)]
    )
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=good), Row(doc_id=2, text=bad),
         Row(doc_id=5, text=good), Row(doc_id=6, text=good),
         Row(doc_id=7, text=good)]
    )
    out = {r.cluster_size_bucket: r
           for r in dedup.cluster_quality_bias(clusters, docs).collect()}
    b2 = out[2]
    assert b2.n_clusters == 1 and b2.n_docs == 2
    assert b2.mean_quality_kept > b2.mean_quality_all
    b3 = out[3]
    # identical members: keep policy is quality-neutral
    assert b3.n_docs == 3 and b3.mean_quality_all == b3.mean_quality_kept


def test_cluster_quality_bias_size_cap(spark):
    t = "capped bucket text sample with several words here"
    clusters = spark.createDataFrame(
        [Row(node=i, cluster_id=0) for i in range(6)]
    )
    docs = spark.createDataFrame([Row(doc_id=i, text=t) for i in range(6)])
    out = dedup.cluster_quality_bias(clusters, docs, size_cap=4).collect()
    assert len(out) == 1 and out[0].cluster_size_bucket == 4
    assert out[0].n_docs == 6 and out[0].n_clusters == 1


# --- rule_disagreement ---


def test_rule_disagreement_counts_and_mcnemar(spark):
    # engineer docs with known flag patterns for r01 (>=50 words) and
    # r08 (no '{' boilerplate): 3 pass both, 2 pass r01 only (brace),
    # 1 passes r08 only (short), 1 fails both
    long_ok = "word " * 60
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=long_ok + "the be to of and that have with") for i in range(3)]
        + [Row(doc_id=10 + i, text=long_ok + "{x}") for i in range(2)]
        + [Row(doc_id=20, text="short text only")]
        + [Row(doc_id=21, text="tiny {")]
    )
    out = {(r.rule_a, r.rule_b): r for r in text.rule_disagreement(docs).collect()}
    assert len(out) == 28  # C(8,2) pairs
    r = out[("r01_word_count", "r08_no_boilerplate")]
    assert r.n_docs == 7 and r.a_only == 2 and r.b_only == 1
    assert r.disagree_rate == round(3 / 7, 6)
    # McNemar (b-c)^2/(b+c) = 1/3
    assert r.mcnemar_chi2 == round(1 / 3, 6)


def test_rule_disagreement_identical_rules_sentinel(spark):
    # every doc passes r04/r05 trivially (single line, no bullets): a
    # fully concordant pair has zero discordance -> 0.0 sentinel
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="plain line of text " * 10) for i in range(4)]
    )
    out = {(r.rule_a, r.rule_b): r for r in text.rule_disagreement(docs).collect()}
    r = out[("r04_bullet_lines", "r05_ellipsis_lines")]
    assert r.a_only == 0 and r.b_only == 0
    assert r.disagree_rate == 0.0 and r.mcnemar_chi2 == 0.0


# --- kendall_tau ---


def test_kendall_tau_perfect_and_inverted(spark):
    from kairos_spark.operators import profiling

    # day 0: x and y rise together hour by hour -> tau = 1
    # day 1: x rises while y falls -> tau = -1
    rows = []
    for h in range(4):
        for day, ydir in [(0, h), (1, 3 - h)]:
            base = day * 86400 + h * 3600
            rows += [("click", float(base + i)) for i in range(h + 1)]
            rows += [("view", float(base + 10 + i)) for i in range(ydir + 1)]
    df = spark.createDataFrame(rows, "event_type string, ts_sec double").select(
        "event_type", F.timestamp_seconds("ts_sec").alias("ts")
    )
    out = {r.day: r for r in profiling.kendall_tau(df).collect()}
    assert out[0].tau_b == 1.0 and out[0].n_hours == 4
    assert out[0].concordant == 6 and out[0].discordant == 0
    assert out[1].tau_b == -1.0 and out[1].discordant == 6


def test_kendall_tau_constant_variable_sentinel(spark):
    from kairos_spark.operators import profiling

    # x constant across hours (every pair tied on x) -> denominator 0
    rows = []
    for h in range(3):
        rows += [("click", float(h * 3600))]
        rows += [("view", float(h * 3600 + 5 + i)) for i in range(h + 1)]
    df = spark.createDataFrame(rows, "event_type string, ts_sec double").select(
        "event_type", F.timestamp_seconds("ts_sec").alias("ts")
    )
    (r,) = profiling.kendall_tau(df).collect()
    assert r.tau_b == 0.0 and r.concordant == 0 and r.discordant == 0


def test_quant_recall_constant_dimension_identity(spark):
    # dim 1 is constant across the corpus (lo == hi): dequantization
    # must hit the width==0 branch and reproduce the constant exactly,
    # so rankings are unchanged -> recall 1.0
    docs = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i % 5), 7.0]) for i in range(10)]
    )
    qs = docs.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    out = similarity.quant_recall(qs, docs, k=3, levels=255).collect()
    assert len(out) == 2 and all(r.recall == 1.0 for r in out)


# --- source_kl ---


def test_source_kl_identical_source_is_zero(spark):
    # a source whose distribution equals the mixture has D = 0; here
    # both sources share one identical distribution
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a b a b", source="s1"),
         Row(doc_id=2, text="a b a b", source="s2")]
    )
    out = {r.grp: r for r in text.source_kl(docs).collect()}
    assert out["s1"].kl_bits == 0.0 and out["s2"].kl_bits == 0.0
    assert out["s1"].n_tokens == 4 and out["s1"].n_terms == 2


def test_source_kl_disjoint_vocabulary(spark):
    import math

    # two equal-size sources with DISJOINT vocabularies: each term has
    # C_t = c, so D = log2(N / N_s) = 1 bit exactly
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="x y z w", source="s1"),
         Row(doc_id=2, text="p q r t", source="s2")]
    )
    out = {r.grp: r for r in text.source_kl(docs).collect()}
    assert out["s1"].kl_bits == 1.0 and out["s2"].kl_bits == 1.0
    # skew the sizes: D_s = log2(N/N_s) when vocab stays disjoint
    docs2 = spark.createDataFrame(
        [Row(doc_id=1, text="x y z w q1 q2", source="big"),
         Row(doc_id=2, text="p r", source="small")]
    )
    out2 = {r.grp: r for r in text.source_kl(docs2).collect()}
    assert out2["small"].kl_bits == round(math.log2(8 / 2), 6)
    assert out2["big"].kl_bits == round(math.log2(8 / 6), 6)


# --- formula fuzz: cramers_v and kendall_tau vs exact references ---


def test_cramers_v_matches_exact_reference_fuzz(spark):
    import math
    import random
    from fractions import Fraction

    from kairos_spark.operators import profiling

    rng = random.Random(20260815)
    for trial in range(6):
        n_a, n_b = rng.randint(2, 4), rng.randint(2, 4)
        rows = []
        table = {}
        for i in range(n_a):
            for j in range(n_b):
                c = rng.randint(0, 9)
                table[(i, j)] = c
                rows += [(f"a{i}", f"b{j}")] * c
        if sum(table.values()) == 0 or not rows:
            continue
        rng.shuffle(rows)
        df = spark.createDataFrame(rows, "a string, b string")
        (got,) = profiling.cramers_v(df, "a", "b").collect()
        # exact quantized reference
        r = {i: sum(table[(i, j)] for j in range(n_b)) for i in range(n_a)}
        cc = {j: sum(table[(i, j)] for i in range(n_a)) for j in range(n_b)}
        n = sum(table.values())
        s = sum(
            (table[(i, j)] ** 2 * 10**12) // (r[i] * cc[j])
            for i in range(n_a)
            for j in range(n_b)
            if r[i] and cc[j] and table[(i, j)]
        )
        d = max(s - 10**12, 0)
        rows_used = sum(1 for i in r.values() if i)
        cols_used = sum(1 for j in cc.values() if j)
        k = min(rows_used - 1, cols_used - 1)
        assert got.n == n and got.n_rows == rows_used and got.n_cols == cols_used
        if k == 0:
            assert got.chi2 == 0.0 and got.cramers_v == 0.0
            continue
        # helper's round-half-up mirrored exactly in integers
        exp_chi2 = float((2 * 10**6 * n * d + 10**12) // (2 * 10**12)) / 1e6
        assert got.chi2 == exp_chi2, (trial, table)
        assert Fraction(n * d, 10**12) >= 0  # chi2 clamp held
        v = math.sqrt(d / (10**12 * k))
        assert abs(got.cramers_v - v) < 1.1e-6, (trial, table)


def test_kendall_tau_matches_exact_reference_fuzz(spark):
    import itertools
    import math
    import random

    from kairos_spark.operators import profiling

    rng = random.Random(20260815)
    rows, expected = [], {}
    for day in range(5):
        nh = rng.randint(2, 8)
        xs = [rng.randint(0, 4) for _ in range(nh)]
        ys = [rng.randint(0, 4) for _ in range(nh)]
        hours = sorted(rng.sample(range(24), nh))
        kept = [h for i, h in enumerate(hours) if xs[i] + ys[i] > 0]
        kx = [xs[i] for i, h in enumerate(hours) if xs[i] + ys[i] > 0]
        ky = [ys[i] for i, h in enumerate(hours) if xs[i] + ys[i] > 0]
        for i, h in enumerate(kept):
            base = day * 86400 + h * 3600
            rows += [("click", float(base + t)) for t in range(kx[i])]
            rows += [("view", float(base + 100 + t)) for t in range(ky[i])]
        C = D = tx = ty = 0
        for i, j in itertools.combinations(range(len(kept)), 2):
            dx, dy = kx[j] - kx[i], ky[j] - ky[i]
            C += dx * dy > 0
            D += dx * dy < 0
            tx += dx == 0
            ty += dy == 0
        n0 = len(kept) * (len(kept) - 1) // 2
        if len(kept) >= 2:
            expected[day] = (len(kept), C, D, n0 - tx, n0 - ty)
    df = spark.createDataFrame(rows, "event_type string, ts_sec double").select(
        "event_type", F.timestamp_seconds("ts_sec").alias("ts")
    )
    out = {r.day: r for r in profiling.kendall_tau(df).collect()}
    assert set(out) == set(expected)
    for day, (nh, C, D, px, py) in expected.items():
        r = out[day]
        assert (r.n_hours, r.concordant, r.discordant) == (nh, C, D), day
        if px > 0 and py > 0:
            assert abs(r.tau_b - (C - D) / math.sqrt(px * py)) < 1.1e-6, day
        else:
            assert r.tau_b == 0.0


# --- embedding_anisotropy ---


def test_embedding_anisotropy_collapsed_direction(spark):
    import random

    rng = random.Random(7)
    # all variance on one axis: top eigenvalue ~= trace, share ~= 1
    docs = spark.createDataFrame(
        [Row(vec_id=i, embedding=[rng.uniform(-5, 5), 0.0, 0.0])
         for i in range(60)]
    )
    (r,) = similarity.embedding_anisotropy(docs).collect()
    assert r.n == 60 and r.dim == 3
    assert r.top_share > 0.999
    assert abs(r.top_eigenvalue - r.trace_var) < 1e-4


def test_embedding_anisotropy_isotropic_share(spark):
    import itertools

    # symmetric +-1 cube corners: covariance = identity -> every
    # eigenvalue equals 1, trace = dim, share = 1/dim
    pts = list(itertools.product([-1.0, 1.0], repeat=3))
    docs = spark.createDataFrame(
        [Row(vec_id=i, embedding=list(p)) for i, p in enumerate(pts)]
    )
    (r,) = similarity.embedding_anisotropy(docs).collect()
    assert r.trace_var == 3.0
    assert abs(r.top_eigenvalue - 1.0) < 1e-9
    assert abs(r.top_share - 1 / 3) < 1e-6


# --- doc_gini ---


def test_doc_gini_equal_and_concentrated(spark):
    # equal token masses -> G = 0
    eq = spark.createDataFrame(
        [Row(doc_id=i, text="a b c d", source="eq") for i in range(5)]
    )
    (r,) = text.doc_gini(eq).collect()
    assert r.gini_tokens == 0.0 and r.n_docs == 5 and r.n_tokens == 20
    # one doc owns nearly everything: G = 2*(1*0+...+0+n*T)/(n*T)-(n+1)/n
    # with masses (0,0,0,0,T): G = 2*5/5 - 6/5 = 0.8
    conc = spark.createDataFrame(
        [Row(doc_id=i, text="", source="c") for i in range(4)]
        + [Row(doc_id=9, text="w " * 100, source="c")]
    )
    (r,) = text.doc_gini(conc).collect()
    assert r.gini_tokens == 0.8 and r.n_tokens == 100


def test_doc_gini_zero_token_source_sentinel(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="", source="empty"),
         Row(doc_id=2, text="  ", source="empty")]
    )
    (r,) = text.doc_gini(docs).collect()
    assert r.n_tokens == 0 and r.gini_tokens == 0.0


# --- source_effect_size (Cohen's d of token length per source) ---


def test_source_effect_size_known_value(spark):
    # A: lengths (2, 4), rest: (6, 8). means 3 vs 7; pooled
    # SS = 120 - 36/2 - 196/2 = 4, var = 4/(4-2) = 2,
    # d = -4/sqrt(2) = -2.8284271... -> -2.828427
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a b", source="A"),
         Row(doc_id=2, text="a b c d", source="A"),
         Row(doc_id=3, text="a b c d e f", source="B"),
         Row(doc_id=4, text="a b c d e f g h", source="B")]
    )
    out = {r.grp: r for r in text.source_effect_size(docs).collect()}
    assert out["A"].cohens_d == -2.828427
    assert out["B"].cohens_d == 2.828427
    assert out["A"].mean_tokens == 3.0 and out["B"].mean_tokens == 7.0
    assert out["A"].n_docs == 2


def test_source_effect_size_sentinels(spark):
    # single source: no "rest" to compare against -> 0.0
    one = spark.createDataFrame(
        [Row(doc_id=1, text="a b", source="only"),
         Row(doc_id=2, text="a b c", source="only"),
         Row(doc_id=3, text="a", source="only")]
    )
    (r,) = text.source_effect_size(one).collect()
    assert r.cohens_d == 0.0
    # zero pooled variance (all docs the same length) -> 0.0
    flat = spark.createDataFrame(
        [Row(doc_id=1, text="a b", source="A"),
         Row(doc_id=2, text="c d", source="A"),
         Row(doc_id=3, text="e f", source="B"),
         Row(doc_id=4, text="g h", source="B")]
    )
    for r in text.source_effect_size(flat).collect():
        assert r.cohens_d == 0.0


def test_source_effect_size_clamps_degenerate_blowup(spark):
    # near-constant lengths vs a far-off singleton: |d| blows past the
    # bridge's agreement bound and must clamp to exactly +/-1000.0
    rows = [Row(doc_id=i, text="w " * 10000, source="A") for i in range(2)]
    rows.append(Row(doc_id=9, text="w " * 10001, source="A"))
    rows.append(Row(doc_id=10, text="w", source="B"))
    out = {r.grp: r for r in text.source_effect_size(spark.createDataFrame(rows)).collect()}
    assert out["A"].cohens_d == 1000.0
    assert out["B"].cohens_d == -1000.0


# --- code_detect (structural code-likeness router) ---


def test_code_detect_flags_code_and_not_prose(spark):
    code = (
        "def add(a, b):\n"
        "    return a == b\n"
        "\n"
        "import os\n"
        "def main():\n"
        "    x = add(1, 2);\n"
        "    return x\n"
    )
    prose = (
        "The quick brown fox jumps over the lazy dog. It was a bright "
        "cold day in April and the clocks were striking thirteen."
    )
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=code, source="repo"),
         Row(doc_id=2, text=code, source="repo"),
         Row(doc_id=3, text=prose, source="web"),
         Row(doc_id=4, text=prose, source="web")]
    )
    out = {r.grp: r for r in text.code_detect(docs).collect()}
    assert out["repo"].code_docs == 2 and out["repo"].code_frac == 1.0
    assert out["web"].code_docs == 0 and out["web"].code_frac == 0.0
    assert out["repo"].mean_score >= 3.0 and out["web"].mean_score <= 1.0


def test_code_detect_crlf_and_tab_indent(spark):
    # CRLF line endings must not break the line-ending punct rule, and
    # tab indentation counts as indent
    code = "void f() {\r\n\tx = 1;\r\n\treturn;\r\n}\r\n"
    docs = spark.createDataFrame([Row(doc_id=1, text=code, source="s")])
    (r,) = text.code_detect(docs).collect()
    assert r.code_docs == 1


def test_code_detect_empty_doc_scores_zero(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="", source="s"), Row(doc_id=2, text="hello", source="s")]
    )
    (r,) = text.code_detect(docs).collect()
    assert r.code_docs == 0 and r.n_docs == 2


# --- cuped_adjustment (CUPED variance reduction, Deng et al. 2013) ---


def _cuped_events(spark, pre_vals, post_vals):
    # one pre event (t=0s) and one post event (t=100s) per user; the
    # midpoint boundary lands at 50s
    import datetime as dt

    rows = []
    for u, (xv, yv) in enumerate(zip(pre_vals, post_vals), start=1):
        rows.append(Row(ts=dt.datetime(2024, 1, 1, 0, 0, 0), user_id=u, value=float(xv)))
        rows.append(Row(ts=dt.datetime(2024, 1, 1, 0, 1, 40), user_id=u, value=float(yv)))
    return spark.createDataFrame(rows)


def test_cuped_perfect_covariate_collapses_to_global_mean(spark):
    from kairos_spark.operators import profiling

    # Y identical to X per user: theta = 1, rho2 = 1, and every
    # variant's adjusted mean equals the GLOBAL post mean
    vals = [float(v) for v in (1, 2, 3, 4, 5, 6, 7, 8, 11, 12, 13, 14, 15, 16, 17, 18)]
    ev = _cuped_events(spark, vals, vals)
    out = profiling.cuped_adjustment(ev).collect()
    assert len(out) >= 1
    g = round(sum(vals) / len(vals), 6)
    for r in out:
        assert r.theta == 1.0 and r.rho2 == 1.0
        assert abs(r.adj_mean - g) < 5e-7


def test_cuped_zero_covariate_variance_is_raw_readout(spark):
    from kairos_spark.operators import profiling

    # constant pre-period spend: var(X) = 0 -> theta 0, adj == raw
    pre = [5.0] * 12
    post = [float(v) for v in range(1, 13)]
    out = profiling.cuped_adjustment(_cuped_events(spark, pre, post)).collect()
    for r in out:
        assert r.theta == 0.0 and r.rho2 == 0.0
        assert r.adj_mean == r.raw_mean


# --- cluster_diameter (transitive-chaining audit) ---


def test_cluster_diameter_detects_chaining(spark):
    import random

    # B overlaps A (first half) and C (second half); A and C share
    # nothing -> the CC cluster {A,B,C} holds one transitively-chained
    # pair whose exact Jaccard sits below the 0.2 LSH threshold
    random.seed(7)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet", "kilo", "lima", "mike",
             "november", "oscar", "papa", "quebec", "romeo", "sierra",
             "tango"]
    s1 = " ".join(random.choice(words) for _ in range(60))
    s2 = " ".join(random.choice(words) for _ in range(60))
    d = spark.createDataFrame(
        [Row(doc_id=1, text=s1),
         Row(doc_id=2, text=s1 + " " + s2),
         Row(doc_id=3, text=s2),
         Row(doc_id=10, text="unrelated " * 30)]
    )
    (r,) = dedup.cluster_diameter(d, n=8, num_hashes=32, bands=16,
                                  threshold=0.2).collect()
    assert r.size == 3 and r.n_clusters == 1 and r.n_pairs == 3
    assert r.chained_pairs == 1 and r.chained_frac == 0.333333
    assert r.min_sim < 0.2 <= r.mean_sim


def test_cluster_diameter_exact_dups_not_chained(spark):
    t = "the quick brown fox jumps over the lazy dog again and again"
    d = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i in range(1, 4)]
        + [Row(doc_id=9, text="completely different standalone text here")]
    )
    (r,) = dedup.cluster_diameter(d).collect()
    assert r.size == 3 and r.n_pairs == 3 and r.chained_pairs == 0
    assert r.min_sim == 1.0 and r.mean_sim == 1.0 and r.chained_frac == 0.0


# --- hll_union_overlap (mergeable-sketch inclusion-exclusion) ---


def test_hll_union_overlap_exact_and_estimates(spark):
    from kairos_spark.operators import sketches

    # groups A and B share users 100..149; A has 100..199, B has 50..149
    rows = [Row(g="A", v=u) for u in range(100, 200)]
    rows += [Row(g="B", v=u) for u in range(50, 150)]
    out = sketches.hll_union_overlap(
        spark.createDataFrame(rows), "g", "v", p=8
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.ga, r.gb) == ("A", "B")
    assert r.exact_overlap == 50
    # p=8 at n=100 is in the small-range-corrected regime: estimates
    # land within ~15% of truth, and inclusion-exclusion is consistent
    assert abs(r.est_a - 100) < 15 and abs(r.est_b - 100) < 15
    assert abs(r.overlap_est - 50) < 25
    assert round(r.est_a + r.est_b - r.est_union - r.overlap_est, 4) == 0.0


def test_hll_union_overlap_disjoint_groups_zero_exact(spark):
    from kairos_spark.operators import sketches

    rows = [Row(g="A", v=u) for u in range(0, 80)]
    rows += [Row(g="B", v=u) for u in range(1000, 1080)]
    (r,) = sketches.hll_union_overlap(
        spark.createDataFrame(rows), "g", "v", p=8
    ).collect()
    assert r.exact_overlap == 0
    # the union of disjoint sketches estimates ~160; the residual is a
    # small number near zero (can be negative) — never -0.0 rendered
    assert abs(r.overlap_est) < 30
    assert str(r.overlap_est) != "-0.0"


# --- count_histogram_left (TPC-H Q13 shape) ---


def test_count_histogram_left_includes_zero_class(spark):
    from kairos_spark.operators import joins

    cust = spark.createDataFrame(
        [Row(k=1), Row(k=2), Row(k=3), Row(k=4)]
    )
    orders = spark.createDataFrame(
        [Row(ck=1, pri="HIGH"), Row(ck=1, pri="HIGH"), Row(ck=2, pri="LOW"),
         Row(ck=3, pri="HIGH"), Row(ck=9, pri="HIGH")]
    )
    out = {r.c_count: r.custdist for r in joins.count_histogram_left(
        cust, orders, "k", "ck", "c_count",
        right_filter=~F.col("pri").like("%LOW%"),
    ).collect()}
    # cust 1 -> 2 orders; cust 3 -> 1; cust 2 (filtered) and 4 -> 0;
    # order for unknown cust 9 must not create a row
    assert out == {2: 1, 1: 1, 0: 2}


# --- qte_deciles (quantile treatment effects) ---


def _md5_variant(u):
    import hashlib

    return int(hashlib.md5(str(u).encode()).hexdigest()[:11], 16) % 2


def test_qte_deciles_matches_exact_reference(spark):
    import datetime as dt
    from fractions import Fraction

    from kairos_spark.operators import profiling

    # 40 users, one event each, value = u * 0.25 (dyadic cents-exact)
    rows = [
        Row(event_id=u, ts=dt.datetime(2024, 1, 1), user_id=u,
            value=u * 0.25)
        for u in range(1, 41)
    ]
    out = {r.decile: r for r in profiling.qte_deciles(
        spark.createDataFrame(rows)).collect()}
    by_variant = {0: [], 1: []}
    for u in range(1, 41):
        by_variant[_md5_variant(u)].append(u * 25)  # cents
    for v in by_variant.values():
        v.sort()

    def dec_q(vals, a):
        n = len(vals)
        idx = (n - 1) * a
        lo, k = divmod(idx, 10)
        hi = vals[lo + 1] if lo + 1 < n else vals[lo]
        num = 10 * vals[lo] + k * (hi - vals[lo])
        q = Fraction(num, 1000)
        # round-half-away-from-zero at 6 decimals
        scaled = q * 10**6
        r = (scaled.numerator * 2 + scaled.denominator) // (2 * scaled.denominator)
        return r / 10**6

    for a in range(1, 10):
        r = out[a]
        assert r.q_control == dec_q(by_variant[0], a)
        assert r.q_treat == dec_q(by_variant[1], a)
        assert r.n_control == len(by_variant[0])
        assert r.n_treat == len(by_variant[1])


def test_qte_deciles_negative_values_signed(spark):
    import datetime as dt

    from kairos_spark.operators import profiling

    rows = [
        Row(event_id=u, ts=dt.datetime(2024, 1, 1), user_id=u,
            value=-10.0 if u % 2 else 10.0)
        for u in range(1, 21)
    ]
    out = profiling.qte_deciles(spark.createDataFrame(rows)).collect()
    assert len(out) == 9
    for r in out:
        assert r.q_control in (-10.0, 10.0) or -10.0 < r.q_control < 10.0
        assert str(r.qte) != "-0.0" and str(r.q_treat) != "-0.0"


# --- partial_corr (first-order partial correlation) ---


def test_partial_corr_matches_exact_reference_fuzz(spark):
    import math
    import random

    from kairos_spark.operators import profiling

    random.seed(13)
    rows = []
    ref = []
    for i in range(40):
        z = random.randint(1, 50)
        x = 2 * z + random.randint(0, 10)
        y = z + random.randint(0, 20)
        rows.append(Row(g="s", x=x, y=y, z=z))
        ref.append((x, y, z))
    (r,) = profiling.partial_corr(
        spark.createDataFrame(rows), "g", "x", "y", "z"
    ).collect()

    def corr(ax, ay):
        n = len(ax)
        sx, sy = sum(ax), sum(ay)
        sxy = sum(a * b for a, b in zip(ax, ay))
        sxx = sum(a * a for a in ax)
        syy = sum(b * b for b in ay)
        return (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )

    xs = [t[0] for t in ref]; ys = [t[1] for t in ref]; zs = [t[2] for t in ref]
    rxy, rxz, ryz = corr(xs, ys), corr(xs, zs), corr(ys, zs)
    want = (rxy - rxz * ryz) / math.sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz))
    assert abs(r.partial_xy_z - want) < 2e-6
    assert abs(r.r_xy - rxy) < 2e-6


def test_partial_corr_perfect_confound_sentinels(spark):
    from kairos_spark.operators import profiling

    # x == z exactly: r_xz = 1, the partial's denominator is 0 -> 0.0
    rows = [Row(g="s", x=i, y=i % 3, z=i) for i in range(1, 21)]
    (r,) = profiling.partial_corr(
        spark.createDataFrame(rows), "g", "x", "y", "z"
    ).collect()
    assert r.r_xz == 1.0 and r.partial_xy_z == 0.0


# --- t_closeness (EMD skewness-attack audit) ---


def test_t_closeness_known_emd(spark):
    from fractions import Fraction

    from kairos_spark.operators import pii

    # class A: ranks (1,1,2,2); class B: ranks (3,3,3,3).
    # global cum fractions at i=1: 2/8, i=2: 4/8.
    # A cums: 2/4, 4/4 -> |2/4-2/8| + |4/4-4/8| = 1/4 + 1/2 = 3/4; /2 -> 3/8
    # B cums: 0, 0 -> 1/4 + 1/2 = 3/4; /2 -> 3/8
    rows = [Row(q="A", r=1), Row(q="A", r=1), Row(q="A", r=2), Row(q="A", r=2),
            Row(q="B", r=3), Row(q="B", r=3), Row(q="B", r=3), Row(q="B", r=3)]
    out = {r.q: r for r in pii.t_closeness(
        spark.createDataFrame(rows), ["q"], "r", 3,
        thresholds=[(1, 5)]).collect()}
    want = round(float(Fraction(3, 8)), 6)
    assert out["A"].t_emd == want and out["B"].t_emd == want
    assert out["A"].max_t == want
    # every record sits in a class with t > 1/5
    assert out["A"].pct_gt_1_5 == 1.0


def test_t_closeness_identical_distribution_is_zero(spark):
    from kairos_spark.operators import pii

    # both classes mirror the corpus distribution exactly -> t = 0
    rows = []
    for q in ("A", "B"):
        rows += [Row(q=q, r=1), Row(q=q, r=2), Row(q=q, r=2), Row(q=q, r=3)]
    out = pii.t_closeness(
        spark.createDataFrame(rows), ["q"], "r", 3, thresholds=[(1, 5)]
    ).collect()
    for r in out:
        assert r.t_emd == 0.0 and r.max_t == 0.0 and r.pct_gt_1_5 == 0.0


# --- degree_assortativity (Newman r, exact closed form) ---


def test_assortativity_star_is_minus_one(spark):
    from kairos_spark.operators import graph

    edges = spark.createDataFrame(
        [Row(a=1, b=2), Row(a=1, b=3), Row(a=1, b=4)]
    )
    (r,) = graph.degree_assortativity(edges).collect()
    assert r.assortativity == -1.0
    assert r.n_nodes == 4 and r.n_edges == 3 and r.mean_degree == 1.5


def test_assortativity_regular_graph_sentinels(spark):
    from kairos_spark.operators import graph

    # 4-cycle: every degree 2 -> zero stub-degree variance -> 0.0
    edges = spark.createDataFrame(
        [Row(a=1, b=2), Row(a=2, b=3), Row(a=3, b=4), Row(a=1, b=4)]
    )
    (r,) = graph.degree_assortativity(edges).collect()
    assert r.assortativity == 0.0 and r.n_edges == 4


# --- chunk_overlap_profile (partial-dup pair histogram) ---


def test_chunk_overlap_partial_and_full_containment(spark):
    # 8-token chunks. doc1 = A+B (2 chunks), doc2 = A+C (2 chunks),
    # doc3 = A exactly (1 chunk, fully contained in both)
    A = " ".join(f"a{i}" for i in range(8))
    B = " ".join(f"b{i}" for i in range(8))
    C = " ".join(f"c{i}" for i in range(8))
    d = spark.createDataFrame(
        [Row(doc_id=1, text=A + " " + B),
         Row(doc_id=2, text=A + " " + C),
         Row(doc_id=3, text=A)]
    )
    out = {r.bucket: r for r in dedup.chunk_overlap_profile(
        d, chunk_tokens=8, max_occ=50, min_shared=1).collect()}
    # (1,2): 1 shared of min(2,2) -> bucket 5; (1,3) and (2,3): 1 of
    # min(2,1) -> bucket 10 (full containment of doc3)
    assert out[5].n_pairs == 1 and out[10].n_pairs == 2
    assert out[10].n_docs == 3  # docs 1, 2, 3 all touch bucket 10


def test_chunk_overlap_stop_digest_cap(spark):
    # a chunk shared by MORE than max_occ docs is stop-listed -> no pairs
    A = " ".join(f"a{i}" for i in range(8))
    d = spark.createDataFrame(
        [Row(doc_id=i, text=A) for i in range(1, 6)]
    )
    out = dedup.chunk_overlap_profile(
        d, chunk_tokens=8, max_occ=4, min_shared=1
    ).collect()
    assert out == []


# --- link_density (URL/domain extraction audit) ---


def test_link_density_counts_and_domains(spark):
    d = spark.createDataFrame(
        [Row(doc_id=1, source="s",
             text="see https://a.com/x and https://a.com/y plus http://b.org"),
         Row(doc_id=2, source="s", text="no links at all here"),
         Row(doc_id=3, source="s", text="HTTPS://C.NET stays unmatched ftp://d")]
    )
    (r,) = text.link_density(d).collect()
    # doc 1: 2 links (a.com twice -> 1 domain) + b.org; doc 3: scheme
    # is case-sensitive in the pattern, ftp excluded
    assert r.n_links == 3 and r.link_docs == 1 and r.n_docs == 3
    assert r.n_domains == 2
    assert r.link_doc_frac == round(1 / 3, 6)


def test_link_density_no_links_source(spark):
    d = spark.createDataFrame([Row(doc_id=1, source="s", text="plain")])
    (r,) = text.link_density(d).collect()
    assert r.n_links == 0 and r.n_domains == 0 and r.links_per_kchar == 0.0


# --- markup_stats (markdown structure audit) ---


def test_markup_stats_counts_signals(spark):
    md = (
        "# Heading\n"
        "plain prose line\n"
        "- bullet\n"
        "* star bullet\n"
        "3. numbered\n"
        "| a | b |\n"
        "> quote\n"
        "```\ncode here\n```\n"
    )
    d = spark.createDataFrame(
        [Row(doc_id=1, source="s", text=md),
         Row(doc_id=2, source="s", text="just prose, no markup at all")]
    )
    (r,) = text.markup_stats(d).collect()
    assert r.heading_lines == 1 and r.list_lines == 3
    assert r.table_lines == 1 and r.quote_lines == 1
    assert r.code_fences == 1
    assert r.markup_docs == 1 and r.n_docs == 2 and r.markup_frac == 0.5


def test_markup_stats_single_fence_not_counted_as_pair(spark):
    d = spark.createDataFrame(
        [Row(doc_id=1, source="s", text="opening ``` but never closed")]
    )
    (r,) = text.markup_stats(d).collect()
    assert r.code_fences == 0 and r.markup_docs == 0


# --- dup_degree_spectrum (candidate-graph hub detector) ---


def test_dup_degree_spectrum_counts(spark):
    # star: node 1 pairs with 2,3,4 -> one degree-3 node, three
    # degree-1 nodes; plus an isolated pair 10-11 -> two more degree-1
    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=1, id_b=3), Row(id_a=1, id_b=4),
         Row(id_a=10, id_b=11)]
    )
    out = {r.degree: r.n_nodes for r in dedup.dup_degree_spectrum(pairs).collect()}
    assert out == {3: 1, 1: 5}


# --- language_mix (mixed-language doc detector) ---


def test_language_mix_detects_banner_over_foreign_body(spark):
    en = "the quick brown fox and the lazy dog that is for with us"
    de = "der hund und die katze das ist nicht mit ein problem hier"
    d = spark.createDataFrame(
        [Row(doc_id=1, source="s", text=en + "\n" + de),
         Row(doc_id=2, source="s", text=en + "\n" + en),
         Row(doc_id=3, source="s", text="short")]
    )
    (r,) = text.language_mix(d).collect()
    assert r.n_docs == 3 and r.multi_seg_docs == 2
    assert r.mixed_docs == 1
    assert r.mixed_frac == round(1 / 3, 6)


def test_language_mix_und_segments_not_mixed(spark):
    # numeric/jargon lines predict 'und' and must not count as a language
    d = spark.createDataFrame(
        [Row(doc_id=1, source="s",
             text="the cat and the dog is here\n111 222 333 444 555 666")]
    )
    (r,) = text.language_mix(d).collect()
    assert r.mixed_docs == 0 and r.multi_seg_docs == 1


# --- brier_decomposition (Murphy 1973) ---


def test_brier_decomposition_identity_and_perfect_score(spark):
    from kairos_spark.operators import profiling

    # perfectly calibrated, perfectly sharp: score 0 for negatives,
    # scale for positives -> brier 0, REL 0, RES == UNC
    rows = [Row(score_cents=0, is_en=0)] * 30 + [Row(score_cents=100, is_en=1)] * 10
    (r,) = profiling.brier_decomposition(
        spark.createDataFrame(rows), "score_cents", "is_en", scale=100, n_bins=10
    ).collect()
    assert r.brier == 0.0 and r.reliability == 0.0
    assert r.uncertainty == round(0.25 * 0.75, 6)
    assert r.resolution == r.uncertainty
    # Murphy identity holds on the rounded components (quantized terms
    # agree to 6dp here)
    assert round(r.reliability - r.resolution + r.uncertainty, 6) == r.brier


def test_brier_decomposition_uninformative_score(spark):
    from kairos_spark.operators import profiling

    # constant score in one bin: RES = 0, REL = (p - o)^2
    rows = [Row(score_cents=50, is_en=1)] * 25 + [Row(score_cents=50, is_en=0)] * 75
    (r,) = profiling.brier_decomposition(
        spark.createDataFrame(rows), "score_cents", "is_en", scale=100, n_bins=10
    ).collect()
    assert r.resolution == 0.0
    assert r.reliability == round((0.5 - 0.25) ** 2, 6)
    assert r.uncertainty == round(0.25 * 0.75, 6)


# --- forecast_mase (scaled forecast error) ---


def test_forecast_mase_known_ratio(spark):
    import datetime as dt

    from kairos_spark.operators import windows

    # hourly counts over 3 days with period-24 pattern plus one bump:
    # seasonal-naive nails the repeats, persistence pays the diurnal
    # swings -> MASE well below 1
    rows = []
    base = dt.datetime(2024, 1, 1)
    for h in range(72):
        n = 3 if (h % 24) < 12 else 1
        if h == 50:
            n = 5
        for i in range(n):
            rows.append(Row(ts=base + dt.timedelta(hours=h, minutes=i),
                            user_id=1, event_type="a"))
    (r,) = windows.forecast_mase(spark.createDataFrame(rows)).collect()
    assert r.n_naive == 71 and r.n_seasonal == 48
    assert 0.0 < r.mase < 1.0


def test_forecast_mase_perfect_persistence_sentinels(spark):
    import datetime as dt

    from kairos_spark.operators import windows

    # constant series: the persistence baseline has zero error -> -1.0
    rows = [Row(ts=dt.datetime(2024, 1, 1) + dt.timedelta(hours=h),
                user_id=1, event_type="a") for h in range(30)]
    (r,) = windows.forecast_mase(spark.createDataFrame(rows)).collect()
    assert r.mase == -1.0


# --- engine-parity fuzz: exact DECIMAL floor division (pmod strip) ---


def test_decimal_floordiv_parity_fuzz(spark):
    """The brier_decomposition bin terms rely on Spark's
    (x - pmod(x, y)) / y over DECIMAL(38,0) equaling DuckDB's HUGEINT
    x // y for non-negative x. Fuzz the two engines head to head at
    the magnitudes the operator produces (d^2 * 1e12 up to ~1e27)."""
    import random

    import duckdb

    random.seed(41)
    cases = [(random.randint(0, 3 * 10**7) ** 2 * 10**12,
              random.randint(1, 10**6)) for _ in range(60)]
    cases += [(0, 5), (10**27, 1), (7, 3), (10**27 + 1, 10**6)]
    rows = [Row(i=i, x=str(x), y=str(y)) for i, (x, y) in enumerate(cases)]
    sdf = spark.createDataFrame(rows).select(
        "i",
        (
            (F.col("x").cast("decimal(38,0)")
             - F.pmod(F.col("x").cast("decimal(38,0)"), F.col("y").cast("decimal(38,0)")))
            / F.col("y").cast("decimal(38,0)")
        ).cast("decimal(38,0)").cast("string").alias("q"),
    )
    got = {r.i: int(r.q) for r in sdf.collect()}
    con = duckdb.connect()
    for i, (x, y) in enumerate(cases):
        (want,) = con.execute(
            f"SELECT {x}::HUGEINT // {y}::HUGEINT"
        ).fetchone()
        assert got[i] == int(want) == x // y, (i, x, y, got[i], want)
