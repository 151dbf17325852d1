"""Operator tests: dedup (exact/minhash/simhash/jaccard), similarity
(brute force vs LSH/IVF recall), text analysis, multimodal plumbing."""

import math

import pytest
from pyspark.sql import functions as F

from kairos_spark.operators import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog and runs away fast"),
        (1, "the quick brown fox jumps over the lazy dog and runs away quickly"),
        (2, "completely different content about spark dataframes and aggregation"),
        (3, "the quick brown fox jumps over the lazy dog and runs away fast"),  # exact dup of 0
        (4, "numbers 123 and punctuation!!! mixed, with words."),
        (5, "der hund läuft schnell und die katze ist nicht da mit ein"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def vecs(spark):
    import random

    rnd = random.Random(7)
    rows = []
    for i in range(60):
        base = [rnd.gauss(0, 1) for _ in range(8)]
        rows.append((i, [float(x) for x in base]))
    # vec 59 = near-copy of vec 0
    rows[59] = (59, [x + 0.01 for x in rows[0][1]])
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


# ------------------------------------------------------------------ dedup


def test_exact_dedup(docs):
    groups = dedup.exact_dup_groups(docs).collect()
    assert len(groups) == 1
    assert groups[0]["n_docs"] == 2 and groups[0]["keep_id"] == 0
    kept = sorted(r["doc_id"] for r in dedup.exact_dedup(docs).collect())
    assert kept == [0, 1, 2, 4, 5]


def test_ngram_jaccard_pairs(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, n=5, threshold=0.5).collect()
    }
    assert (0, 3) in pairs and pairs[(0, 3)] == 1.0  # exact dup
    assert (0, 1) in pairs and 0.5 <= pairs[(0, 1)] < 1.0  # near dup
    assert (0, 2) not in pairs


def test_minhash_estimates_jaccard(docs):
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, n=5, threshold=0.05).collect()
    }
    est = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in dedup.minhash_lsh_pairs(
            docs, n=5, num_hashes=128, bands=32, threshold=0.3
        ).collect()
    }
    assert (0, 3) in est and est[(0, 3)] == 1.0
    assert (0, 1) in est
    # 128-hash estimate within 0.15 of exact
    assert abs(est[(0, 1)] - exact[(0, 1)]) < 0.15


def test_minhash_signature_shape(docs):
    sig = dedup.minhash_signatures(docs, n=5, num_hashes=16).collect()
    assert all(len(r["sig"]) == 16 for r in sig)
    by_id = {r["doc_id"]: r["sig"] for r in sig}
    assert by_id[0] == by_id[3]  # identical docs → identical signatures
    assert by_id[0] != by_id[2]


def test_simhash(docs):
    fp = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert fp[0] == fp[3]
    ham01 = bin(fp[0] ^ fp[1]).count("1")
    ham02 = bin(fp[0] ^ fp[2]).count("1")
    assert ham01 < ham02  # near-dup closer than unrelated


def test_simhash_near_pairs(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.simhash_near_pairs(docs, max_hamming=10).collect()}
    assert (0, 3) in pairs


# -------------------------------------------------------------- similarity


def _brute_top(vecs_rows, q, k):
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    scored = sorted(
        ((round(cos(v, q), 6), i) for i, v in vecs_rows), key=lambda t: (-t[0], t[1])
    )
    return [i for _, i in scored[:k]]


def test_cosine_topk_exact(vecs):
    rows = [(r["vec_id"], r["embedding"]) for r in vecs.collect()]
    q = dict(rows)[0]
    expected = _brute_top(rows, q, 5)
    got = [r["vec_id"] for r in similarity.cosine_topk(vecs, q, k=5).collect()]
    assert got == expected
    assert got[0] == 0 and 59 in got[:2]  # self first, near-copy next


def test_lsh_topk_recall(vecs):
    rows = [(r["vec_id"], r["embedding"]) for r in vecs.collect()]
    q = dict(rows)[0]
    exact = set(_brute_top(rows, q, 5))
    got = {
        r["vec_id"]
        for r in similarity.lsh_topk(vecs, q, k=5, planes=8, probe_hamming=3).collect()
    }
    # multi-probe LSH at these settings should recover most of top-5
    assert len(exact & got) >= 3


def test_ivf_topk_finds_near_copy(vecs):
    rows = [(r["vec_id"], r["embedding"]) for r in vecs.collect()]
    q = dict(rows)[0]
    got = [r["vec_id"] for r in similarity.ivf_topk(vecs, q, k=3, nlist=8, nprobe=4).collect()]
    assert 0 in got and 59 in got


def test_cosine_self_pairs(vecs):
    pairs = {(r["id_a"], r["id_b"]): r["cosine"] for r in similarity.cosine_self_pairs(vecs, 0.99).collect()}
    assert (0, 59) in pairs


# -------------------------------------------------------------------- text


def test_text_stats(docs):
    stats = {r["doc_id"]: r for r in text.text_stats(docs).collect()}
    r0 = stats[0]
    assert r0["n_words"] == 13
    assert r0["n_chars"] == len("the quick brown fox jumps over the lazy dog and runs away fast")
    assert stats[4]["digit_ratio"] > 0
    assert stats[4]["punct_ratio"] > 0
    assert r0["stopword_ratio"] > 0


def test_language_id(docs):
    pred = {r["doc_id"]: r["lang_pred"] for r in text.language_id(docs).collect()}
    assert pred[0] == "en"
    assert pred[5] == "de"


def test_quality_score_range(docs):
    scores = [r["quality"] for r in text.quality_score(docs).collect()]
    assert all(0.0 <= s <= 1.0 for s in scores)


def test_fingerprint_stability(docs):
    fp = {r["doc_id"]: r["fingerprint"] for r in text.fingerprint(docs).collect()}
    assert fp[0] == fp[3]
    assert fp[0] != fp[2]


# -------------------------------------------------------------- multimodal


def test_multimodal_features(docs):
    media = multimodal.attach_media(docs)
    feats = {r["media_id"]: r for r in multimodal.extract_features(media).collect()}
    assert len(feats) == 6
    r0 = feats[0]
    assert r0["n_bytes"] == len(docs.collect()[0]["text"].encode())
    assert len(r0["features"]) == multimodal.FEATURE_DIM
    assert abs(sum(r0["features"]) - 1.0) < 1e-9  # L1-normalized histogram


def test_multimodal_strict_raises(docs):
    media = multimodal.attach_media(docs)
    with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        multimodal.extract_features(media, strict=True).collect()


def test_resize_and_frames(docs):
    media = multimodal.attach_media(docs)
    resized = multimodal.resize_stub(media, max_dim=16).collect()
    assert all(r["width"] <= 16 and r["height"] <= 16 for r in resized)
    frames = multimodal.frame_sample_stub(media, every_n_bytes=16).collect()
    n0 = [r for r in frames if r["media_id"] == 0]
    text0 = docs.collect()[0]["text"]
    assert len(n0) == (len(text0.encode()) - 1) // 16 + 1


def test_frame_sample_frames_bytes_not_codepoints(spark):
    # 300 two-byte chars = 600 bytes -> 3 frames at 256B; 300 ASCII
    # chars -> 2. An oracle counting codepoints would say 2 for both
    # (the frame_sample divergence the r7 adversarial stress doc hit).
    probe = spark.createDataFrame(
        [(1, "ö" * 300), (2, "a" * 300)], "doc_id long, text string"
    )
    media = multimodal.attach_media(probe)
    frames = multimodal.frame_sample_stub(media, every_n_bytes=256)
    got = {
        r["media_id"]: r["cnt"]
        for r in frames.groupBy("media_id").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == {1: 3, 2: 2}


def test_connected_components_chain_and_clique(spark):
    from kairos_spark.operators import dedup

    # chain 1-2-3-4 (diameter 3), clique {10,11,12}, isolated pair {20,21}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12), (20, 21)],
        "id_a long, id_b long",
    )
    out = {r["node"]: r["cluster_id"] for r in dedup.connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_long_chain_converges(spark):
    from kairos_spark.operators import dedup

    # a 12-node path needs ~11 HashMin rounds; must still converge
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    out = {r["node"]: r["cluster_id"] for r in dedup.connected_components(pairs).collect()}
    assert set(out.values()) == {0}
    assert len(out) == 13


def test_connected_components_shortcut_log_rounds(spark):
    # pointer jumping converges a 300-node path in O(log d) rounds —
    # max_iter=12 would be hopeless for plain HashMin (needs ~299)
    from kairos_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(300)], "id_a long, id_b long"
    )
    out = {
        r["node"]: r["cluster_id"]
        for r in dedup.connected_components(pairs, max_iter=12).collect()
    }
    assert set(out.values()) == {0}
    assert len(out) == 301


def test_connected_components_raises_when_unconverged(spark):
    # diameter > max_iter would silently mislabel — must raise instead
    import pytest
    from kairos_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "id_a long, id_b long"
    )
    # force the distributed loop (the local union-find finish has no
    # convergence limit to hit)
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(
            pairs, max_iter=1, local_finish_max_edges=0
        ).collect()


# ----------------------------------- sampling / repetition / entropy


def test_hash_split_deterministic_and_complete(spark):
    from kairos_spark.operators import sampling

    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    out = sampling.hash_split(df).groupBy("split").count().collect()
    got = {r["split"]: r["count"] for r in out}
    assert set(got) == {"train", "val", "test"}
    assert sum(got.values()) == 1000
    # 90/5/5 within loose tolerance, and rerun is bit-identical
    assert 850 <= got["train"] <= 950
    again = {r["split"]: r["count"] for r in sampling.hash_split(df).groupBy("split").count().collect()}
    assert again == got
    # salt derives an independent family
    salted = sampling.hash_split(df, salt="v2")
    diff = sampling.hash_split(df).alias("a").join(salted.alias("b"), "doc_id").where(
        "a.split != b.split").count()
    assert diff > 0


def test_hash_split_growth_stability(spark):
    # adding rows never reshuffles existing assignments
    from kairos_spark.operators import sampling

    small = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    big = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    a = {r["doc_id"]: r["split"] for r in sampling.hash_split(small).collect()}
    b = {r["doc_id"]: r["split"] for r in sampling.hash_split(big).collect()}
    assert all(b[k] == v for k, v in a.items())


def test_stratified_sample_fractions(spark):
    from kairos_spark.operators import sampling

    rows = [(i, "en" if i % 2 else "de") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = sampling.stratified_sample(df, {"en": 0.1, "de": 1.0}, strata_col="lang")
    got = {r["lang"]: r["count"] for r in kept.groupBy("lang").count().collect()}
    assert got["de"] == 1000          # fraction 1.0 keeps everything
    assert 50 <= got["en"] <= 150     # ~10%
    none_kept = sampling.stratified_sample(df, {}, strata_col="lang")
    assert none_kept.count() == 0     # default_fraction 0


def test_repetition_stats_known_doc(spark):
    from kairos_spark.operators import text

    # "a b c a b c a b c" → 7 word-3-grams, 3 distinct ("a b c" ×3,
    # "b c a" ×2, "c a b" ×2) → dup_frac 4/7, top_share 3/7
    df = spark.createDataFrame([(1, "a b c a b c a b c")], "doc_id long, text string")
    r = text.repetition_stats(df, n=3).collect()[0]
    assert (r["n_grams"], r["n_distinct"]) == (7, 3)
    assert r["dup_frac"] == round(4 / 7, 6)
    assert r["top_share"] == round(3 / 7, 6)


def test_word_entropy_known_values(spark):
    import math
    from kairos_spark.operators import text

    df = spark.createDataFrame(
        [(1, "x x x x"), (2, "a b c d")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["entropy"] for r in text.word_entropy(df).collect()}
    assert got[1] == 0.0              # degenerate repetition
    assert got[2] == round(math.log2(4), 6)  # uniform over 4 words


def test_contamination_overlap_counts(spark):
    from kairos_spark.operators import text

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "a quick brown fox ran away"),
            (3, "nothing shared here at all"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(99, "quick brown fox")], "doc_id long, text string")
    got = {r["doc_id"]: r["n_overlap"] for r in
           text.contamination_overlap(docs, bench, n=3).collect()}
    assert got == {1: 1, 2: 1}  # both share "quick brown fox"; doc 3 clean


def test_exact_dedup_incremental(spark):
    from pyspark.sql import functions as F
    from kairos_spark.operators import dedup

    seen_docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    )
    seen = seen_docs.select(F.md5("text").alias("digest"))
    batch = spark.createDataFrame(
        [
            (10, "alpha"),   # already ingested -> dropped
            (11, "gamma"),   # new
            (12, "gamma"),   # within-batch dup -> min id wins
            (13, "delta"),   # new
        ],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in dedup.exact_dedup_incremental(batch, seen).collect())
    assert kept == [11, 13]


def test_top_tokens_by_group(spark):
    from kairos_spark.operators import text

    df = spark.createDataFrame(
        [
            ("en", "cat cat dog"),
            ("en", "cat bird"),
            ("de", "hund hund katze"),
        ],
        "lang string, text string",
    )
    out = text.top_tokens_by_group(df, k=2)
    got = {(r["lang"], r["rank"]): (r["token"], r["n"]) for r in out.collect()}
    assert got == {
        ("en", 1): ("cat", 3),
        ("en", 2): ("bird", 1),  # dog/bird tie at n=1 → token asc wins
        ("de", 1): ("hund", 2),
        ("de", 2): ("katze", 1),
    }


def test_srp_near_pairs_finds_near_copy(vecs):
    # the (0, 59) near-copy pair agrees on every hyperplane sign, so
    # SRP bucketing must surface it; every reported pair must also be
    # confirmed by the brute-force verifier
    brute = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_self_pairs(vecs, 0.9).collect()
    }
    srp = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity.srp_near_pairs(vecs, dim=8, threshold=0.9, planes=4).collect()
    }
    assert (0, 59) in srp
    assert set(srp) <= brute


def test_pack_shards_matches_flat_cumsum(spark):
    # the two-phase (range totals + within-range window) cumsum must be
    # identical to a flat driver-side prefix sum in the same hash order
    import hashlib
    from kairos_spark.operators import sampling

    rows = [(i, 100 + (i * 37) % 400) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = {r["doc_id"]: r["shard"] for r in
           sampling.pack_shards(df, "n_chars", budget=5000).collect()}

    def key(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:11], 16)

    expected, cum = {}, 0
    for i, size in sorted(rows, key=lambda t: (key(t[0]), t[0])):
        expected[i] = cum // 5000
        cum += size
    assert got == expected
    # every shard except the last carries ~budget units
    by_shard = {}
    for i, size in rows:
        by_shard.setdefault(got[i], 0)
        by_shard[got[i]] += size
    full = [by_shard[s] for s in sorted(by_shard)[:-1]]
    assert all(v >= 5000 - 500 for v in full)  # max row size is 499


def test_sketch_distinct_accuracy_and_merge(spark):
    from kairos_spark.operators import sketches

    df = spark.createDataFrame(
        [(i % 2, f"v{i % 700}") for i in range(5000)], "g int, v string"
    )
    est = {r["g"]: r["est_distinct"] for r in
           sketches.distinct_estimate(df, ["g"], "v", k=64).collect()}
    # parity of i%2 and i%700 correlate: each group sees 350 distinct
    # values; ~1/sqrt(64) relative error
    for g in (0, 1):
        assert abs(est[g] - 350) / 350 < 0.4
    # merge property: sketch(A ∪ B) == elementwise-min(sketch A, sketch B)
    a = df.where("g = 0")
    b = df.where("g = 1")
    sk = lambda d: sketches.minhash_distinct_sketch(
        d.withColumn("one", F.lit(1)), ["one"], "v", k=16
    ).collect()[0]["sketch"]
    merged = [min(x, y) for x, y in zip(sk(a), sk(b))]
    assert merged == sk(df.withColumn("one", F.lit(1)))


def test_weighted_sample_matches_reference_priorities(spark):
    # the distributed top-k must equal a driver-side computation of the
    # same A-ES priorities (md5 uniform -> -ln(u)/w, k smallest)
    import hashlib
    import math
    from kairos_spark.operators import sampling

    rows = [(i, 1 + (i * 13) % 50) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = [r["doc_id"] for r in sampling.weighted_sample(df, "w", k=20, id_col="doc_id").collect()]

    def priority(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:11], 16)
        return -math.log((h + 1) / float(1 << 44)) / w

    expected = sorted(rows, key=lambda t: (priority(*t), t[0]))[:20]
    assert got == [i for i, _ in expected]


def test_weighted_sample_prefers_heavy_rows(spark):
    from kairos_spark.operators import sampling

    # one row with overwhelming weight is effectively always drawn
    rows = [(i, 10**9 if i == 123 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    ids = {r["doc_id"] for r in sampling.weighted_sample(df, "w", k=10).collect()}
    assert 123 in ids
    # and equal-weight sampling with two salts draws different samples
    a = {r["doc_id"] for r in sampling.weighted_sample(df, "w", k=10, salt="s1").collect()}
    b = {r["doc_id"] for r in sampling.weighted_sample(df, "w", k=10, salt="s2").collect()}
    assert a != b


def test_weighted_sample_excludes_nonpositive_and_caps_k(spark):
    from kairos_spark.operators import sampling

    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -4), (4, 2)], "doc_id long, w long"
    )
    out = sampling.weighted_sample(df, "w", k=10).collect()
    assert {r["doc_id"] for r in out} == {1, 4}
    assert all(r["priority"] > 0 for r in out)


def test_binned_quantiles_known_values(spark):
    from kairos_spark.operators import sketches

    df = spark.createDataFrame([("a", float(v)) for v in range(1, 101)], "g string, v double")
    out = {
        r["q"]: (r["est_value"], r["n"])
        for r in sketches.binned_quantiles(df, ["g"], "v", [0.5, 0.99], 0.0, 100.0, bins=100).collect()
    }
    # values 1..100, unit bins: p50 target=rank 50 -> bin 50 holds it,
    # interpolated to its upper edge; 100 clamps into bin 99 (count 2)
    assert out[0.5] == (51.0, 100)
    assert out[0.99] == (99.5, 100)


def test_binned_quantiles_error_bounded_by_width(spark):
    from kairos_spark.operators import sketches

    vals = [((i * 37) % 500) / 1.0 for i in range(1000)]
    df = spark.createDataFrame([("a", v) for v in vals], "g string, v double")
    qs = [0.25, 0.5, 0.9, 0.99]
    est = {
        r["q"]: r["est_value"]
        for r in sketches.binned_quantiles(df, ["g"], "v", qs, 0.0, 500.0, bins=200).collect()
    }
    sv = sorted(vals)
    for q in qs:
        exact = sv[max(0, -(-int(q * len(sv)) // 1) - 1)]
        assert abs(est[q] - exact) <= 2.5 + 1e-9, (q, est[q], exact)


def test_binned_histogram_merges_by_sum(spark):
    from pyspark.sql import functions as F
    from kairos_spark.operators import sketches

    rows = [("a", float((i * 13) % 300)) for i in range(400)]
    df = spark.createDataFrame(rows, "g string, v double")
    d1 = spark.createDataFrame(rows[:200], "g string, v double")
    d2 = spark.createDataFrame(rows[200:], "g string, v double")
    whole = sketches.binned_histogram(df, ["g"], "v", 0.0, 500.0, bins=50)
    h1 = sketches.binned_histogram(d1, ["g"], "v", 0.0, 500.0, bins=50)
    h2 = sketches.binned_histogram(d2, ["g"], "v", 0.0, 500.0, bins=50)
    merged = (
        h1.unionAll(h2).groupBy("g", "bin").agg(F.sum("c").alias("c"))
    )
    a = {(r["g"], r["bin"]): r["c"] for r in whole.collect()}
    b = {(r["g"], r["bin"]): r["c"] for r in merged.collect()}
    assert a == b


# --------------------------------------------------- duplicated spans


def test_duplicated_spans_finds_planted_span(spark):
    shared = "this exact paragraph is repeated verbatim across documents"
    rows = [
        (1, "alpha opening words " + shared + " alpha closing words"),
        (2, "beta prelude text " + shared + " beta epilogue text"),
        (3, "unrelated content with no overlap whatsoever in this doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.duplicated_spans(df, k=16, min_len=40, max_occ=50).collect()
    spans = {(r.id_a, r.id_b): r for r in out}
    assert (1, 2) in spans
    r = spans[(1, 2)]
    # maximal run includes the space on each side of the planted
    # sentence (both docs have ' ' there; the letters beyond differ)
    assert r.span_len == len(shared) + 2
    # positions are 1-based into the normalized (lowercased,
    # ws-collapsed) text: the span starts AT the shared space
    assert r.a_start == len("alpha opening words ")
    assert r.b_start == len("beta prelude text ")
    assert not any(3 in (a, b) for (a, b) in spans)


def test_duplicated_spans_min_len_and_normalization(spark):
    # same span, different case + whitespace runs: still detected
    shared = "case and   WHITESPACE insensitive span detection works here"
    norm_len = len("case and whitespace insensitive span detection works here")
    rows = [
        (1, shared.upper()),
        (2, shared.replace("   ", " \t ")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.duplicated_spans(df, k=16, min_len=40, max_occ=50).collect()
    assert len(out) == 1 and out[0].span_len == norm_len
    # raising min_len above the span suppresses it
    assert (
        dedup.duplicated_spans(df, k=16, min_len=norm_len + 1, max_occ=50).count() == 0
    )


def test_duplicated_spans_short_docs_no_rows(spark):
    df = spark.createDataFrame(
        [(1, "tiny"), (2, "tiny")], "doc_id long, text string"
    )
    assert dedup.duplicated_spans(df, k=16, min_len=40).count() == 0


# --------------------------------------------------------- domain cap


def test_domain_cap_deterministic_and_capped(spark):
    from kairos_spark.operators import sampling

    rows = [(i, f"d{i % 3}", i * 10) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = sampling.domain_cap(df, cap=4, group_col="source", id_col="doc_id")
    counts = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"d0": 4, "d1": 4, "d2": 4}
    # deterministic: a second run keeps the identical ids
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(
        r.doc_id
        for r in sampling.domain_cap(df, cap=4, group_col="source", id_col="doc_id").collect()
    )
    assert ids1 == ids2


def test_domain_cap_priority_and_overrides(spark):
    from kairos_spark.operators import sampling

    rows = [(i, f"d{i % 2}", i) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = sampling.domain_cap(
        df, cap=3, group_col="source", id_col="doc_id",
        caps={"d1": 100}, priority_col="n_chars",
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r.doc_id)
    # d1 is under its override cap: passes through whole (no sort branch)
    assert sorted(by_src["d1"]) == list(range(1, 20, 2))
    # d0 keeps its 3 LARGEST n_chars docs (priority desc)
    assert sorted(by_src["d0"]) == [14, 16, 18]


# ------------------------------------------------------- ngram novelty


def test_ngram_novelty_unique_vs_shared(spark):
    rows = [
        (1, "aaaaaaaaaaaaaaaa"),          # grams shared with doc 2
        (2, "aaaaaaaaaaaaaaaa"),          # exact copy: novelty 0
        (3, "zqxwvutsrqponmlk"),          # all grams unique: novelty 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in text.ngram_novelty(df, n=8).collect()}
    assert out[1].novelty == 0.0 and out[2].novelty == 0.0
    assert out[3].novelty == 1.0
    # doc 1: only ONE distinct gram ("aaaaaaaa")
    assert out[1].n_grams == 1 and out[1].n_unique == 0


def test_ngram_novelty_short_docs_excluded(spark):
    df = spark.createDataFrame([(1, "tiny")], "doc_id long, text string")
    # doc shorter than n yields no full-length grams -> no output row
    assert text.ngram_novelty(df, n=8).count() == 0


# ------------------------------------------------------ quantize audit


def test_quantize_audit_error_bounds(spark):
    import random

    rnd = random.Random(3)
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(4)], i % 2) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = similarity.quantize_audit(df, levels=255).collect()
    assert {r.label for r in out} == {0, 1}
    for r in out:
        assert r.n_components == 25 * 4
        # uniform quantization error is bounded by half a step:
        # step = range/255 <= 2/255 -> half-step ~ 0.0040
        assert 0 < r.rmse <= r.max_abs_err <= (2.0 / 255) / 2 + 1e-9


def test_quantize_audit_constant_dim_zero_error(spark):
    df = spark.createDataFrame(
        [(1, [5.0, 1.0], 0), (2, [5.0, 3.0], 0)],
        "vec_id long, embedding array<double>, label int",
    )
    r = similarity.quantize_audit(df, levels=255).collect()[0]
    # dim 0 is constant -> exact; dim 1 endpoints land on levels 0/255
    assert r.max_abs_err == 0.0 and r.rmse == 0.0


# -------------------------------------------------------- kaplan-meier


def test_kaplan_meier_textbook_curve(spark):
    from datetime import datetime, timezone

    from kairos_spark.operators import windows

    def ev(u, t, day, hour=12):
        return (u, t, datetime(2024, 1, 1 + day, hour, 0, tzinfo=timezone.utc))

    rows = [
        # u1 converts day 0 (one hour after signup), u2 day 1, u3 never
        # (censored), u4 never (censored); observation ends at the last
        # event below
        ev(1, "signup", 0), ev(1, "purchase", 0, hour=13),
        ev(2, "signup", 0), ev(2, "purchase", 1, hour=13),
        ev(3, "signup", 0),
        ev(4, "signup", 1),
        ev(5, "purchase", 3),  # purchase-only: excluded; also sets end
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {r.period: r for r in windows.kaplan_meier(df).collect()}
    # period 0: 4 at risk, 1 event -> S = 0.75
    assert out[0].n_at_risk == 4 and out[0].n_events == 1
    assert out[0].survival == 0.75
    # period 1: 3 at risk, 1 event -> S = 0.75 * 2/3 = 0.5
    assert out[1].n_at_risk == 3 and out[1].n_events == 1
    assert out[1].survival == 0.5
    # u3 censored at day 3, u4 censored at day 2 (end - its signup)
    assert out[3].n_censored == 1 and out[2].n_censored == 1
    # censoring does not change S
    assert out[2].survival == 0.5 and out[3].survival == 0.5


def test_kaplan_meier_all_convert_hits_zero(spark):
    from datetime import datetime, timezone

    from kairos_spark.operators import windows

    def ev(u, t, day):
        return (u, t, datetime(2024, 1, 1 + day, tzinfo=timezone.utc))

    rows = [
        ev(1, "signup", 0), ev(1, "purchase", 1),
        ev(2, "signup", 0), ev(2, "purchase", 1),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {r.period: r for r in windows.kaplan_meier(df).collect()}
    assert out[1].n_events == 2 and out[1].n_at_risk == 2
    assert out[1].survival == 0.0


# ------------------------------------------------------ temperature mix


def test_temperature_mix_budget_and_flattening(spark):
    from kairos_spark.operators import sampling

    rows = (
        [(i, "en") for i in range(900)]
        + [(i + 1000, "de") for i in range(90)]
        + [(i + 2000, "fr") for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = {r.name: r for r in sampling.temperature_mix(df, budget=100).collect()}
    # largest-remainder rounding: targets sum to the budget exactly
    assert sum(r.target_n for r in out.values()) == 100
    # alpha=0.5 flattens: tail languages get MORE than natural share,
    # the head gets less
    assert out["fr"].target_n > 1          # natural share would give 1
    assert out["en"].target_n < 90         # natural share would give 90
    # feasible never exceeds availability, rate in (0, 1]
    for r in out.values():
        assert r.feasible_n <= r.n and 0 < r.sample_rate <= 1.0


def test_temperature_mix_alpha_one_keeps_proportions(spark):
    from kairos_spark.operators import sampling

    rows = [(i, "a") for i in range(60)] + [(i + 100, "b") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = {r.name: r.target_n for r in sampling.temperature_mix(df, alpha=1.0, budget=10).collect()}
    assert out == {"a": 6, "b": 4}


# ------------------------------------- grouped sample / decay / pseudonym


def test_grouped_weighted_sample_per_group_k(spark):
    from kairos_spark.operators import sampling

    rows = [(i, "a" if i < 50 else "b", 10 + i) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    out = sampling.grouped_weighted_sample(df, "n_chars", k=5, group_col="lang").collect()
    by = {}
    for r in out:
        by.setdefault(r.lang, []).append(r.doc_id)
    assert len(by["a"]) == 5
    # group b has 10 rows -> exactly 5 kept; deterministic across runs
    assert len(by["b"]) == 5
    again = sampling.grouped_weighted_sample(df, "n_chars", k=5, group_col="lang").collect()
    assert sorted(r.doc_id for r in again) == sorted(r.doc_id for r in out)


def test_decayed_topk_recency_beats_count(spark):
    from datetime import datetime, timezone

    from kairos_spark.operators import windows

    def ev(u, day):
        return (u, datetime(2024, 1, 1 + day, tzinfo=timezone.utc))

    # u1: 3 ancient events; u2: 2 recent events. With a 1-day half
    # life, u2 outscores u1 despite fewer events.
    rows = [ev(1, 0), ev(1, 0), ev(1, 0), ev(2, 19), ev(2, 20)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = windows.decayed_topk(df, half_life_sec=86400.0, k=10).collect()
    assert [r.user_id for r in out] == [2, 1]
    assert out[0].decayed_score > out[1].decayed_score
    assert out[1].n_events == 3


def test_pseudonymize_stable_and_joinable(spark):
    from kairos_spark.operators import pii

    a = spark.createDataFrame([(1, "x"), (2, "y")], "user_id long, p string")
    b = spark.createDataFrame([(1, "z")], "user_id long, q string")
    pa = pii.pseudonymize(a, "user_id", salt="s")
    pb = pii.pseudonymize(b, "user_id", salt="s")
    joined = pa.join(pb, "user_id").collect()
    # same salt -> surrogates still join; raw id gone
    assert len(joined) == 1 and joined[0]["p"] == "x" and joined[0]["q"] == "z"
    assert not any(r["user_id"] in ("1", "2", 1, 2) for r in joined)
    # different salt -> different surrogate family
    pc = pii.pseudonymize(b, "user_id", salt="other")
    assert pc.collect()[0]["user_id"] != pb.collect()[0]["user_id"]


def test_pseudonym_audit_collision_free_at_64_bits(spark):
    from kairos_spark.operators import pii

    df = spark.createDataFrame([(i,) for i in range(1000)], "user_id long")
    r = pii.pseudonym_audit(df, "user_id", bits=64).collect()[0]
    assert r.n_ids == 1000 and r.n_collisions == 0
    # 4-bit surrogates MUST collide on 1000 ids (16 buckets)
    r4 = pii.pseudonym_audit(df, "user_id", bits=4).collect()[0]
    assert r4.n_surrogates <= 16 and r4.n_collisions == 1000 - r4.n_surrogates
