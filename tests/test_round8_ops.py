"""Unit tests for the round-8 training-data pipeline operators:
Gopher/C4 quality-rule pack, DSIR hashed-ngram importance weights,
sequence-packing efficiency audit, per-source token-budget
water-filling, and the hash-shard balance audit."""

import hashlib

from pyspark.sql import Row

from kairos_spark.operators import layout, sampling, text

# --- quality_rules ---

GOOD = (
    "the quick brown fox and the lazy dog have been with us for many "
    "years and that is why all of these words are here to make the "
    "document long enough to pass the word count rule of the gopher "
    "pack with room to spare because fifty words is quite a lot to "
    "write when you think about it carefully indeed"
)


def _rules(spark, rows):
    out = text.quality_rules(spark.createDataFrame(rows))
    return {r.rule: r for r in out.collect()}


def test_quality_rules_good_doc_passes_all(spark):
    got = _rules(spark, [Row(doc_id=1, text=GOOD)])
    for rule, r in got.items():
        assert r.n_pass == 1, rule
    assert got["all_rules"].pass_rate == 1.0


def test_quality_rules_short_doc_fails_word_count_only(spark):
    got = _rules(spark, [Row(doc_id=1, text="the little and of that have with be short text")])
    assert got["r01_word_count"].n_pass == 0
    assert got["r07_stopword_hits"].n_pass == 1
    assert got["all_rules"].n_pass == 0


def test_quality_rules_all_bullet_lines_fail_r04(spark):
    got = _rules(spark, [Row(doc_id=1, text="- a\n- b\n- c")])
    assert got["r04_bullet_lines"].n_pass == 0


def test_quality_rules_bullet_share_at_80pct_passes(spark):
    got = _rules(spark, [Row(doc_id=1, text="- a\n- b\n• c\n* d\nplain")])
    assert got["r04_bullet_lines"].n_pass == 1


def test_quality_rules_lorem_and_brace_fail_r08(spark):
    got = _rules(spark, [Row(doc_id=1, text="Lorem Ipsum dolor"), Row(doc_id=2, text="code { block }")])
    assert got["r08_no_boilerplate"].n_pass == 0


def test_quality_rules_symbol_ratio_boundary_equality(spark):
    # 10 words, ONE '...' → 10*sym == words: the <= must pass
    ten = "alpha beta gamma delta epsilon zeta eta theta iota kappa..."
    got = _rules(spark, [Row(doc_id=1, text=ten)])
    assert got["r03_symbol_ratio"].n_pass == 1
    # two '...' flips it
    got2 = _rules(spark, [Row(doc_id=1, text=ten.replace("alpha", "alpha..."))])
    assert got2["r03_symbol_ratio"].n_pass == 0


def test_quality_rules_mean_word_len_boundaries(spark):
    # exactly 3 chars/word passes; 2 chars/word fails
    got = _rules(spark, [Row(doc_id=1, text=" ".join(["abc"] * 50))])
    assert got["r02_mean_word_len"].n_pass == 1
    got2 = _rules(spark, [Row(doc_id=1, text=" ".join(["ab"] * 50))])
    assert got2["r02_mean_word_len"].n_pass == 0


def test_quality_rules_pass_rate_exact_ratio(spark):
    rows = [Row(doc_id=i, text=GOOD if i == 0 else "tiny") for i in range(4)]
    got = _rules(spark, rows)
    assert got["r01_word_count"].n_pass == 1
    assert got["r01_word_count"].pass_rate == 0.25


# --- packing_efficiency ---


def _docs_with_tokens(spark, counts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(["tok"] * c)) for i, c in enumerate(counts)]
    )


def test_packing_known_layout(spark):
    # t = [100, 50, 30], L=64: ends 100/150/180; doc0 crosses 64,
    # doc1 crosses 128, doc2 crosses nothing
    df = _docs_with_tokens(spark, [100, 50, 30])
    r = text.packing_efficiency(df, [64]).collect()[0]
    assert r.total_tokens == 180
    assert r.packed_contexts == 3
    assert r.docs_split == 2 and r.total_splits == 2
    assert r.naive_contexts == 2 + 1 + 1
    assert r.packed_fill_rate == round(180 / 192, 6)
    assert r.naive_fill_rate == round(180 / 256, 6)


def test_packing_exact_boundary_no_split(spark):
    # doc0 ends exactly at L, doc1 starts exactly on the boundary:
    # neither is split
    df = _docs_with_tokens(spark, [64, 10])
    r = text.packing_efficiency(df, [64]).collect()[0]
    assert r.docs_split == 0 and r.total_splits == 0
    assert r.packed_contexts == 2


def test_packing_empty_doc_contributes_nothing(spark):
    df = spark.createDataFrame(
        [Row(doc_id=0, text="tok " * 10), Row(doc_id=1, text=""), Row(doc_id=2, text="tok")]
    )
    r = text.packing_efficiency(df, [8]).collect()[0]
    assert r.n_docs == 3
    assert r.total_tokens == 11
    assert r.naive_contexts == 2 + 0 + 1


def test_packing_doc_spanning_many_contexts(spark):
    df = _docs_with_tokens(spark, [300])
    r = text.packing_efficiency(df, [64]).collect()[0]
    # 300 tokens cross boundaries at 64/128/192/256 → 4 splits
    assert r.docs_split == 1 and r.total_splits == 4
    assert r.packed_contexts == 5


# --- token_budget_alloc ---


def _src_docs(spark, avail):
    rows = []
    for i, (src, n) in enumerate(sorted(avail.items())):
        rows.append(Row(doc_id=i, source=src, text=" ".join(["tok"] * n)))
    return spark.createDataFrame(rows)


def test_budget_alloc_small_source_caps_big_absorbs(spark):
    # avail {a:100, b:10000}: B=5050, caps {200, 20000}, w={10,100};
    # 'a' caps (level 48.5 > threshold 20), 'b' gets floor(48.5*100)
    df = _src_docs(spark, {"a": 100, "b": 10000})
    got = {r.grp: r for r in sampling.token_budget_alloc(df, max_epochs=2).collect()}
    assert got["a"].alloc_tokens == 200 and got["a"].capped == 1
    assert got["a"].epochs == 2.0
    assert got["b"].alloc_tokens == 4850 and got["b"].capped == 0
    assert got["b"].epochs == 0.485


def test_budget_alloc_equal_sources_uncapped_equal(spark):
    df = _src_docs(spark, {"a": 1000, "b": 1000, "c": 1000, "d": 1000})
    rows = sampling.token_budget_alloc(df, max_epochs=2).collect()
    allocs = {r.grp: r.alloc_tokens for r in rows}
    assert len(set(allocs.values())) == 1
    assert all(r.capped == 0 for r in rows)
    # budget = 2000: each gets 500
    assert allocs["a"] == 500


def test_budget_alloc_empty_source_dropped(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=0, source="a", text="tok tok tok tok"),
            Row(doc_id=1, source="z", text="123 456"),
        ]
    )
    rows = sampling.token_budget_alloc(df).collect()
    assert [r.grp for r in rows] == ["a"]


def test_budget_alloc_never_exceeds_cap_or_budget(spark):
    df = _src_docs(spark, {"a": 10, "b": 50, "c": 3000, "d": 7, "e": 900})
    rows = sampling.token_budget_alloc(df, max_epochs=2).collect()
    total_b = sum(r.avail_tokens for r in rows) // 2
    assert sum(r.alloc_tokens for r in rows) <= total_b
    for r in rows:
        assert 0 <= r.alloc_tokens <= r.cap_tokens


# --- dsir_weights ---


def test_dsir_target_like_docs_rank_first(spark):
    rows = []
    for i in range(8):
        rows.append(Row(doc_id=i, lang="en", text="alpha beta alpha beta gamma"))
    for i in range(8, 16):
        rows.append(Row(doc_id=i, lang="de", text="zulu yankee xray zulu yankee"))
    # held-out docs, one of each flavour, in the raw pool only
    rows.append(Row(doc_id=100, lang="fr", text="alpha beta gamma"))
    rows.append(Row(doc_id=101, lang="fr", text="zulu yankee xray"))
    out = sampling.dsir_weights(
        spark.createDataFrame(rows), target_col="lang", target_value="en", k=100
    ).collect()
    w = {r.doc_id: r.log_weight for r in out}
    assert w[100] > w[101]  # en-like text scores higher
    ranked = [r.doc_id for r in out]
    assert ranked.index(100) < ranked.index(101)


def test_dsir_gram_count_unigrams_plus_bigrams(spark):
    rows = [Row(doc_id=0, lang="en", text="a b c"), Row(doc_id=1, lang="en", text="solo")]
    out = {r.doc_id: r for r in sampling.dsir_weights(
        spark.createDataFrame(rows), target_col="lang", target_value="en"
    ).collect()}
    assert out[0].n_grams == 3 + 2
    assert out[1].n_grams == 1


def test_dsir_deterministic(spark):
    rows = [
        Row(doc_id=i, lang="en" if i % 2 else "de", text=f"w{i} common text body {i}")
        for i in range(12)
    ]
    df = spark.createDataFrame(rows)
    a = sampling.dsir_weights(df, "lang", "en").collect()
    b = sampling.dsir_weights(df, "lang", "en").collect()
    assert a == b


# --- shard_balance ---


def _py_shard(doc_id, n):
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:11], 16) % n


def test_shard_balance_matches_python_mirror(spark):
    counts = [5, 10, 3, 8, 1, 0, 7, 2, 9, 4, 6, 11]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(["tok"] * c)) for i, c in enumerate(counts)]
    )
    r = layout.shard_balance(df, n_shards=4).collect()[0]
    per = {s: [0, 0] for s in range(4)}
    for i, c in enumerate(counts):
        s = _py_shard(i, 4)
        per[s][0] += 1
        per[s][1] += c
    tok = [v[1] for v in per.values()]
    assert r.n_docs == len(counts)
    assert r.n_tokens == sum(counts)
    assert r.max_shard_tokens == max(tok)
    assert r.min_shard_tokens == min(tok)
    assert r.n_empty_shards == sum(1 for v in per.values() if v[0] == 0)
    t_total = sum(counts)
    chi2_num = 4 * sum(t * t for t in tok) - t_total * t_total
    # integer half-up round-6, mirroring _round6_ratio_dec
    assert r.token_chi2 == ((2_000_000 * chi2_num + t_total) // (2 * t_total)) / 1e6


def test_shard_balance_uniform_zero_chi2(spark):
    # every shard gets exactly one doc of equal size -> chi2 == 0
    n = 8
    ids = []
    seen = {}
    i = 0
    while len(seen) < n:
        s = _py_shard(i, n)
        if s not in seen:
            seen[s] = i
            ids.append(i)
        i += 1
    df = spark.createDataFrame([Row(doc_id=d, text="tok tok tok") for d in ids])
    r = layout.shard_balance(df, n_shards=n).collect()[0]
    assert r.doc_chi2 == 0.0 and r.token_chi2 == 0.0
    assert r.token_imbalance == round(1.0, 6)
    assert r.n_empty_shards == 0


# --- the \z anchor invariant (Java $ vs RE2 $, CLAUDE.md) ---


def test_dollar_anchor_divergence_basis(spark):
    """Documents WHY Spark-side gates must anchor with \\z: Java's $
    (no MULTILINE) also matches before a final \\n or \\r, RE2's (the
    oracle engine) does not. If this probe ever changes, the \\z
    invariant can be revisited."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [Row(v="12\n"), Row(v="12\r"), Row(v="12"), Row(v="1\n2")]
    )
    got = df.select(
        "v",
        F.col("v").rlike(r"^[0-9]+$").alias("dollar"),
        F.col("v").rlike(r"^[0-9]+\z").alias("z"),
    ).collect()
    by_v = {r.v: (r.dollar, r.z) for r in got}
    assert by_v["12"] == (True, True)
    assert by_v["12\n"] == (True, False)  # the Java-$ quirk
    assert by_v["12\r"] == (True, False)
    assert by_v["1\n2"] == (False, False)
    import duckdb

    # RE2 $ is already strict end-of-input: matches '12', not '12\n'
    r = duckdb.sql(
        "select regexp_matches('12', '^[0-9]+$'),"
        "       regexp_matches('12' || chr(10), '^[0-9]+$')"
    ).fetchall()[0]
    assert r == (True, False)


def test_quality_rules_crlf_ellipsis_not_counted(spark):
    # CRLF doc: lines end with \r after the \n split; the ellipsis-end
    # rule must NOT match "dots...\r" (\z anchor) — matching it on
    # Spark only was the engine-splitting bug this test pins
    doc = "dots...\r\n" + "x...\r\n" * 8 + "plain"
    got = _rules(spark, [Row(doc_id=1, text=doc)])
    # 9 of 10 lines LOOK ellipsis-terminated but carry \r — none count
    assert got["r05_ellipsis_lines"].n_pass == 1


# --- r8 adversarial-gate regressions (full-registry rerun finds) ---


def test_dup_inflation_zero_token_group_sentinel(spark):
    from kairos_spark.operators import dedup

    df = spark.createDataFrame(
        [
            Row(doc_id=0, source="digits", text="123 456"),
            Row(doc_id=1, source="digits", text="789"),
            Row(doc_id=2, source="words", text="alpha beta"),
            Row(doc_id=3, source="words", text="alpha beta"),
        ]
    )
    got = {r.group: r for r in dedup.dup_inflation(df).collect()}
    # zero [a-z] tokens: inflation undefined -> 0.0 sentinel, no ANSI error
    assert got["digits"].tokens_unique == 0
    assert got["digits"].inflation == 0.0
    assert got["words"].inflation == 2.0  # exact dup doubles the tokens


def test_post_stratified_raw_mean_exact_midpoint(spark):
    from kairos_spark.operators import profiling

    # grand mean = 205 cents / (100*32) = 41/640 = 0.0640625 — the
    # engine-splitting midpoint; integer half-up must give .064063
    rows = [Row(h="a", v=0.19)] + [Row(h="a" if i % 2 else "b", v=0.06) for i in range(31)]
    out = profiling.post_stratified_mean(
        spark.createDataFrame(rows), "h", "v"
    ).collect()[0]
    assert out.n == 32
    assert out.raw_mean == 0.064063
