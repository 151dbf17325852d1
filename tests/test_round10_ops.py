"""Round-10 operator tests.

Covers the r10 additions: the LSH-path keep-best composition
(VERDICT r9 #3) and the new training-data operators added this round.
"""

from pyspark.sql import Row, functions as F

from kairos_spark.operators import dedup, text


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
