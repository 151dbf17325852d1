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
