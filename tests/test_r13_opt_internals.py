"""Focused pins for the r13 optimization-round operator rewrites.

The optimizations must be INVISIBLE in output: minhash_lsh_pairs and
simhash_near_pairs replaced their candidate dropDuplicates shuffle
with first-matching-band/segment attribution, and the simhash family
pins a broadcast build side under a bounded-frame gate. These tests
pin the two properties that attribution must preserve on inputs where
pairs collide in MULTIPLE bands/segments (near-identical docs):

1. every near pair appears EXACTLY once (no duplicates, no drops);
2. the pair set equals the brute-force reference (all-pairs compare).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kairos_spark.operators import dedup

pytestmark = pytest.mark.usefixtures("spark")


def _docs(spark):
    # three exact copies (collide in EVERY band), one near copy, one
    # distinct doc — multi-band collisions exercise the attribution OR
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base),
        (3, base),
        (4, base + " tail"),
        (5, "completely different content with other words entirely"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_lsh_pairs_unique_and_complete(spark):
    d = _docs(spark)
    out = dedup.minhash_lsh_pairs(
        d, n=4, num_hashes=32, bands=16, threshold=0.2
    ).collect()
    pairs = [(r.id_a, r.id_b) for r in out]
    # exactly once each despite matching in all 16 bands
    assert len(pairs) == len(set(pairs)), f"duplicate pairs: {pairs}"
    # the three exact copies must all pair up (est_jaccard = 1.0)
    exact = {(a, b) for a, b, in [(1, 2), (1, 3), (2, 3)]}
    got = {p for p in pairs if p in exact}
    assert got == exact
    ej = {(r.id_a, r.id_b): r.est_jaccard for r in out}
    for p in exact:
        assert ej[p] == 1.0


def test_simhash_near_pairs_matches_bruteforce(spark):
    d = _docs(spark)
    out = dedup.simhash_near_pairs(
        d, max_hamming=3, bits=60, blocks=4
    ).collect()
    pairs = {(r.id_a, r.id_b): r.hamming for r in out}
    assert len(pairs) == len(out), "duplicate pairs emitted"
    # brute-force reference from the raw fingerprints
    fp = {r.doc_id: r.simhash for r in dedup.simhash(d, bits=60).collect()}
    ids = sorted(fp)
    ref = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(fp[a] ^ fp[b]).count("1")
            if h <= 3:
                ref[(a, b)] = h
    assert pairs == ref


def test_simhash_radius_sweep_matches_bruteforce(spark):
    d = _docs(spark)
    out = {r.radius: (r.n_pairs, r.cum_pairs)
           for r in dedup.simhash_radius_sweep(
               d, max_hamming=5, bits=60, blocks=6).collect()}
    fp = {r.doc_id: r.simhash for r in dedup.simhash(d, bits=60).collect()}
    ids = sorted(fp)
    hist = {r: 0 for r in range(6)}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(fp[a] ^ fp[b]).count("1")
            if h <= 5:
                hist[h] += 1
    cum = 0
    for r in range(6):
        cum += hist[r]
        assert out[r] == (hist[r], cum), f"radius {r}: {out[r]} != {(hist[r], cum)}"
