"""Focused pins for the r14 optimization-round operator rewrites.

duplicated_spans replaced its gram self-join (rare-filter aggregate +
two broadcast joins, grams evaluated 4x, corpus-sized broadcast) with
ONE groupBy(gram) occurrence-list aggregate + a bounded double explode,
and dropped ``__pb`` from the window shuffle (b_start = a_start - diag
is reconstructed after the aggregate). The rewrite must be INVISIBLE in
output. These tests pin the properties the grouped pair generation must
preserve on inputs where the old join's semantics are subtle:

1. each (a-occurrence, b-occurrence) pair with id_a < id_b generated
   exactly once, including grams occurring MULTIPLE times per doc
   (self-pairs within one doc must NOT appear);
2. b_start reconstruction is exact on spans at different alignments
   (diag != 0, including negative diag);
3. the full output matches a brute-force all-substring reference.

semdedup's final-assignment checkpoint is value-invisible by
construction (materialization of computed rows); its output is pinned
against the uncheckpointed composition here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kairos_spark.operators import dedup, similarity

pytestmark = pytest.mark.usefixtures("spark")


def _bruteforce_spans(rows, k=16, min_len=40, max_occ=10_000):
    """Reference implementation: literal anti-diagonal islands over
    normalized text, in plain Python."""
    import re

    norm = {i: re.sub(r"\s+", " ", t.lower()) for i, t in rows}
    grams = {}  # g -> list[(id, pos1)]
    for i, n in norm.items():
        for p in range(1, max(len(n) - k + 1, 0) + 1):
            grams.setdefault(n[p - 1 : p - 1 + k], []).append((i, p))
    matches = {}  # (a, b, diag) -> set of pa
    for g, occ in grams.items():
        if len(occ) > max_occ:
            continue
        for ia, pa in occ:
            for ib, pb in occ:
                if ia < ib:
                    matches.setdefault((ia, ib, pa - pb), set()).add(pa)
    out = set()
    for (ia, ib, diag), pas in matches.items():
        run = sorted(pas)
        start = prev = run[0]
        islands = []
        for p in run[1:]:
            if p == prev + 1:
                prev = p
            else:
                islands.append((start, prev))
                start = prev = p
        islands.append((start, prev))
        for s, e in islands:
            span_len = e - s + k
            if span_len >= min_len:
                out.add((ia, ib, s, s - diag, span_len))
    return out


def test_duplicated_spans_matches_bruteforce_multi_occurrence(spark):
    # shared is a 52-char span; doc 1 contains it TWICE (internal repeat
    # -> same gram at two positions in ONE doc: no self-pairs allowed,
    # and doc1-doc2 pairs must appear once per (occurrence, occurrence)
    # alignment); doc 3 embeds it at a shifted offset (negative diag vs
    # doc 1's second occurrence); doc 4 is unrelated filler.
    shared = "one two three four five six seven eight nine ten xyz"
    assert len(shared) >= 40
    rows = [
        (1, "AAAA " + shared + " MIDDLE " + shared + " ZZZZ"),
        (2, shared + " trailing words here"),
        (3, "a much longer unrelated prefix comes first " + shared),
        (4, "completely different content with no overlap at all in it"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b, r.a_start, r.b_start, r.span_len)
        for r in dedup.duplicated_spans(df, k=16, min_len=40, max_occ=50).collect()
    }
    want = _bruteforce_spans(rows, k=16, min_len=40, max_occ=50)
    assert got == want
    # the internal repeat must yield TWO doc1->doc2 spans (one per
    # occurrence alignment) and no (1, 1) self pair
    assert len([t for t in got if t[:2] == (1, 2)]) == 2
    assert not [t for t in got if t[0] == t[1]]
    # negative-diag reconstruction: doc 1 (early occurrence) vs doc 3
    # (late occurrence) has a_start < b_start
    neg = [t for t in got if t[:2] == (1, 3) and t[2] < t[3]]
    assert neg, f"expected a negative-diag (1,3) span in {got}"


def test_duplicated_spans_occ_window_lower_bound(spark):
    # occ == 1 grams must simply vanish (the new occ >= 2 pre-filter
    # is an optimization, not a semantics change): two docs with NO
    # shared 16-gram produce nothing
    rows = [
        (1, "entirely distinct first document text body of some length"),
        (2, "second doc sharing not a single sixteen char window anywhere"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert dedup.duplicated_spans(df, k=16, min_len=40).count() == 0


def test_semdedup_checkpoint_invisible(spark):
    # 40 vectors in 3 natural clumps; the checkpointed operator must
    # equal the uncheckpointed composition exactly
    import math

    rows = [
        (i, [math.sin(i % 3 + d) + (i % 7) * 1e-3 for d in range(8)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        tuple(r)
        for r in similarity.semdedup(df, k=3, iters=2, threshold=0.9).collect()
    }
    # uncheckpointed reference: rebuild from the shared assignment
    a = similarity._kmeans_final_assign(df, 3, 2, "vec_id", "embedding")
    n = a.select(
        "cid",
        F.col("__id").alias("id"),
        F.col("__v").alias("v"),
        similarity.norm(F.col("__v")).alias("nrm"),
    )
    l, r = n.alias("l"), n.alias("r")
    pairs = (
        l.join(r, (F.col("l.cid") == F.col("r.cid")) & (F.col("l.id") < F.col("r.id")))
        .select(
            F.col("l.cid").alias("cid"),
            F.col("r.id").alias("id"),
            F.when(
                F.col("l.nrm") * F.col("r.nrm") > 0,
                F.round(
                    similarity.dot(F.col("l.v"), F.col("r.v"))
                    / (F.col("l.nrm") * F.col("r.nrm")),
                    6,
                ),
            )
            .otherwise(F.lit(-1.0))
            .alias("cosine"),
        )
        .where(F.col("cosine") >= 0.9)
    )
    dropped = pairs.select("cid", "id").distinct().groupBy("cid").agg(
        F.count("*").alias("n_dropped")
    )
    sizes = n.groupBy("cid").agg(F.count("*").alias("n_vecs"))
    ref = {
        tuple(r)
        for r in sizes.join(dropped, "cid", "left")
        .select(
            F.col("cid").alias("cluster_id"),
            "n_vecs",
            F.coalesce(F.col("n_dropped"), F.lit(0)).cast("long").alias("n_dropped"),
            (F.col("n_vecs") - F.coalesce(F.col("n_dropped"), F.lit(0)))
            .cast("long")
            .alias("n_kept"),
        )
        .collect()
    }
    assert out == ref
