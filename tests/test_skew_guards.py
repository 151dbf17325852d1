"""Skew stress tests (VERDICT r5 item 5): the driver's synthetic corpus
is uniform, which HIDES hub behavior — these fixtures are deliberately
Zipf/viral-skewed and fail if any hub guard stops bounding candidate
counts.

Guards under test:
- coactivity_edges ``max_bucket_nodes`` (stop-bucket): a viral
  (key, hour) cell must contribute zero pairs;
- cooccurrence_triangles ``max_degree`` (hub): wedge enumeration must
  exclude high-degree hubs;
- duplicated_spans / winnow_near_pairs ``max_occ`` (stop-gram):
  corpus-wide boilerplate must not form quadratic join buckets;
- prefix_jaccard_pairs: hot tokens sit OUTSIDE prefixes by
  construction (df-ascending order), so token skew adds no candidates.
"""

import datetime as dt
import math

from pyspark.sql import functions as F

from kairos_spark.operators import dedup, graph

UTC = dt.timezone.utc


def _ev(user, cell_idx, etype="viral"):
    # one event row; cell identity = (etype, hour bucket)
    return (int(user), dt.datetime(2024, 1, 1, tzinfo=UTC)
            + dt.timedelta(hours=cell_idx), etype)


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


# ------------------------------------------------- stop-bucket guard


def test_viral_cell_contributes_zero_edges(spark):
    rows = []
    # viral: 300 users share the SAME two (viral, hour) cells —
    # unguarded this alone is C(300,2) = 44850 pairs
    for u in range(1, 301):
        rows.append(_ev(u, 0))
        rows.append(_ev(u, 1))
    # organic: users 1001-1004 share two small cells -> C(4,2) edges
    for u in range(1001, 1005):
        rows.append(_ev(u, 50, "organic"))
        rows.append(_ev(u, 51, "organic"))
    df = _events_df(spark, rows)
    edges = graph.coactivity_edges(
        df, step_sec=3600, min_shared=2, max_bucket_nodes=200
    )
    got = {(r.a, r.b) for r in edges.collect()}
    assert got == {(a, b) for a in range(1001, 1005)
                   for b in range(a + 1, 1005)}
    # sanity: without the guard the viral cell explodes — the guard is
    # load-bearing, not decorative
    unguarded = graph.coactivity_edges(
        df, step_sec=3600, min_shared=2, max_bucket_nodes=10**6
    )
    assert unguarded.count() >= math.comb(300, 2)


def test_zipf_sampled_edges_within_kept_cell_bound(spark):
    # Zipf-ish sampled keys (deterministic congruential draw — no RNG
    # in test either): heavy head users hammer one cell
    rows = []
    for i in range(4000):
        r = (i * 2654435761) % 1000 + 1  # uniform 1..1000
        user = int(1000 // math.sqrt(r))  # ~Zipf(2) head-heavy
        cell = (i * 40503) % 8
        rows.append(_ev(user, cell))
    df = _events_df(spark, rows)
    cap = 20
    edges = graph.coactivity_edges(
        df, step_sec=3600, min_shared=1, max_bucket_nodes=cap
    )
    # the guard's contract: edge count <= sum over KEPT cells of C(n,2)
    cell_sizes = [
        r.n for r in df.select(
            "user_id", "event_type",
            F.floor(F.unix_timestamp("ts") / 3600).alias("h"),
        ).distinct().groupBy("event_type", "h")
        .agg(F.count("*").alias("n")).collect()
    ]
    bound = sum(math.comb(n, 2) for n in cell_sizes if n <= cap)
    assert edges.count() <= bound
    assert bound < sum(math.comb(n, 2) for n in cell_sizes)  # skew real


# ------------------------------------------------------- hub guard


def test_triangle_max_degree_drops_hub(spark):
    rows = []
    # star: hub user 1 shares two dedicated cells with each of 30
    # spokes -> hub degree 30
    for i, spoke in enumerate(range(100, 130)):
        for j in (0, 1):
            cell = 10 + 2 * i + j
            rows.append(_ev(1, cell, f"star{i}"))
            rows.append(_ev(spoke, cell, f"star{i}"))
    # organic triangle: 201, 202, 203 share two cells
    for u in (201, 202, 203):
        rows.append(_ev(u, 500, "tri"))
        rows.append(_ev(u, 501, "tri"))
    df = _events_df(spark, rows)
    out = {r.node: r for r in graph.cooccurrence_triangles(
        df, step_sec=3600, min_shared=2,
        max_bucket_nodes=200, max_degree=10,
    ).collect()}
    assert 1 not in out  # hub capped out entirely
    for u in (201, 202, 203):
        assert out[u].triangles == 1 and out[u].degree == 2
    # without the hub guard the hub row IS present
    unguarded = {r.node for r in graph.cooccurrence_triangles(
        df, step_sec=3600, min_shared=2,
        max_bucket_nodes=200, max_degree=None,
    ).collect()}
    assert 1 in unguarded


def test_bfs_on_guarded_graph_bounded(spark):
    # bfs_reach consumes the same guarded edges: the viral component
    # vanishes, so reach counts stay organic-sized
    rows = []
    for u in range(1, 301):
        rows.append(_ev(u, 0))
        rows.append(_ev(u, 1))
    for u in (1001, 1002, 1003):
        rows.append(_ev(u, 50, "organic"))
        rows.append(_ev(u, 51, "organic"))
    edges = graph.coactivity_edges(
        _events_df(spark, rows), step_sec=3600,
        min_shared=2, max_bucket_nodes=200,
    )
    out = graph.bfs_reach(edges, n_seeds=2, hops=2).collect()
    assert len(out) == 4
    assert all(r.n_reached <= 2 for r in out)


# ------------------------------------------------------ stop-gram guard


BOILER = "this footer sentence appears verbatim on every single page of the site "


def test_duplicated_spans_boilerplate_bucket_killed(spark):
    docs = []
    # 60 docs: shared boilerplate + unique filler. Unguarded, the
    # boilerplate grams alone pair C(60,2) = 1770 docs.
    for i in range(60):
        docs.append((i, BOILER + f"unique page body number {i:04d} with its own words"))
    # one true near-dup pair sharing a long UNIQUE span
    span = "the quick brown fox jumps over the lazy dog near the riverbank at dawn"
    docs.append((900, "article one begins here. " + span))
    docs.append((901, "a different opening line.. " + span))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = dedup.duplicated_spans(df, k=16, min_len=40, max_occ=30).collect()
    pairs = {(r.id_a, r.id_b) for r in out}
    assert (900, 901) in pairs
    # no pair exists between boilerplate-only docs: their grams occur
    # 60x > max_occ and are dropped before the join
    assert all(a >= 900 for a, b in pairs), pairs


def test_winnow_pairs_boilerplate_bucket_killed(spark):
    docs = []
    for i in range(60):
        docs.append((i, BOILER * 3))  # identical heavy boilerplate
    shared = ("completely distinctive shared technical paragraph about "
              "spectral clustering of bipartite graphs with degree correction ")
    docs.append((900, shared + "tail alpha"))
    docs.append((901, shared + "tail beta"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = dedup.winnow_near_pairs(
        df, k=8, w=4, max_occ=30, min_shared=3
    ).collect()
    pairs = {(r.id_a, r.id_b) for r in out}
    assert pairs == {(900, 901)}


# ------------------------------------------------- salted top-k merge


def test_knn_salted_topk_exact_under_candidate_skew(spark):
    # every query scores against the WHOLE 1200-vector corpus (the
    # hot-key worst case the two-phase salted merge exists for),
    # with deliberate cosine ties so the id tiebreak is exercised;
    # result must equal brute force computed in plain Python
    from kairos_spark.operators import similarity

    n = 1200
    vecs = []
    for i in range(n):
        th = (i % 40) * math.pi / 80  # 30 duplicates of each angle
        vecs.append((i, [math.cos(th), math.sin(th)]))
    corpus = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    queries = corpus.select(
        F.col("vec_id").alias("q_id"), "embedding"
    ).where(F.col("vec_id") < 3)
    res = similarity.knn_join(queries, corpus, k=5, n_salt=8)
    got = {}
    for r in res.collect():
        got.setdefault(r.q_id, []).append((r.rank, r.vec_id, r.cosine))

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    vd = dict(vecs)
    for q in (0, 1, 2):
        exp = sorted(
            ((-cos(vd[q], v), i) for i, v in vecs if i != q)
        )[:5]
        assert got[q] == [(r + 1, i, -nc) for r, (nc, i) in enumerate(exp)]
    # structural guard: no per-query window / global sort of the corpus
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        res.explain("formatted")
    t = buf.getvalue()
    assert "Window" not in t and "CartesianProduct" not in t


# --------------------------------------------- prefix-filter structure


def test_prefix_jaccard_hot_tokens_add_no_pairs(spark):
    # 100 docs all share the same 5 hot tokens; only one true pair
    # shares enough RARE tokens to clear 0.9. Hot tokens have max df,
    # sort LAST, and never enter any prefix.
    hot = "the of and to in"

    def al(n):  # alphabetic token suffix — the [a-z]+ pattern keeps it whole
        s = ""
        n += 1
        while n:
            n, d = divmod(n, 26)
            s += chr(97 + d)
        return s

    docs = []
    for i in range(100):
        uniq = " ".join(f"w{al(i)}x{al(j)}" for j in range(15))
        docs.append((i, f"{hot} {uniq}"))
    shared = " ".join(f"pair{al(j)}" for j in range(18))
    docs.append((900, f"{hot} {shared} onlyalpha"))
    docs.append((901, f"{hot} {shared} onlybeta"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    res = dedup.prefix_jaccard_pairs(df, threshold=0.9)
    out = res.collect()
    assert {(r.id_a, r.id_b) for r in out} == {(900, 901)}
    # 23 shared of 25 union
    assert abs(out[0].jaccard - round(23 / 25, 6)) < 1e-9
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        res.explain("formatted")
    t = buf.getvalue()
    assert "CartesianProduct" not in t and "BroadcastNestedLoopJoin" not in t
