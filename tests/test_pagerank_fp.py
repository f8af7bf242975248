"""Independent verification of the integer fixed-point PageRank: a
dict-based pure-Python evaluation of the same recurrence must reproduce
the Spark result exactly (integer math has a single correct answer), and
the scaled mass must stay within the floor-loss envelope."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_td2_spark.graph.pagerank import (
    FP_DDEN,
    FP_DNUM,
    FP_SCALE,
    pagerank_fp,
    personalized_pagerank_fp,
)

# fixed small digraph: hub/authority structure + a dangling vertex ("z")
EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"),
    ("e", "c"), ("e", "a"), ("f", "z"), ("c", "z"), ("b", "a"),
    ("d", "a"), ("e", "b"),
]


def _python_reference(edges, reset, num_iter):
    """The recurrence of graph/pagerank.py:_iterate_fp, evaluated naively."""
    verts = sorted({v for e in edges for v in e})
    out_deg = {}
    for s, _ in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    rank = dict(reset)
    for _ in range(num_iter):
        dangling = sum(rank[v] for v in verts if v not in out_deg)
        msg = {v: 0 for v in verts}
        for s, d in edges:
            msg[d] += rank[s] // out_deg[s]
        rank = {
            v: ((FP_DDEN - FP_DNUM) * reset[v]) // FP_DDEN
            + (FP_DNUM * (msg[v] + (dangling * reset[v]) // FP_SCALE)) // FP_DDEN
            for v in verts
        }
    return rank


def _spark_ranks(df):
    return {r["id"]: r["rank_fp"] for r in df.collect()}


def test_fp_pagerank_matches_python_reference(spark):
    edges = spark.createDataFrame(EDGES, schema="src string, dst string")
    verts = sorted({v for e in EDGES for v in e})
    reset = {v: FP_SCALE // len(verts) for v in verts}
    for it in (1, 3, 5):
        got = _spark_ranks(pagerank_fp(edges, num_iter=it))
        assert got == _python_reference(EDGES, reset, it), f"iter={it}"


def test_fp_ppr_matches_python_reference(spark):
    edges = spark.createDataFrame(EDGES, schema="src string, dst string")
    verts = sorted({v for e in EDGES for v in e})
    reset = {v: (FP_SCALE if v == "e" else 0) for v in verts}
    got = _spark_ranks(personalized_pagerank_fp(edges, seeds=["e"], num_iter=5))
    assert got == _python_reference(EDGES, reset, 5)


def test_fp_mass_conservation_envelope(spark):
    """Each update sheds mass only through integer floors: per vertex at
    most 2 units per division site per iteration, and the teleport split
    loses at most n units once. Total mass must stay in
    (SCALE - loss_bound, SCALE]."""
    edges = spark.createDataFrame(EDGES, schema="src string, dst string")
    n = len({v for e in EDGES for v in e})
    it = 5
    ranks = pagerank_fp(edges, num_iter=it)
    total = ranks.agg(F.sum("rank_fp").cast("long")).first()[0]
    loss_bound = n + it * (len(EDGES) + 3 * n)  # init split + per-iter floors
    assert FP_SCALE - loss_bound <= total <= FP_SCALE


def test_fp_weighted_matches_python_reference(spark):
    """Weighted recurrence: contribution rank·w // W(u)."""
    weighted = [(s, d, (i % 3) + 1) for i, (s, d) in enumerate(EDGES)]
    edges = spark.createDataFrame(weighted, schema="src string, dst string, w long")
    verts = sorted({v for s, d, _ in weighted for v in (s, d)})
    reset = {v: FP_SCALE // len(verts) for v in verts}

    out_w = {}
    for s, _, w in weighted:
        out_w[s] = out_w.get(s, 0) + w
    rank = dict(reset)
    for _ in range(4):
        dangling = sum(rank[v] for v in verts if v not in out_w)
        msg = {v: 0 for v in verts}
        for s, d, w in weighted:
            msg[d] += (rank[s] * w) // out_w[s]
        rank = {
            v: ((FP_DDEN - FP_DNUM) * reset[v]) // FP_DDEN
            + (FP_DNUM * (msg[v] + (dangling * reset[v]) // FP_SCALE)) // FP_DDEN
            for v in verts
        }

    got = _spark_ranks(pagerank_fp(edges, num_iter=4, weight="w"))
    assert got == rank
