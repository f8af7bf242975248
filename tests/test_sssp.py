"""Weighted SSSP (graph/sssp.py): Bellman-Ford semantics on a hand-built
graph where the weighted shortest path differs from the fewest-hop path."""

from __future__ import annotations

from graphdb_td2_spark.graph.sssp import sssp_distances, sssp_top20


def _graph(spark, edges):
    ids = sorted({v for e in edges for v in e[:2]})
    vertices = spark.createDataFrame([(i,) for i in ids], "id string")
    edges_df = spark.createDataFrame(edges, "src string, dst string, w long")
    return vertices, edges_df


def test_weighted_beats_fewest_hops(spark):
    # a -10-> d direct, but a -1-> b -1-> c -1-> d is cheaper (3 < 10)
    vertices, edges = _graph(
        spark,
        [("a", "d", 10), ("a", "b", 1), ("b", "c", 1), ("c", "d", 1)],
    )
    dist = {
        r["id"]: r["distance"]
        for r in sssp_distances(vertices, edges, "a", rounds=4).collect()
    }
    assert dist == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_parallel_edges_min_collapse_and_symmetry(spark):
    # two parallel a-b edges: the lighter one wins; traversal is undirected
    vertices, edges = _graph(spark, [("a", "b", 5), ("a", "b", 2), ("c", "b", 4)])
    dist = {
        r["id"]: r["distance"]
        for r in sssp_distances(vertices, edges, "c", rounds=3).collect()
    }
    assert dist == {"c": 0, "b": 4, "a": 6}


def test_round_cap_leaves_far_vertices_null(spark):
    vertices, edges = _graph(
        spark, [("a", "b", 1), ("b", "c", 1), ("c", "d", 1)]
    )
    dist = {
        r["id"]: r["distance"]
        for r in sssp_distances(vertices, edges, "a", rounds=2).collect()
    }
    assert dist["c"] == 2 and dist["d"] is None


def test_corpus_top20_contract(spark, sf_dir):
    rows = sssp_top20(spark, sf_dir).collect()
    assert len(rows) == 20
    assert rows[0]["id"] == "C:1" and rows[0]["distance"] == 0
    dists = [r["distance"] for r in rows]
    assert dists == sorted(dists)
