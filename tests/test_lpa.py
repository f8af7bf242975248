"""Deterministic label propagation on hand-traceable fixtures: with the
self-vote and min-label tie-break, a 4-clique collapses to its minimum id
in ONE round (every vertex's votes tie → min label wins), so two disjoint
cliques yield exactly two communities, and a single edge pair converges
instead of oscillating."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_td2_spark.graph.lpa import label_propagation


def _clique_edges(ids):
    return [
        (a, b) for a in ids for b in ids if a < b
    ]


def test_two_disjoint_cliques_two_communities(spark):
    ids = ["a", "b", "c", "d", "e", "f", "g", "h"]
    vertices = spark.createDataFrame([(i,) for i in ids], "id string")
    edges = spark.createDataFrame(
        _clique_edges(ids[:4]) + _clique_edges(ids[4:]), "src string, dst string"
    ).withColumn("rel_type", F.lit("X"))
    got = {
        r.id: r.lbl for r in label_propagation(vertices, edges, rounds=4).collect()
    }
    assert {got[i] for i in ids[:4]} == {"a"}
    assert {got[i] for i in ids[4:]} == {"e"}


def test_isolated_vertex_keeps_label(spark):
    vertices = spark.createDataFrame([("a",), ("b",), ("z",)], "id string")
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    got = {
        r.id: r.lbl for r in label_propagation(vertices, edges, rounds=3).collect()
    }
    assert got["z"] == "z"  # no neighbors — label never changes
    assert got["a"] == "a" and got["b"] == "a"  # pair converges to the min
