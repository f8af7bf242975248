"""HITS hubs/authorities (graph/hits.py) — fixed-point parity against a
pure-Python reference model, plus structural invariants on the corpus
graph entry."""

from __future__ import annotations

from graphdb_td2_spark.graph.hits import HITS_ITER, hits_fp, hits_top20
from graphdb_td2_spark.graph.pagerank import FP_SCALE


def _reference_hits(edges: list[tuple[str, str]], num_iter: int) -> dict:
    """The exact integer algorithm, straight-line Python."""
    verts = sorted({v for e in edges for v in e})
    hub = {v: FP_SCALE for v in verts}
    auth = {}
    for _ in range(num_iter):
        raw = {v: 0 for v in verts}
        for s, d in edges:
            raw[d] += hub[s]
        norm = max(sum(raw.values()) // FP_SCALE, 1)
        auth = {v: raw[v] // norm for v in verts}
        raw = {v: 0 for v in verts}
        for s, d in edges:
            raw[s] += auth[d]
        norm = max(sum(raw.values()) // FP_SCALE, 1)
        hub = {v: raw[v] // norm for v in verts}
    return {v: (auth[v], hub[v]) for v in verts}


EDGES = [
    # two hubs endorsing a shared authority, one weaker side authority,
    # plus a disconnected pair — exercises zero-score vertices both ways
    ("h1", "a1"),
    ("h2", "a1"),
    ("h2", "a2"),
    ("x", "y"),
]


def test_hits_matches_reference_model(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {
        r["id"]: (r["auth_fp"], r["hub_fp"])
        for r in hits_fp(df, num_iter=HITS_ITER).collect()
    }
    assert got == _reference_hits(EDGES, HITS_ITER)


def test_hits_mutual_reinforcement(spark):
    """a1 (endorsed by both strong hubs) must out-rank a2, and h2 (which
    endorses both authorities) must be the top hub."""
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r["id"]: r for r in hits_fp(df, num_iter=HITS_ITER).collect()}
    assert got["a1"]["auth_fp"] > got["a2"]["auth_fp"] > 0
    assert got["h2"]["hub_fp"] == max(r["hub_fp"] for r in got.values())
    # pure hubs carry zero authority; pure authorities carry zero hub
    assert got["h1"]["auth_fp"] == 0
    assert got["a1"]["hub_fp"] == 0


def test_hits_top20_corpus_shape(spark, sf_dir):
    rows = hits_top20(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    assert [r["id"] for r in rows] == [
        r["id"]
        for r in sorted(rows, key=lambda r: (-r["auth_fp"], r["id"]))
    ]
    # authorities on this graph are products/orders/categories (something
    # is pointed AT); scores are normalized so the top stays <= ~FP_SCALE
    assert all(r["auth_fp"] > 0 for r in rows)
    assert all(abs(r["auth"] - r["auth_fp"] / FP_SCALE) < 1e-12 for r in rows)
