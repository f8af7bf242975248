"""Property-based reference model for HITS (graph/hits.py): the Spark
fixed-point loop must equal the straight-line Python model on arbitrary
hypothesis-generated digraphs — including multi-edges, self-loops,
disconnected vertices, and hub-only/authority-only nodes. Spark examples
use small budgets (each example is a distributed job)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from graphdb_td2_spark.graph.hits import hits_fp


def _reference_hits(edges, num_iter):
    from graphdb_td2_spark.graph.pagerank import FP_SCALE

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


edges_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", "d", "e"]),
        st.sampled_from(["a", "b", "c", "d", "e"]),
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=8, deadline=None)
@given(edges=edges_strategy)
def test_hits_fp_equals_python_model_on_random_digraphs(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["id"]: (r["auth_fp"], r["hub_fp"])
        for r in hits_fp(df, num_iter=2).collect()
    }
    assert got == _reference_hits(edges, 2)
