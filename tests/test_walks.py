"""Random-walk corpus (graph/walks.py): shape, edge validity, seed
divergence, determinism."""

from __future__ import annotations

from graphdb_td2_spark.graph.walks import (
    N_STARTS,
    WALK_LEN,
    WALKS_PER_START,
    copurchase_adjacency,
    product_random_walks,
)


def test_walks_shape_edges_and_determinism(spark, sf_dir):
    rows = product_random_walks(spark, sf_dir).collect()
    assert len(rows) == N_STARTS * WALKS_PER_START * (WALK_LEN + 1)

    walks: dict[int, list[int]] = {}
    for r in sorted(rows, key=lambda r: (r["walk_id"], r["step"])):
        walks.setdefault(r["walk_id"], []).append(r["node"])
    assert all(len(w) == WALK_LEN + 1 for w in walks.values())

    # every consecutive hop is a real co-purchase edge
    edges = {
        (r["src"], r["dst"]) for r in copurchase_adjacency(spark, sf_dir).collect()
    }
    for w in walks.values():
        for a, b in zip(w, w[1:]):
            assert (a, b) in edges

    # the hash salt makes sibling walks from the same start diverge
    # somewhere (over 20 starts at least one pair must differ)
    diverged = sum(
        walks[s * WALKS_PER_START] != walks[s * WALKS_PER_START + 1]
        for s in {wid // WALKS_PER_START for wid in walks}
        if s * WALKS_PER_START + 1 in walks
    )
    assert diverged > 0

    again = product_random_walks(spark, sf_dir).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))
