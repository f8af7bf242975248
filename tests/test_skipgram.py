"""Skip-gram pair extraction (graph/walks.py:walk_skipgram_pairs):
counting law and symmetry."""

from __future__ import annotations

from graphdb_td2_spark.graph.walks import (
    N_STARTS,
    SKIPGRAM_WINDOW,
    WALK_LEN,
    WALKS_PER_START,
    walk_skipgram_pairs,
)


def test_pair_count_law_and_symmetry(spark, sf_dir):
    rows = walk_skipgram_pairs(spark, sf_dir).collect()
    assert rows
    # ordered pairs per walk of length L+1 with |i-j| in [1, W]:
    # sum_{d=1..W} 2*(L+1-d)
    L = WALK_LEN
    per_walk = sum(2 * (L + 1 - d) for d in range(1, SKIPGRAM_WINDOW + 1))
    assert sum(r["n_pairs"] for r in rows) == N_STARTS * WALKS_PER_START * per_walk
    # (center, context) counts are symmetric: every ordered pair's mirror
    # appears with the same count
    counts = {(r["center"], r["context"]): r["n_pairs"] for r in rows}
    assert all(counts[(b, a)] == n for (a, b), n in counts.items())
