"""Sampled fixed-point Brandes betweenness (graph/betweenness.py):
hand-computed path-graph fixture + corpus invariants (exact corpus
values are pinned by the DuckDB oracle twin)."""

from __future__ import annotations

from graphdb_td2_spark.graph.betweenness import (
    DELTA_SCALE,
    betweenness_fixed_point,
    betweenness_sample_top20,
)


def _sym_adj(spark, edges):
    both = list(edges) + [(b, a) for a, b in edges]
    return spark.createDataFrame(both, "src long, dst long")


def test_path_graph_matches_hand_brandes(spark):
    # 1-2-3-4: interior nodes carry all dependency; with sigma == 1
    # everywhere the floor division is exact, so fp == 1000 × Brandes.
    adj = _sym_adj(spark, [(1, 2), (2, 3), (3, 4)])
    rows = {
        r["node"]: r
        for r in betweenness_fixed_point(adj, n_seeds=4, rounds=4, k=10).collect()
    }
    # per-source dependencies: delta(2) = 2+1+1, delta(3) = 1+1+2
    assert rows[2]["betweenness_fp"] == 4 * DELTA_SCALE
    assert rows[3]["betweenness_fp"] == 4 * DELTA_SCALE
    assert rows[1]["betweenness_fp"] == 0
    assert rows[4]["betweenness_fp"] == 0
    assert all(r["n_seeds_reaching"] == 3 for r in rows.values())


def test_star_graph_center_is_sole_broker(spark):
    # star: center 0, leaves 1..4 — every leaf-to-leaf shortest path
    # crosses the center; leaves broker nothing.
    adj = _sym_adj(spark, [(0, i) for i in range(1, 5)])
    rows = {
        r["node"]: r
        for r in betweenness_fixed_point(adj, n_seeds=5, rounds=4, k=10).collect()
    }
    # from each of 4 leaf sources the center's delta is 3 (3 other leaves)
    assert rows[0]["betweenness_fp"] == 4 * 3 * DELTA_SCALE
    for leaf in range(1, 5):
        assert rows[leaf]["betweenness_fp"] == 0


def test_diamond_splits_dependency_by_sigma(spark):
    # 1-2-4, 1-3-4 (diamond): every opposite-corner pair has TWO
    # shortest paths (sigma = 2), so each intermediate gets
    # floor(1·(1000+0)/2) = 500 from each of its two "far" sources —
    # the fixed-point sigma split. By symmetry all four nodes end at
    # 2 × 500.
    adj = _sym_adj(spark, [(1, 2), (1, 3), (2, 4), (3, 4)])
    rows = {
        r["node"]: r
        for r in betweenness_fixed_point(adj, n_seeds=4, rounds=4, k=10).collect()
    }
    for node in (1, 2, 3, 4):
        assert rows[node]["betweenness_fp"] == 2 * (DELTA_SCALE // 2)
        assert rows[node]["n_seeds_reaching"] == 3


def test_corpus_invariants(spark, sf_dir):
    rows = betweenness_sample_top20(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    scores = [r["betweenness_fp"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r["betweenness_fp"] >= 0
        assert 1 <= r["n_seeds_reaching"] <= 8


def test_error_report_prefix_estimators_are_additive(spark, sf_dir):
    """The report's est8 column must equal an INDEPENDENT 8-seed run of
    the shipped estimator (per-seed dependencies are additive, so the
    16-seed pass's 8-seed prefix IS the 8-seed estimator), and the
    in_est8_topk flag must agree with betweenness_sample_top20's own
    top-k set."""
    from graphdb_td2_spark.graph.betweenness import (
        betweenness_approx_error_report,
        betweenness_sample_top20,
    )

    report = {
        r["node"]: r
        for r in betweenness_approx_error_report(spark, sf_dir).collect()
    }
    own = betweenness_sample_top20(spark, sf_dir).collect()
    own_topk = {r["node"] for r in own}
    own_fp = {r["node"]: r["betweenness_fp"] for r in own}
    checked = 0
    for node, row in report.items():
        assert row["in_est8_topk"] == (node in own_topk)
        if node in own_fp:
            assert row["est8_per_seed_milli"] == own_fp[node] * 1000 // 8
            checked += 1
    assert checked > 0  # the two top-20 sets overlap on this corpus


def test_error_report_nondefault_ref_seeds(spark, sf_dir):
    """ADVICE r10: prefix sizes/divisors must derive from ref_seeds —
    with ref_seeds=8 the est8/est4 columns are the 4- and 2-seed prefix
    estimators (half/quarter), and ref_seeds<4 is rejected."""
    import pytest

    from graphdb_td2_spark.graph.betweenness import (
        betweenness_approx_error_report,
    )

    with pytest.raises(ValueError):
        betweenness_approx_error_report(spark, sf_dir, ref_seeds=3)

    r8 = betweenness_approx_error_report(spark, sf_dir, ref_seeds=8).collect()
    r16 = {
        r["node"]: r
        for r in betweenness_approx_error_report(spark, sf_dir).collect()
    }
    # the 8-seed report's reference column IS the 16-seed report's est8
    # (same seed order, same per-seed normalization) wherever both rank
    # the node
    checked = 0
    for row in r8:
        if row["node"] in r16:
            assert (
                row["ref_per_seed_milli"]
                == r16[row["node"]]["est8_per_seed_milli"]
            )
            checked += 1
    assert checked > 0
