"""Centrality family (graph/centrality.py): degree-histogram accounting
and a hand-computed harmonic fixture on a path graph."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_td2_spark.graph.centrality import (
    HARMONIC_LCM,
    degree_distribution,
    harmonic_centrality_top20,
)
from graphdb_td2_spark.graph.walks import copurchase_adjacency


def test_degree_histogram_accounts_for_every_vertex(spark, sf_dir):
    rows = degree_distribution(spark, sf_dir).collect()
    assert rows
    n_src = (
        copurchase_adjacency(spark, sf_dir).select("src").distinct().count()
    )
    assert sum(r["n_vertices"] for r in rows) == n_src
    for r in rows:
        lo, hi = 1 << r["degree_bucket"], (1 << (r["degree_bucket"] + 1)) - 1
        assert lo <= r["min_degree"] <= r["max_degree"] <= hi


def test_harmonic_path_graph_fixture(spark, tmp_path):
    # orders 0..4 chain products into a path 10-11-12-13-14-15 via
    # consecutive co-purchases
    rows = []
    for o, (a, b) in enumerate(
        [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15)]
    ):
        rows += [(o, a, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", None),
                 (o, b, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", None)]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    d = tmp_path / "fx"
    df.write.parquet(str(d / "lineitem.parquet"))
    got = {
        r["node"]: (r["harmonic_fp"], r["n_reached"])
        for r in harmonic_centrality_top20(spark, str(d), n_seeds=2).collect()
    }
    # seeds are 10 and 11 on the path 10-11-12-13-14-15 (R=4, lcm 12):
    # node 11: d(10,11)=1 → 12                (self never counts)
    # node 12: d(10)=2, d(11)=1 → 6+12=18
    # node 13: d(10)=3, d(11)=2 → 4+6=10
    # node 14: d(10)=4, d(11)=3 → 3+4=7
    # node 15: d(11)=4 → 3 (10 is 5 away — beyond R)
    # node 10: d(11,10)=1 → 12
    assert got == {
        10: (12, 1),
        11: (12, 1),
        12: (18, 2),
        13: (10, 2),
        14: (7, 2),
        15: (3, 1),
    }
    # and on the corpus: scores are positive multiples consistent with
    # n_reached bounds (each reached seed contributes 3..12 twelfths)
    corpus = harmonic_centrality_top20(spark, "/root/testdata/sf0.001").collect()
    for r in corpus:
        assert 3 * r["n_reached"] <= r["harmonic_fp"] <= HARMONIC_LCM * r["n_reached"]


def test_rich_club_monotone_membership(spark, sf_dir):
    from graphdb_td2_spark.graph.centrality import rich_club_coefficients

    rows = {r["k"]: r for r in rich_club_coefficients(spark, sf_dir).collect()}
    assert set(rows) == {8, 16, 32}
    # raising k shrinks the club and its internal edge count
    assert rows[8]["n_nodes"] >= rows[16]["n_nodes"] >= rows[32]["n_nodes"]
    assert rows[8]["n_edges_within"] >= rows[16]["n_edges_within"]
    for r in rows.values():
        if r["phi"] is not None:
            assert 0.0 <= r["phi"] <= 1.0
