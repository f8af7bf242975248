"""Motif-compiler tests: parser, join-chain semantics vs hand-built joins
on the real graph, path multiplicity, negation, and error paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphdb_td2_spark.graph.build import build_graph
from graphdb_td2_spark.io import load_tables
from graphdb_td2_spark.plans import exclude_motif, find_motif
from graphdb_td2_spark.plans.motif import parse_pattern

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def edges(spark):
    return build_graph(load_tables(spark, SF_DIR)).edges.cache()


def test_parse_pattern_directions():
    assert parse_pattern("(a)-[:R]->(b)") == [("a", "R", "b")]
    assert parse_pattern("(a)<-[:R]-(b)") == [("b", "R", "a")]
    assert parse_pattern("(a)-[:R1]->(b)-[:R2]->(c)") == [
        ("a", "R1", "b"),
        ("b", "R2", "c"),
    ]
    assert parse_pattern("(o)-[:C]->(p); (o)-[:C]->(q)") == [
        ("o", "C", "p"),
        ("o", "C", "q"),
    ]
    with pytest.raises(ValueError):
        parse_pattern("(a)-[R]->(b)")
    with pytest.raises(ValueError):
        parse_pattern("")


def test_cooccurrence_motif_matches_manual_join(spark, edges):
    """C1: the 2-hop basket co-occurrence as a motif equals the manual
    CONTAINS self-join, including path multiplicity."""
    motif = find_motif(edges, "(o)-[:CONTAINS]->(p); (o)-[:CONTAINS]->(q)").filter(
        F.col("p") != F.col("q")
    )
    contains = edges.filter(F.col("rel_type") == "CONTAINS").select("src", "dst")
    manual = (
        contains.alias("a")
        .join(contains.alias("b"), F.col("a.src") == F.col("b.src"))
        .filter(F.col("a.dst") != F.col("b.dst"))
    )
    assert motif.count() == manual.count()
    got = motif.groupBy("p").count().orderBy(F.desc("count"), "p").limit(5).collect()
    want = (
        manual.groupBy(F.col("a.dst").alias("p"))
        .count()
        .orderBy(F.desc("count"), "p")
        .limit(5)
        .collect()
    )
    assert [(r.p, r["count"]) for r in got] == [(r.p, r["count"]) for r in want]


def test_three_hop_chain(spark, edges):
    """C3: (c)-[:PLACED]->(o)-[:CONTAINS]->(p) — chained hops bind across
    path atoms."""
    df = find_motif(edges, "(c)-[:PLACED]->(o)-[:CONTAINS]->(p)")
    placed = edges.filter(F.col("rel_type") == "PLACED").alias("pl")
    contains = edges.filter(F.col("rel_type") == "CONTAINS").alias("co")
    want = placed.join(contains, F.col("pl.dst") == F.col("co.src")).count()
    assert df.count() == want
    assert set(df.columns) == {"c", "o", "p"}


def test_exclude_motif_is_anti_join(spark, edges):
    """C5: candidates minus already-purchased via pattern negation."""
    cands = find_motif(edges, "(o)-[:CONTAINS]->(p)").select("p").distinct()
    seed_c = (
        edges.filter(F.col("rel_type") == "PLACED").select(F.col("src").alias("c")).first().c
    )
    purchased = (
        find_motif(edges, "(c)-[:PLACED]->(o)-[:CONTAINS]->(p)")
        .filter(F.col("c") == seed_c)
        .select("p")
        .distinct()
    )
    remaining = exclude_motif(
        cands,
        edges.filter(F.col("rel_type").isin("PLACED", "CONTAINS")),
        f"(c)-[:PLACED]->(o)-[:CONTAINS]->(p)",
        on=["p"],
    )
    # excluding ALL customers' purchases = cands minus union of purchases
    all_purchased = (
        find_motif(edges, "(c)-[:PLACED]->(o)-[:CONTAINS]->(p)").select("p").distinct()
    )
    assert remaining.count() == cands.count() - cands.join(all_purchased, "p").count()
    assert purchased.count() > 0


def test_disconnected_pattern_raises(spark, edges):
    with pytest.raises(ValueError, match="disconnected"):
        find_motif(edges, "(a)-[:PLACED]->(b); (x)-[:CONTAINS]->(y)").count()
