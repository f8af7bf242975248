"""Weighted single-source shortest paths [extension to §2.L] — the
Cypher ``shortestPath`` surface generalized to weighted edges (CONTAINS
carries its order quantity, every other relationship weighs 1; cf.
``weighted_pagerank_top20``). Bellman-Ford relaxation as iterative
DataFrame min-aggregation.

Fixed round count (``MAX_ROUNDS``) instead of convergence detection, for
the same reason as :mod:`graphdb_td2_spark.graph.bfs`: both engines run
the identical recurrence the identical number of times, so the unrolled
chained-CTE DuckDB twin matches bit-exactly. Distances are exact BIGINTs
(integer weights), so the full value hash is checked, not just rows.

Scale notes: one shuffle per round on a vertex-sized frame; messages are
emitted only from the *improved* frontier of the previous round (for
weighted relaxation a settled vertex can improve again, so the frontier
is "distance changed", not "newly reached" — still a fraction of the
vertex set after the first rounds). ``localCheckpoint`` per round keeps
Catalyst re-analysis linear (see graph/pagerank.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .checkpointing import truncate_lineage
from .queries import cached_graph

MAX_ROUNDS = 6
SSSP_TOPK = 20


def _undirected_min_edges(edges_w: DataFrame) -> DataFrame:
    """Symmetrized edge list with parallel edges collapsed to their
    minimum weight (two C→P event types, say, relax identically)."""
    return (
        edges_w.select("src", "dst", "w")
        .union(
            edges_w.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("w")
            )
        )
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
    )


def sssp_distances(
    vertices: DataFrame,
    edges_w: DataFrame,
    seed: str,
    rounds: int = MAX_ROUNDS,
    n_vertices: int | None = None,
) -> DataFrame:
    """``(id, distance)`` — minimum edge-weight sum over paths of at most
    ``rounds`` undirected hops from ``seed``; NULL when unreached."""
    und = _undirected_min_edges(edges_w)
    if n_vertices is not None and n_vertices <= 5_000_000:
        parts = max(1, int(n_vertices // 250_000) + 1)
        und = und.repartition(parts, "src")
        vertices = vertices.repartition(parts)
    und = und.persist()
    dist = vertices.select(
        "id",
        F.when(F.col("id") == seed, F.lit(0)).cast("long").alias("distance"),
    ).transform(truncate_lineage)
    frontier = dist.filter(F.col("distance").isNotNull()).transform(truncate_lineage)
    for _ in range(rounds):
        relaxed = (
            und.join(frontier, und.src == F.col("id"))
            .select(
                F.col("dst").alias("id"),
                (F.col("distance") + F.col("w")).alias("distance"),
            )
            .union(dist.select("id", "distance"))
            .groupBy("id")
            .agg(F.min("distance").alias("distance"))
        ).transform(truncate_lineage)
        frontier = (
            relaxed.alias("new")
            .join(dist.alias("old"), "id")
            .filter(
                F.col("new.distance").isNotNull()
                & (
                    F.col("old.distance").isNull()
                    | (F.col("new.distance") < F.col("old.distance"))
                )
            )
            .select("id", F.col("new.distance").alias("distance"))
        ).transform(truncate_lineage)
        dist = relaxed
    und.unpersist()
    return dist


def sssp_top20(
    spark: SparkSession, sf_dir: str, seed: str = "C:1", rounds: int = MAX_ROUNDS
) -> DataFrame:
    """The 20 vertices nearest ``seed`` by weighted distance (distance
    asc, id asc — deterministic), seed included at distance 0."""
    g = cached_graph(spark, sf_dir)
    edges_w = g.edges.select(
        "src",
        "dst",
        F.floor(F.coalesce(F.col("quantity"), F.lit(1.0))).cast("long").alias("w"),
    )
    dist = sssp_distances(
        g.vertices, edges_w, seed, rounds, n_vertices=g.vertices.count()
    )
    return (
        dist.filter(F.col("distance").isNotNull())
        .orderBy(F.asc("distance"), F.asc("id"))
        .limit(SSSP_TOPK)
    )
