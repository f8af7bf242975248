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

Scale notes: messages are emitted only from the *improved* frontier of
the previous round (for weighted relaxation a settled vertex can improve
again, so the frontier is "distance changed", not "newly reached" —
still a fraction of the vertex set after the first rounds). On graphs
under the broadcast bar the per-round plan is exchange-free on the big
relations: the frontier broadcasts into the persisted edge join and the
min-combined messages broadcast into the distance merge (the
betweenness/pagerank state-side discipline — the only shuffle left per
round is the message combine, bounded by edges-out-of-frontier). Above
the bar every join falls back to the co-partitioned path with identical
results (MIN over BIGINTs is order-free). ``localCheckpoint`` per round
keeps Catalyst re-analysis linear (see graph/pagerank.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .checkpointing import (
    resolve_broadcast_state,
    state_partitions,
    truncate_lineage,
)
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
    small = resolve_broadcast_state(None, n_vertices)
    if small:
        parts = state_partitions(n_vertices, und)
        und = und.repartition(parts, "src")
        vertices = vertices.repartition(parts)
    bc = F.broadcast if small else (lambda df: df)
    und = und.persist()
    dist = vertices.select(
        "id",
        F.when(F.col("id") == seed, F.lit(0)).cast("long").alias("distance"),
    ).transform(truncate_lineage)
    frontier = dist.filter(F.col("distance").isNotNull()).transform(truncate_lineage)
    # ONE driver action per round (the hits_fp discipline): only the new
    # distance vector checkpoints eagerly; the frontier checkpoints LAZILY
    # and materializes inside the NEXT round's action, which still reads
    # this round's persisted `merged` — so the persist is released one
    # round LATE, keeping live state bounded at und + dist + one merged.
    prev_merged: list = []
    for _ in range(rounds):
        # min-combined messages out of the frontier (the ONE per-round
        # shuffle), then an exchange-free merge: least() skips NULLs, so
        # least(msg, old) IS min-with-unreached-as-infinity — exactly the
        # relaxation the union+groupBy formulation computed
        msgs = (
            und.join(bc(frontier), und.src == F.col("id"))
            .select(
                F.col("dst").alias("id"),
                (F.col("distance") + F.col("w")).alias("msg"),
            )
            .groupBy("id")
            .agg(F.min("msg").alias("msg"))
        )
        merged = dist.join(bc(msgs), "id", "left").persist()
        relaxed = merged.select(
            "id", F.least("msg", "distance").alias("distance")
        ).transform(truncate_lineage)
        if prev_merged:
            prev_merged.pop().unpersist()
        frontier = (
            merged.filter(
                F.col("msg").isNotNull()
                & (F.col("distance").isNull() | (F.col("msg") < F.col("distance")))
            )
            .select("id", F.col("msg").alias("distance"))
        ).transform(truncate_lineage, eager=False)
        prev_merged.append(merged)
        dist = relaxed
    if prev_merged:
        prev_merged.pop().unpersist()
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
