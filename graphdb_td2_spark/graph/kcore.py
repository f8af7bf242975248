"""k-core decomposition [extension] — iterative peeling on the L3
"graph algorithms Catalyst can't express" tier, alongside PageRank,
components, and BFS: repeatedly drop vertices whose degree in the
surviving subgraph is below ``k``. The fixed point is the k-core — the
standard dense-substructure primitive (community seeds, spam/bot rings,
graph sparsification before expensive analytics).

Determinism for the oracle: BOTH engines run a FIXED number of peeling
rounds (like ``bfs.py``), so intermediate states match even before
convergence; the per-round surviving-vertex counts are the query output
(monotone non-increasing, and constant once converged).

Loop discipline (same as pagerank/components): the surviving edge set
re-enters the next round's plan through the degree aggregate and two
semi-joins, so its lineage is truncated EVERY round via the session's
checkpoint mode (``graph/checkpointing.py``); each round costs one degree
shuffle + two hash-semi-joins over the shrinking edge set — at 100 TB the
first rounds dominate and are plain word-count-shaped aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .checkpointing import truncate_lineage
from .queries import cached_graph

KCORE_K = 2
KCORE_ROUNDS = 6


def kcore_round_sizes(
    edges: DataFrame, k: int = KCORE_K, rounds: int = KCORE_ROUNDS
) -> DataFrame:
    """``(round, n_vertices)`` after each of ``rounds`` peeling steps over
    the undirected multigraph-collapsed edge set."""
    spark = edges.sparkSession
    und = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .transform(truncate_lineage)
    )
    sizes: list[tuple[int, int]] = []
    active = und
    for r in range(1, rounds + 1):
        keep = (
            active.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select(F.col("src").alias("id"))
        ).transform(truncate_lineage)
        sizes.append((r, keep.count()))
        active = (
            active.join(keep.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst")
        ).transform(truncate_lineage)
    return spark.createDataFrame(sizes, "round long, n_vertices long")


def kcore_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: per-round surviving-vertex counts of 2-core peeling
    over the full property graph (fixed 6 rounds, oracle-exact — the
    DuckDB twin unrolls the same rounds as chained CTEs)."""
    g = cached_graph(spark, sf_dir)
    return kcore_round_sizes(g.edges.select("src", "dst")).orderBy("round")
