"""Label-propagation community detection [extension] — the L3 companion
to PageRank/components/k-core (SURVEY.md §4 item 1 tier: iterative graph
algorithms Catalyst cannot express in one query).

Synchronous LPA with a DETERMINISTIC tie-break and a SELF-VOTE: every
vertex starts labeled with its own id; each round a vertex adopts the
most frequent label among its neighbors plus its own current label, ties
broken by MINIMUM label, isolated vertices keep their label. Vanilla LPA
breaks ties randomly and is order-dependent, and the pure-neighbor
synchronous variant OSCILLATES on bipartite structures (a two-vertex
edge flips labels forever); the self-vote damps the oscillation and the
(count DESC, label ASC) tie-break makes the fixed-round result a pure
function of the graph — which is what lets a DuckDB oracle reproduce it
exactly (unrolled one-CTE-per-round, same round count).

Scale notes: each round is one shuffle-join (undirected edges × labels,
both keyed by vertex) + one (vertex, label) partial-aggregated count + a
per-vertex top-1 window — the same per-round cost envelope as PageRank;
lineage is truncated every round (``graph/checkpointing.py``) so plan
analysis stays O(1) per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .checkpointing import truncate_lineage
from .queries import cached_graph

DEFAULT_ROUNDS = 4  # fixed — both engines run exactly this many


def label_propagation(
    vertices: DataFrame, edges: DataFrame, rounds: int = DEFAULT_ROUNDS
) -> DataFrame:
    """``(id, lbl)`` after ``rounds`` synchronous LPA rounds (undirected
    edges; most frequent label among neighbors + self, ties to the
    minimum label)."""
    und = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    labels = vertices.select("id", F.col("id").alias("lbl")).transform(
        truncate_lineage
    )
    top1 = Window.partitionBy("id").orderBy(F.desc("c"), F.asc("lbl"))
    for _ in range(rounds):
        votes = (
            und.join(labels, und.src == labels.id)
            .select(F.col("dst").alias("id"), "lbl")
            .unionByName(labels.select("id", "lbl"))  # self-vote
        )
        counts = votes.groupBy("id", "lbl").agg(F.count(F.lit(1)).alias("c"))
        best = (
            counts.withColumn("rn", F.row_number().over(top1))
            .filter(F.col("rn") == 1)
            .select("id", F.col("lbl").alias("new_lbl"))
        )
        labels = (
            labels.join(best, "id", "left")
            .select("id", F.coalesce("new_lbl", "lbl").alias("lbl"))
            .transform(truncate_lineage)
        )
    und.unpersist()
    return labels


def community_sizes(
    spark: SparkSession, sf_dir: str, rounds: int = DEFAULT_ROUNDS
) -> DataFrame:
    """Community-size histogram of the property graph after fixed-round
    LPA: ``(size, n_communities)`` ordered by size descending."""
    g = cached_graph(spark, sf_dir)
    lp = label_propagation(g.vertices, g.edges, rounds=rounds)
    return (
        lp.groupBy("lbl")
        .agg(F.count(F.lit(1)).alias("size"))
        .groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_communities"))
        .orderBy(F.desc("size"))
    )
