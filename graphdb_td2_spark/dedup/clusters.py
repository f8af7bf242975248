"""Cluster-level near-dedup — the end-to-end pipeline operator a
training-data engine actually runs: LSH candidate pairs → undirected
duplicate graph → connected components → one canonical keeper per
cluster (min doc_id).

This composes two independently-oracled pieces: the banded MinHash-LSH
join (``dedup/minhash.py``) and min-label propagation
(``graph/components.py``). The DuckDB twin replays both (signature CTEs +
pointer-jump label propagation), so the composition is value-hash-checked
end-to-end.

Scale notes: the component step runs on the PAIR graph only — near-dup
clusters, typically orders of magnitude smaller than the corpus (singleton
documents never enter the iteration). Cluster diameter is tiny in practice
(dup clusters are near-cliques because every member collides into the same
band buckets), so the propagation converges in a handful of rounds; the
keeper join back to the corpus is a broadcast when the cluster set is
dimension-sized and a plain shuffle join otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..graph.components import connected_components
from .minhash import minhash_lsh_pairs


def duplicate_clusters(pairs: DataFrame) -> DataFrame:
    """``(doc_id, cluster_id)`` for every document that appears in at least
    one candidate pair; ``cluster_id`` = min doc_id reachable through the
    duplicate graph."""
    edges = pairs.select(
        F.col("doc_id_a").alias("src"), F.col("doc_id_b").alias("dst")
    )
    vertices = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    cc = connected_components(vertices, edges)
    return cc.select(F.col("id").alias("doc_id"), F.col("component").alias("cluster_id"))


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate cluster inventory over ``documents``:
    ``(cluster_id, n_docs, n_redundant)`` per multi-document cluster,
    where ``cluster_id`` doubles as the canonical keeper's doc_id and
    ``n_redundant`` is the number of documents dedup would drop."""
    clustered = duplicate_clusters(minhash_lsh_pairs(spark, sf_dir))
    return (
        clustered.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            "cluster_id",
            "n_docs",
            (F.col("n_docs") - F.lit(1)).cast("long").alias("n_redundant"),
        )
    )
