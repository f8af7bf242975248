"""PageRank / Personalized PageRank — the reference's declared TODO
(``app/main.py:31-33``: "Switch to Personalized PageRank (PPR) when GDS is
present"; the GDS plugin is installed but unused, ``docker-compose.yml:23``).

Catalyst cannot express iteration (SURVEY.md §4), so this is the one
genuinely imperative loop in the engine: a DataFrame power iteration in the
GraphX/Pregel spirit — per-iteration message = rank/out_degree shipped along
edges, aggregated by destination, with damping and dangling-mass
redistribution. PySpark exposes no GraphX bindings, so the DataFrame loop is
the idiomatic route (it is also what GraphFrames does under the hood for its
non-GraphX paths).

Scale notes: each iteration is one shuffle (groupBy dst) plus one broadcast
join against the rank vector when it is dimension-sized; lineage is truncated
with ``localCheckpoint`` every few iterations so plans don't grow unboundedly
(on a cluster with an HDFS checkpoint dir, swap for ``checkpoint``). The
dangling-mass term costs one small aggregate action per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_CHECKPOINT_EVERY = 3


def _vertices_of(edges: DataFrame, src: str, dst: str) -> DataFrame:
    return (
        edges.select(F.col(src).alias("id"))
        .unionByName(edges.select(F.col(dst).alias("id")))
        .distinct()
    )


def _iterate(
    edges: DataFrame,
    vertices: DataFrame,
    reset: DataFrame,  # id, reset  (teleport distribution, sums to 1)
    num_iter: int,
    damping: float,
    src: str,
    dst: str,
) -> DataFrame:
    edges = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_degree"))
    # Start from the teleport distribution.
    ranks = reset.select("id", F.col("reset").alias("rank"))
    edges = edges.persist()
    out_deg = out_deg.persist()
    reset = reset.persist()

    # The dangling-vertex set is static; compute it once so graphs without
    # dangling vertices skip the per-iteration driver action entirely.
    dangling_ids = vertices.join(
        out_deg.select(F.col("src").alias("id")), "id", "left_anti"
    ).persist()
    has_dangling = dangling_ids.limit(1).count() > 0

    for i in range(num_iter):
        contribs = (
            edges.join(ranks.withColumnRenamed("id", "src"), "src")
            .join(out_deg, "src")
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("out_degree")).alias("contrib"),
            )
            .groupBy("id")
            .agg(F.sum("contrib").alias("msg"))
        )
        # Rank mass sitting on dangling vertices (no out-edges) is
        # redistributed through the teleport vector, keeping sum(rank)=1.
        dangling = 0.0
        if has_dangling:
            dangling_row = (
                ranks.join(dangling_ids, "id").agg(F.sum("rank")).first()
            )
            dangling = float(dangling_row[0] or 0.0)
        ranks = (
            vertices.join(contribs, "id", "left")
            .join(reset, "id", "left")
            .select(
                "id",
                (
                    (1.0 - damping) * F.coalesce(F.col("reset"), F.lit(0.0))
                    + damping
                    * (
                        F.coalesce(F.col("msg"), F.lit(0.0))
                        + dangling * F.coalesce(F.col("reset"), F.lit(0.0))
                    )
                ).alias("rank"),
            )
        )
        if (i + 1) % _CHECKPOINT_EVERY == 0 and i + 1 < num_iter:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def pagerank(
    edges: DataFrame,
    num_iter: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Uniform-teleport PageRank over an edge DataFrame → ``(id, rank)``."""
    vertices = _vertices_of(edges, src, dst).persist()
    n = vertices.count()
    reset = vertices.withColumn("reset", F.lit(1.0 / n))
    return _iterate(edges, vertices, reset, num_iter, damping, src, dst)


def personalized_pagerank(
    edges: DataFrame,
    seeds: list,
    num_iter: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """PPR: teleport only to ``seeds`` (uniformly across them) → the
    recommendation scoring the reference wanted from Neo4j GDS
    (``app/main.py:31-33``). Returns ``(id, rank)``."""
    vertices = _vertices_of(edges, src, dst).persist()
    w = 1.0 / len(seeds)
    reset = vertices.withColumn(
        "reset",
        F.when(F.col("id").isin(*seeds), F.lit(w)).otherwise(F.lit(0.0)),
    )
    return _iterate(edges, vertices, reset, num_iter, damping, src, dst)
