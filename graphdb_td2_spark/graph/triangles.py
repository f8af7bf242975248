"""Triangle counting over the product co-occurrence graph [extension].

Extends the reference's L2 co-occurrence scoring (``app/main.py:51-69``)
from seeded 2-hop queries to a whole-graph structural metric. The graph:
products are adjacent iff they appear in ≥ ``min_weight`` distinct common
orders (weight = distinct co-orders, the same D1 statistic the recs
queries rank by, computed globally like ``top_cooccurrence_pairs``).

Shape: edges are stored once, oriented ``pa < pb``; a triangle a<b<c is
found by joining (a,b)⋈(b,c) into wedges and closing against (a,c) — all
equi-joins, fully SQL-expressible (exact DuckDB oracle).

Scale notes: wedge generation is the classic hot spot — its size is
Σ deg²(v). Orienting edges by vertex id (done here) keeps each triangle
counted exactly once; at skewed degree distributions the standard
refinement is degree-ordering the orientation so high-degree vertices
never anchor wedges. The ``min_weight`` support threshold is the primary
scale lever (weight-1 pairs dominate volume and carry the least signal);
AQE skew-join splitting covers residual hot vertices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .checkpointing import truncate_lineage

from ..io import read_table
from .build import contains_pairs

DEFAULT_MIN_WEIGHT = 2


def cooccurrence_edges(lineitem: DataFrame, min_weight: int = DEFAULT_MIN_WEIGHT) -> DataFrame:
    """Undirected co-occurrence edges ``(pa < pb, weight)`` with support
    ≥ ``min_weight`` distinct common orders."""
    pairs = contains_pairs(lineitem)
    a, b = pairs.alias("a"), pairs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.order_id") == F.col("b.order_id"))
            & (F.col("a.product_id") < F.col("b.product_id")),
        )
        .groupBy(
            F.col("a.product_id").alias("pa"),
            F.col("b.product_id").alias("pb"),
        )
        .agg(F.count(F.lit(1)).alias("weight"))
        .filter(F.col("weight") >= min_weight)
    )


def triangle_stats(
    spark: SparkSession, sf_dir: str, min_weight: int = DEFAULT_MIN_WEIGHT
) -> DataFrame:
    """One-row structural summary: nodes, edges and triangles of the
    support-thresholded co-occurrence graph."""
    lineitem = read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    # The edge relation feeds six plan legs (3 triangle arms + node/edge
    # counts); materialize it ONCE — without this the co-occurrence
    # self-join (and its lineitem scans) replays per leg (12 scans, audited
    # in PLANS.md). At 100 TB this is "materialize the co-occurrence edge
    # table", the artifact a production graph pipeline persists anyway.
    edges = cooccurrence_edges(lineitem, min_weight).transform(truncate_lineage)

    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    triangles = (
        e1.join(e2, F.col("e1.pb") == F.col("e2.pa"))
        .join(
            e3,
            (F.col("e3.pa") == F.col("e1.pa")) & (F.col("e3.pb") == F.col("e2.pb")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    nodes = (
        edges.select(F.col("pa").alias("p"))
        .union(edges.select(F.col("pb").alias("p")))
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        nodes.crossJoin(n_edges)
        .crossJoin(triangles)
        .select(
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("n_triangles").cast("long").alias("n_triangles"),
        )
    )


def edge_support_histogram(
    spark: SparkSession, sf_dir: str, min_weight: int = DEFAULT_MIN_WEIGHT
) -> DataFrame:
    """Registry entry: ``(support, n_edges)`` — distribution of per-edge
    triangle support over the co-occurrence graph (how many triangles
    each edge closes), the statistic k-truss decomposition peels on.
    Ordered by support descending.

    Shape: the oriented wedge-close join of ``triangle_stats`` kept AS
    ROWS ``(a, b, c)``, exploded into its three edges, counted per edge,
    then left-joined back so support-0 edges appear. Output is bounded
    by the distinct support values (≪ edges).

    Scale notes: same wedge hot spot and the same two levers
    (``min_weight`` support threshold, AQE skew split); the explode is
    a fixed 3× of the triangle count; the histogram is partial-agged.
    """
    lineitem = read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    edges = cooccurrence_edges(lineitem, min_weight).transform(truncate_lineage)
    return (
        _edge_support(edges)
        .select("support")
        .groupBy("support")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        .orderBy(F.desc("support"))
    )


def _edge_support(edges: DataFrame) -> DataFrame:
    """``(pa, pb, support)`` for every edge: the number of oriented
    triangles (a<b<c) the edge participates in (0 included)."""
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tris = (
        e1.join(e2, F.col("e1.pb") == F.col("e2.pa"))
        .join(
            e3,
            (F.col("e3.pa") == F.col("e1.pa")) & (F.col("e3.pb") == F.col("e2.pb")),
        )
        .select(
            F.col("e1.pa").alias("a"),
            F.col("e1.pb").alias("b"),
            F.col("e2.pb").alias("c"),
        )
    )
    tri_edges = (
        tris.select(F.col("a").alias("pa"), F.col("b").alias("pb"))
        .unionAll(tris.select(F.col("b").alias("pa"), F.col("c").alias("pb")))
        .unionAll(tris.select(F.col("a").alias("pa"), F.col("c").alias("pb")))
    )
    support = tri_edges.groupBy("pa", "pb").agg(
        F.count(F.lit(1)).cast("long").alias("support")
    )
    return edges.select("pa", "pb").join(support, ["pa", "pb"], "left").select(
        "pa", "pb", F.coalesce("support", F.lit(0)).cast("long").alias("support")
    )


KTRUSS_K = 4
KTRUSS_ROUNDS = 2


def ktruss_edge_counts(
    spark: SparkSession,
    sf_dir: str,
    k: int = KTRUSS_K,
    rounds: int = KTRUSS_ROUNDS,
    min_weight: int = DEFAULT_MIN_WEIGHT,
) -> DataFrame:
    """Registry entry: ``(round, n_edges)`` — k-truss peeling (k=4) of
    the co-occurrence graph: each round drops every edge in fewer than
    k−2 triangles, then recounts on the SURVIVING subgraph (removals
    cascade — the defining fixpoint of trussness). A fixed ``rounds``
    budget keeps both engines on the identical prefix of the peel, the
    same discipline as the fixed-round LPA/BFS oracles. Ordered by round.

    Scale notes: per round one wedge-close support computation over a
    monotonically SHRINKING edge set (the first peel typically removes
    the long support-0/1 tail, so later rounds are much cheaper);
    lineage truncates per round.
    """
    lineitem = read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    edges = cooccurrence_edges(lineitem, min_weight).select("pa", "pb").transform(
        truncate_lineage
    )
    out = None
    for r in range(1, rounds + 1):
        edges = (
            _edge_support(edges)
            .filter(F.col("support") >= k - 2)
            .select("pa", "pb")
            .transform(truncate_lineage)
        )
        row = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges")).select(
            F.lit(r).cast("int").alias("round"), "n_edges"
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("round")


CC_SCALE = 1000  # clustering coefficient in per-mille fixed point
CC_BUCKET = 100  # histogram bucket width (deciles of the coefficient)


def clustering_coefficient_histogram(
    spark: SparkSession, sf_dir: str, min_weight: int = DEFAULT_MIN_WEIGHT
) -> DataFrame:
    """Registry entry: ``(cc_bucket, n_nodes, sum_triangles, min_cc_pm,
    max_cc_pm)`` — distribution of the LOCAL clustering coefficient
    cc(v) = 2·T(v) / (deg(v)·(deg(v)−1)) over the support-thresholded
    co-occurrence graph, in per-mille fixed point (floor), bucketed into
    deciles (bucket = cc_pm div 100; cc_pm = 1000 lands in bucket 10;
    degree-<2 nodes, where cc is undefined, land in bucket −1 with
    cc_pm = −1). The node-level refinement of ``triangle_stats``'s
    single global count — the standard small-world / community-structure
    diagnostic. Ordered by cc_bucket.

    Determinism: T(v) and deg(v) are exact integers; cc_pm is one floor
    division — no floats anywhere.

    Shape: one materialized edge relation feeds the wedge-close triangle
    join (the ``triangle_stats`` hot spot, same ``min_weight``/AQE skew
    levers), corner counts come from a 3× projection union + hash agg,
    degrees from a 2× union + hash agg, and the histogram is
    |buckets|-bounded (≤ 12 rows). All shuffles key on the vertex id.
    """
    lineitem = read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    edges = cooccurrence_edges(lineitem, min_weight).transform(truncate_lineage)
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tris = (
        e1.join(e2, F.col("e1.pb") == F.col("e2.pa"))
        .join(
            e3,
            (F.col("e3.pa") == F.col("e1.pa")) & (F.col("e3.pb") == F.col("e2.pb")),
        )
        .select(
            F.col("e1.pa").alias("a"),
            F.col("e1.pb").alias("b"),
            F.col("e2.pb").alias("c"),
        )
    )
    corners = (
        tris.select(F.col("a").alias("p"))
        .unionAll(tris.select(F.col("b").alias("p")))
        .unionAll(tris.select(F.col("c").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
    )
    degrees = (
        edges.select(F.col("pa").alias("p"))
        .unionAll(edges.select(F.col("pb").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    cc_pm = F.when(
        F.col("deg") >= 2,
        F.expr(f"(2 * {CC_SCALE} * t) div (deg * (deg - 1))"),
    ).otherwise(F.lit(-1)).cast("long")
    per_node = (
        degrees.join(corners, "p", "left")
        .select(
            "deg",
            F.coalesce("t", F.lit(0)).cast("long").alias("t"),
        )
        .select("t", cc_pm.alias("cc_pm"))
    )
    bucket = F.when(
        F.col("cc_pm") < 0, F.lit(-1)
    ).otherwise(F.expr(f"cc_pm div {CC_BUCKET}")).cast("long")
    return (
        per_node.groupBy(bucket.alias("cc_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("t").cast("long").alias("sum_triangles"),
            F.min("cc_pm").cast("long").alias("min_cc_pm"),
            F.max("cc_pm").cast("long").alias("max_cc_pm"),
        )
        .orderBy("cc_bucket")
    )
