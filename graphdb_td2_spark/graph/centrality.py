"""Centrality-family analytics over the co-purchase graph: the degree
distribution (the first diagnostic of any large graph — skew, power-law
tail, hub detection) and multi-seed harmonic centrality (the
closeness-family measure that is well-defined on disconnected graphs,
estimated Brandes-style from a fixed seed sample).

Exactness: harmonic centrality sums 1/d over reached seeds — a float
sum whose order Spark does not fix. With bounded rounds ``R`` the
denominators are 1..R, so scoring in units of ``lcm(1..R)`` makes every
contribution an exact integer (d=1 → 12, d=2 → 6, d=3 → 4, d=4 → 3 for
R=4) and the aggregate order-independent — the same fixed-point trick
as the integer PageRank oracle.

Scale notes: degree distribution is two hash aggregates (per-vertex
degree, then per-bucket count — output is log₂-bucket-bounded).
Harmonic centrality is seed-sampled BFS: per round one frontier×adj
equi-join plus a left-anti against the visited set, all keyed shuffles
on vertex ids; state is (seeds × reached) rows, bounded by seed count ×
graph size, independent of the fact tables that built the adjacency.
Round count is fixed (lineage stays shallow; localCheckpoint unneeded
at R=4).
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession, functions as F

from .walks import cached_copurchase_adjacency

N_SEEDS = 8
ROUNDS = 4
HARMONIC_LCM = 12  # lcm(1..4): 1/d in twelfths is exact for every d ≤ 4
TOP_K = 20


def degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(degree_bucket, n_vertices, min_degree,
    max_degree)`` — out-degree histogram of the co-purchase graph in
    power-of-two buckets (floor(log2(degree))), ordered by bucket."""
    adj = cached_copurchase_adjacency(spark, sf_dir)
    degrees = adj.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("degree"))
    # floor(log2(d)) via binary-string length — exact integer arithmetic
    # (a float log2 is engine-implementation-dependent near powers of two)
    bucket = (
        F.length(F.conv(F.col("degree").cast("string"), 10, 2)) - 1
    ).cast("long")
    return (
        degrees.groupBy(bucket.alias("degree_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vertices"),
            F.min("degree").alias("min_degree"),
            F.max("degree").alias("max_degree"),
        )
        .orderBy("degree_bucket")
    )


def harmonic_centrality_top20(
    spark: SparkSession,
    sf_dir: str,
    n_seeds: int = N_SEEDS,
    rounds: int = ROUNDS,
    k: int = TOP_K,
) -> DataFrame:
    """Registry entry: ``(node, harmonic_fp, n_reached)`` — the ``k``
    nodes most central to the ``n_seeds`` lowest-id seed products, where
    ``harmonic_fp = Σ_seeds lcm(1..R)/d(seed, node)`` (exact integer;
    unreached seeds contribute 0, matching harmonic centrality's
    disconnected-graph convention). Ties → lowest node id."""
    assert rounds == 4, "HARMONIC_LCM is lcm(1..4); adjust both together"
    adj = cached_copurchase_adjacency(spark, sf_dir)
    seeds = (
        adj.select("src").distinct().orderBy("src").limit(n_seeds)
        .select(F.col("src").alias("seed"), F.col("src").alias("node"))
    )
    visited = seeds.withColumn("dist", F.lit(0).cast("long")).persist()
    frontier = visited
    layers = [visited]
    pinned = [visited]
    for r in range(1, rounds + 1):
        nxt = (
            frontier.join(adj, frontier["node"] == adj["src"])
            .select("seed", F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("seed", "node"), ["seed", "node"], "left_anti")
            .withColumn("dist", F.lit(r).cast("long"))
            .persist()
        )
        layers.append(nxt)
        pinned.append(nxt)
        visited = functools.reduce(DataFrame.unionByName, layers).persist()
        pinned.append(visited)
        frontier = nxt
    reached = visited.filter(F.col("dist") > 0)
    scored = reached.groupBy("node").agg(
        F.sum(
            (F.lit(HARMONIC_LCM) / F.col("dist")).cast("long")
        ).cast("long").alias("harmonic_fp"),
        F.count(F.lit(1)).cast("long").alias("n_reached"),
    )
    out = (
        scored.orderBy(F.desc("harmonic_fp"), F.asc("node"))
        .limit(k)
        .select("node", "harmonic_fp", "n_reached")
    )
    # materialize the k-row result eagerly, then release every per-call
    # cache (the betweenness_fixed_point discipline) — each call used to
    # leave the layer AND per-round union frames pinned for the session
    rows = out.collect()
    for frame in pinned:
        frame.unpersist()
    return spark.createDataFrame(rows, out.schema)


def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(n_edges, mean_src_degree, assortativity)`` —
    Pearson degree-degree correlation across the directed co-purchase
    edges (Newman's assortativity): do high-degree products co-purchase
    with high-degree products? One row.

    Determinism: the same closed-form-on-integer-sufficient-statistics
    discipline as the OLS trend operator — n, Σx, Σy, Σxy, Σx², Σy²
    over (src_degree, dst_degree) edge pairs are exact BIGINTs, and
    r = (nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²)) is a fixed
    four-op IEEE expression. The symmetric edge list makes Σx = Σy, but
    both are computed independently as a structural self-check.

    Scale notes: degrees are one hash agg; attaching them to edges is
    two joins on src/dst (the adjacency's own keys — co-partitioned on
    a bucketed lake); the moment rollup is a 1-row partial agg.
    """
    adj = cached_copurchase_adjacency(spark, sf_dir)
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d"))
    x = deg.select(F.col("src"), F.col("d").alias("dx"))
    y = deg.select(F.col("src").alias("dst"), F.col("d").alias("dy"))
    edges = adj.join(x, "src").join(y, "dst")
    stats = edges.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dx").cast("long").alias("sx"),
        F.sum("dy").cast("long").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).cast("long").alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).cast("long").alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("long").alias("syy"),
    )
    # Each moment is an exact (non-overflowing) int64; their COMBINATION
    # (n·Σxy etc.) can exceed int64 on large corpora, so it runs in IEEE
    # double — the same fixed expression tree in both engines, hence
    # still bit-deterministic.
    n_d, sx_d, sy_d = (F.col(c).cast("double") for c in ("n", "sx", "sy"))
    sxy_d, sxx_d, syy_d = (F.col(c).cast("double") for c in ("sxy", "sxx", "syy"))
    r = (n_d * sxy_d - sx_d * sy_d) / (
        F.sqrt(n_d * sxx_d - sx_d * sx_d) * F.sqrt(n_d * syy_d - sy_d * sy_d)
    )
    return stats.select(
        F.col("n").alias("n_edges"),
        (F.col("sx").cast("double") / F.col("n").cast("double")).alias(
            "mean_src_degree"
        ),
        r.alias("assortativity"),
    )


RICH_CLUB_KS = (8, 16, 32)


def rich_club_coefficients(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(k, n_nodes, n_edges_within, phi)`` — rich-club
    coefficients of the co-purchase graph: among nodes with degree > k,
    the realized fraction of possible undirected edges
    ``phi = 2·E_club / (n·(n−1))`` — do the hubs preferentially trade
    with each other? One row per k in {8, 16, 32}, ordered by k.

    Determinism: exact integer degrees/edge counts, one division per k.
    Scale: degrees once, then per k a semi-join-shaped membership filter
    on BOTH edge endpoints (broadcast club id set) and a 1-row count —
    no pair materialization beyond the existing adjacency.
    """
    adj = cached_copurchase_adjacency(spark, sf_dir)
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d"))
    out = None
    for k in RICH_CLUB_KS:
        club = deg.filter(F.col("d") > k).select("src")
        n_nodes = club.count()
        within = (
            adj.join(club, "src")
            .join(club.select(F.col("src").alias("dst")), "dst")
            .count()
            // 2  # symmetric adjacency counts each undirected edge twice
        )
        denom = n_nodes * (n_nodes - 1) // 2
        row = spark.createDataFrame(
            [
                (
                    k,
                    n_nodes,
                    within,
                    (float(within) / float(denom)) if denom else None,
                )
            ],
            "k int, n_nodes long, n_edges_within long, phi double",
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("k")
