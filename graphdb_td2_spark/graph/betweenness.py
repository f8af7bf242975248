"""Sampled Brandes betweenness centrality [extension] over the
co-purchase graph — the "broker" centrality (how often does a product
sit ON the shortest chains between other products?), completing the
centrality family next to degree / harmonic (closeness) / PageRank /
HITS.

Reference parity: no reference counterpart; the graph itself is the
reference's co-purchase relation (``app/main.py:51-60``). Sampling
follows Brandes–Pich: run the exact per-source dependency accumulation
from a fixed seed sample instead of every vertex.

Determinism (the repo's integer fixed-point discipline): true Brandes
accumulates delta(v) = Σ_w σ(v)/σ(w) · (1 + delta(w)) over successors w
on shortest paths — float ratios whose summation order Spark does not
fix. We instead define the estimator IN fixed point: delta_fp carries
``DELTA_SCALE`` units per unit of dependency and every edge
contribution is the floor division

    (σ(v) · (DELTA_SCALE + delta_fp(w))) div σ(w)

of exact BIGINTs. Integer addition is order-independent, floor division
is engine-exact, so the result is bit-reproducible across Spark and the
DuckDB oracle — at the cost of ≤1/DELTA_SCALE dependency per edge hop
of downward bias, irrelevant for a top-k ranking. Shortest paths are
CAPPED at ``ROUNDS`` hops (same bound as the harmonic-centrality BFS;
the co-purchase graph's effective diameter at every tested SF is ≤ 3,
see ``graph_neighborhood_function``), which also bounds the recursion
unrolled in the oracle.

Overflow safety: σ and delta_fp SATURATE at ``SIGMA_CAP`` (2^20) and
``DELTA_CAP`` (2^36) via LEAST in both engines — identical saturation
is part of the estimator's definition, so cross-engine exactness holds
even where a cap bites. Measured maxima at sf0.01/sf0.1 are σ ≤ 971
and delta_fp ≤ ~1e7 — the caps are FAR from active at any tested
scale; they exist so a 100 TB hub graph wraps nowhere: each product is
≤ SIGMA_CAP·(DELTA_SCALE + DELTA_CAP) < 2^57, each per-edge term is
re-capped at DELTA_CAP before the per-node sum, so the sum stays under
deg·2^36 (< 2^63 for any degree < 2^26).

Scale notes: the forward pass is the harmonic-BFS plan with one extra
integer column (σ aggregated by map-side-combinable SUM instead of
DISTINCT); the backward pass is one equi-join per level between the
cached level frames and the adjacency — (seeds × frontier)-sized state,
never corpus-sized, all keyed shuffles on (seed, node). Levels are
persisted and reused by the backward pass, then unpersisted.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession, functions as F

from .centrality import N_SEEDS, ROUNDS, TOP_K
from .checkpointing import truncate_lineage
from .walks import copurchase_adjacency

DELTA_SCALE = 1000  # fixed-point dependency units (milli-dependencies)
SIGMA_CAP = 1 << 20  # saturating path-count bound (inactive at tested SFs)
DELTA_CAP = 1 << 36  # saturating dependency bound (inactive at tested SFs)


def _per_seed_dependencies(
    adj: DataFrame,
    n_seeds: int,
    rounds: int,
    broadcast_state: bool = True,
) -> tuple[DataFrame, list[DataFrame]]:
    """Shared Brandes core: the lazy ``(seed, node, delta_fp)`` relation
    over the ``n_seeds`` lowest-id seeds, plus the list of persisted
    level/delta frames the caller must unpersist after materializing
    (the hits_fp discipline). Per-seed dependencies are ADDITIVE, so one
    pass serves every seed-subset estimator built on a prefix of the
    lowest-id seed order (see ``betweenness_approx_error_report``).

    ``broadcast_state`` (default): every per-round frame (frontier,
    visited set, per-level delta) is ≤ ``n_seeds``·|V| rows, while the
    adjacency is |E| ≥ degree·|V| rows — so the rounds broadcast the
    SMALL state side and leave the cached adjacency in place. Without
    the hint each of the 2·rounds-1 joins re-exchanged the adjacency
    (Spark cannot know an intermediate aggregate is small at plan time,
    and the r12 A/B measured the hint at ~2.3x on the sf0.1 entry).
    For a graph where ``n_seeds``·|V| itself exceeds broadcast capacity
    (billion-vertex at high seed counts) pass False to keep every join
    on the co-partitioned shuffle path — the estimator is identical
    either way (integer math, order-independent)."""
    bc = F.broadcast if broadcast_state else (lambda df: df)
    seeds = (
        adj.select("src").distinct().orderBy("src").limit(n_seeds)
        .select(F.col("src").alias("seed"), F.col("src").alias("node"))
    )

    # forward: BFS levels with shortest-path counts sigma
    levels = [seeds.withColumn("sigma", F.lit(1).cast("long")).persist()]
    visited = levels[0].select("seed", "node").persist()
    for _ in range(1, rounds + 1):
        frontier = levels[-1]
        nxt = (
            bc(frontier)
            .join(adj, frontier["node"] == adj["src"])
            .select("seed", F.col("dst").alias("node"), "sigma")
            .groupBy("seed", "node")
            .agg(
                F.least(F.sum("sigma"), F.lit(SIGMA_CAP))
                .cast("long")
                .alias("sigma")
            )
            .join(bc(visited), ["seed", "node"], "left_anti")
            .persist()
        )
        levels.append(nxt)
        visited = visited.unionByName(nxt.select("seed", "node")).persist()

    # backward: dependency accumulation from the deepest level inward
    deltas: dict[int, DataFrame] = {
        rounds: levels[rounds].withColumn(
            "delta_fp", F.lit(0).cast("long")
        )
    }
    for r in range(rounds - 1, 0, -1):
        child = deltas[r + 1]
        contrib = (
            bc(child)
            .join(adj, child["node"] == adj["dst"])
            .select(
                "seed",
                F.col("src").alias("node"),
                F.col("sigma").alias("sigma_w"),
                "delta_fp",
            )
            .join(
                bc(
                    levels[r].select(
                        "seed", "node", F.col("sigma").alias("sigma_v")
                    )
                ),
                ["seed", "node"],
            )
            .select(
                "seed",
                "node",
                F.expr(
                    f"least((sigma_v * ({DELTA_SCALE} + delta_fp))"
                    f" div sigma_w, {DELTA_CAP})"
                ).alias("c"),
            )
            .groupBy("seed", "node")
            .agg(
                F.least(F.sum("c"), F.lit(DELTA_CAP))
                .cast("long")
                .alias("dsum")
            )
        )
        deltas[r] = (
            levels[r]
            .join(bc(contrib), ["seed", "node"], "left")
            .select(
                "seed",
                "node",
                "sigma",
                F.coalesce("dsum", F.lit(0)).cast("long").alias("delta_fp"),
            )
            .persist()
        )

    acc = functools.reduce(
        DataFrame.unionByName,
        [deltas[r].select("seed", "node", "delta_fp") for r in range(1, rounds + 1)],
    )
    return acc, levels + list(deltas.values())


def betweenness_fixed_point(
    adj: DataFrame,
    n_seeds: int = N_SEEDS,
    rounds: int = ROUNDS,
    k: int = TOP_K,
) -> DataFrame:
    """Core estimator over a symmetric ``(src, dst)`` adjacency: the
    ``k`` highest fixed-point Brandes dependency totals over the
    ``n_seeds`` lowest-id seeds (ties → lowest node id). Materializes
    the k-row result eagerly so every per-level cache can be released
    before returning (the hits_fp unpersist discipline)."""
    adj = adj.persist()
    acc, pinned = _per_seed_dependencies(adj, n_seeds, rounds)
    out = (
        acc.groupBy("node")
        .agg(
            F.sum("delta_fp").cast("long").alias("betweenness_fp"),
            F.count(F.lit(1)).cast("long").alias("n_seeds_reaching"),
        )
        .orderBy(F.desc("betweenness_fp"), F.asc("node"))
        .limit(k)
        .select("node", "betweenness_fp", "n_seeds_reaching")
    )
    rows = out.collect()
    for df in pinned:
        df.unpersist()
    adj.unpersist()
    return adj.sparkSession.createDataFrame(rows, out.schema)


def betweenness_sample_top20(
    spark: SparkSession,
    sf_dir: str,
    n_seeds: int = N_SEEDS,
    rounds: int = ROUNDS,
    k: int = TOP_K,
) -> DataFrame:
    """Registry entry: ``(node, betweenness_fp, n_seeds_reaching)`` —
    sampled fixed-point Brandes betweenness of the co-purchase graph.
    ``betweenness_fp`` is in ``DELTA_SCALE`` units of dependency;
    ``n_seeds_reaching`` counts seeds whose ≤``rounds``-hop shortest
    paths reach the node (the estimator's per-node support)."""
    return betweenness_fixed_point(
        copurchase_adjacency(spark, sf_dir), n_seeds, rounds, k
    )


REF_SEEDS = 16  # reference estimator seed count (2× the shipped sample)


def betweenness_approx_error_report(
    spark: SparkSession,
    sf_dir: str,
    ref_seeds: int = REF_SEEDS,
    rounds: int = ROUNDS,
    k: int = TOP_K,
) -> DataFrame:
    """Registry entry: ``(rank, node, ref_per_seed_milli,
    est8_per_seed_milli, err8_per_seed_milli, est4_per_seed_milli,
    err4_per_seed_milli, in_est8_topk)`` — quality certificate for the
    sampled estimator (the ``harmonic_approx_error_report`` /
    ``ann_recall_report`` pattern): for the ``REF_SEEDS``-seed reference
    estimator's top-``k`` nodes, the per-seed-normalized dependency under
    the reference and under the 8- and 4-seed prefixes of the same
    lowest-id seed order, with absolute errors, plus whether the node
    would make the 8-seed estimator's own top-``k``.

    Seed-count/error trade-off (the documented knob): per-seed
    dependencies are additive, so one ``REF_SEEDS``-seed Brandes pass
    yields every prefix estimator for free — the 4→8→16 error columns
    ARE the convergence curve, and the wall cost is ~``ref_seeds/8``×
    the shipped query, not three separate runs. ``*_milli`` values are
    exact integers: ``(Σ delta_fp · 1000) div n_seeds``.

    The ``est8``/``est4`` columns are the HALF and QUARTER prefixes of
    the seed order — sized ``ref_seeds//2`` / ``ref_seeds//4``, so a
    non-default ``ref_seeds`` keeps prefix size and divisor consistent
    (ADVICE r10: the hardcoded 8/4 divided a partial prefix sum by 8
    when ``ref_seeds < 8``); the column NAMES stay fixed for schema
    stability and read as the 16-seed default's 8/4.
    """
    if ref_seeds < 4:
        raise ValueError(
            f"ref_seeds must be >= 4 (got {ref_seeds}): the report's"
            " half/quarter prefix estimators need at least one seed each"
        )
    n_half, n_quarter = ref_seeds // 2, ref_seeds // 4
    adj = copurchase_adjacency(spark, sf_dir).persist()
    acc, pinned = _per_seed_dependencies(adj, ref_seeds, rounds)
    seed_ids = [
        r["src"]
        for r in adj.select("src").distinct().orderBy("src")
        .limit(ref_seeds).collect()
    ]
    s8, s4 = set(seed_ids[:n_half]), set(seed_ids[:n_quarter])
    totals = acc.groupBy("node").agg(
        F.sum("delta_fp").cast("long").alias("ref_fp"),
        F.sum(F.when(F.col("seed").isin(*s8), F.col("delta_fp")).otherwise(0))
        .cast("long")
        .alias("fp8"),
        F.sum(F.when(F.col("seed").isin(*s4), F.col("delta_fp")).otherwise(0))
        .cast("long")
        .alias("fp4"),
    ).transform(truncate_lineage)
    # the eager checkpoint cut totals loose from the 4-level×16-delta
    # plan tree, so every per-level cache releases BEFORE the two top-k
    # scans (the r10 sweep OOM'd building the un-truncated plan string
    # for the second aggregation in a long session)
    for df in pinned:
        df.unpersist()
    adj.unpersist()
    top_ref = (
        totals.orderBy(F.desc("ref_fp"), F.asc("node")).limit(k).collect()
    )
    top8 = {
        r["node"]
        for r in totals.orderBy(F.desc("fp8"), F.asc("node")).limit(k).collect()
    }

    def milli(fp: int, n: int) -> int:
        return (fp * 1000) // n

    rows = []
    for rank, r in enumerate(top_ref, start=1):
        ref_m = milli(r["ref_fp"], ref_seeds)
        e8, e4 = milli(r["fp8"], n_half), milli(r["fp4"], n_quarter)
        rows.append(
            (rank, r["node"], ref_m, e8, abs(ref_m - e8), e4,
             abs(ref_m - e4), r["node"] in top8)
        )
    return spark.createDataFrame(
        rows,
        "rank long, node long, ref_per_seed_milli long,"
        " est8_per_seed_milli long, err8_per_seed_milli long,"
        " est4_per_seed_milli long, err4_per_seed_milli long,"
        " in_est8_topk boolean",
    )
