"""HyperBall-style approximate harmonic centrality [extension] — the
scale path for the centrality family. Exact harmonic centrality is
all-pairs-distance shaped (the seed-sampled exact entry in
``centrality.py`` is 571 s at sf10 for 8 seeds); HyperBall (Boldi &
Vigna, "In-Core Computation of Geometric Centralities with HyperBall",
2013 — public paper) replaces each vertex's reachability ball with a
fixed-width cardinality sketch and gets EVERY vertex's centrality in R
edge-linear rounds.

Determinism (the oracle-exactness discipline of the integer PageRank /
HITS family): the sketch is a plain HyperLogLog with

- md5-derived register index (first hex char → 16 registers) and a
  32-bit hash suffix (hex chars 2–9) — both engines share the md5 of
  the decimal vertex id, the idiom every minhash/bucket oracle here
  already relies on;
- rho = leading-zero-count + 1 of the 32-bit suffix via an unrolled
  integer CASE over powers of two (NOT float log2 — engine-portable and
  branch-exact; x = 0 → RHO_MAX);
- register union = MAX (associative/commutative/idempotent → map-side
  partial agg, retry/speculation-safe, shuffle-order-independent);
- the raw HLL estimate alpha·m²/Σ2^(−M_j) evaluated in pure int64
  fixed-point (milli-vertices): all terms scaled by 2^RHO_W so the
  register sum S is an exact integer, then ONE truncating integer
  division — no floats anywhere, so DuckDB replays the identical
  numbers (no small-range/large-range corrections: raw estimator only,
  which both engines share verbatim).

Registers only grow, so Σ2^(−M) only shrinks and the ball estimate is
MONOTONE non-decreasing in t — the per-round harmonic increments
(est_t − est_{t−1})·(LCM/t) are non-negative exact integers.

Scale notes: state is ≤ m rows (node, j, M) per vertex; each round is
one equi-join of the cached symmetric adjacency against the state plus
a (node, j) MAX aggregate whose map-side combine caps shuffle volume at
m·|V| per reducer regardless of |E|. R rounds, vertex-sized lineage
truncation per round. At 100 TB this is the textbook ANF plan: edge
relation scanned R times, no per-seed frontier state, no visited
anti-joins, output |V| rows.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, functions as F

from .centrality import HARMONIC_LCM, N_SEEDS, ROUNDS, TOP_K
from .checkpointing import truncate_lineage
from .walks import copurchase_adjacency

M_REG = 16          # HLL registers (first md5 hex char)
RHO_W = 33          # suffix width 32 bits → rho ∈ [1, 33]
ALPHA_NUM = 673     # alpha_16 = 0.673 as the exact rational 673/1000
ALPHA_DEN = 1000
EST_SCALE = 1000    # estimates in milli-vertices
# alpha·m²·scale·2^RHO_W — the fixed numerator of every estimate;
# 673·256·1000·2^33 ≈ 1.48e18 keeps the whole computation inside int64.
EST_NUM = ALPHA_NUM * M_REG * M_REG * EST_SCALE * (2 ** RHO_W)


def rho_case_sql(x: str) -> str:
    """Portable SQL for rho(x) = leading-zero-count + 1 of the 32-bit
    value ``x`` — an unrolled CASE both engines evaluate identically."""
    whens = " ".join(
        f"WHEN {x} >= {1 << (32 - r)} THEN {r}" for r in range(1, 33)
    )
    return f"(CASE {whens} ELSE {RHO_W} END)"


def _self_sketch(nodes: DataFrame) -> DataFrame:
    """Round-0 state: every vertex's sketch holds exactly its own hash —
    ``(node, j, M)``."""
    hx = F.md5(F.col("node").cast("string"))
    suffix = F.conv(F.substring(hx, 2, 8), 16, 10).cast("long")
    return nodes.select(
        "node",
        F.conv(F.substring(hx, 1, 1), 16, 10).cast("long").alias("j"),
        _rho_col(suffix).alias("M"),
    )


def _rho_col(x):
    """rho as a Column: the same unrolled comparison chain as
    ``rho_case_sql`` (kept in lock-step — tests pin a few values)."""
    expr = F.lit(RHO_W).cast("long")
    for r in range(32, 0, -1):
        expr = F.when(x >= F.lit(1 << (32 - r)), F.lit(r).cast("long")).otherwise(
            expr
        )
    return expr


def _estimates(state: DataFrame) -> DataFrame:
    """Per-node raw-HLL ball estimate in milli-vertices from the exploded
    register state: ``(node, est)`` with
    S = Σ_present 2^(RHO_W − M) + (m − cnt)·2^RHO_W and
    est = EST_NUM div (ALPHA_DEN·S)."""
    s = state.groupBy("node").agg(
        F.sum(
            F.expr(f"shiftleft(cast(1 as bigint), cast({RHO_W} - M as int))")
        ).alias("s_present"),
        F.count(F.lit(1)).alias("cnt"),
    )
    s_total = F.col("s_present") + (F.lit(M_REG) - F.col("cnt")) * F.lit(
        1 << RHO_W
    ).cast("long")
    return s.select("node", s_total.alias("_s")).select(
        "node",
        F.expr(
            f"cast({EST_NUM} as bigint) div (cast({ALPHA_DEN} as bigint) * _s)"
        )
        .cast("long")
        .alias("est"),
    )


def hyperball_harmonic(
    adj: DataFrame, rounds: int = ROUNDS
) -> tuple[DataFrame, DataFrame]:
    """Run ``rounds`` HyperBall iterations over the (symmetric) adjacency.

    Returns ``(harmonic, final_est)``: ``harmonic`` is
    ``(node, harmonic_est_fp)`` with
    harmonic_est_fp = Σ_t (est_t − est_{t−1})·(HARMONIC_LCM div t),
    ``final_est`` is ``(node, est)`` — the round-R ball estimate in
    milli-vertices."""
    assert rounds <= 4, "HARMONIC_LCM is lcm(1..4); adjust both together"
    nodes = adj.select(F.col("src").alias("node")).distinct()
    state = _self_sketch(nodes).transform(truncate_lineage)
    acc = _estimates(state).select(
        "node", F.col("est").alias("prev"), F.lit(0).cast("long").alias("h")
    )
    est = None
    for t in range(1, rounds + 1):
        msgs = adj.join(
            state.withColumnRenamed("node", "dst"), "dst"
        ).select(F.col("src").alias("node"), "j", "M")
        state = (
            msgs.unionByName(state)
            .groupBy("node", "j")
            .agg(F.max("M").alias("M"))
            .transform(truncate_lineage)
        )
        est = _estimates(state)
        w = HARMONIC_LCM // t
        acc = (
            acc.join(est, "node")
            .select(
                "node",
                F.col("est").alias("prev"),
                (
                    F.col("h") + (F.col("est") - F.col("prev")) * F.lit(w)
                ).alias("h"),
            )
            .transform(truncate_lineage)
        )
    harmonic = acc.select("node", F.col("h").alias("harmonic_est_fp"))
    return harmonic, est


def harmonic_centrality_approx_top20(
    spark: SparkSession, sf_dir: str, k: int = TOP_K
) -> DataFrame:
    """Registry entry: ``(node, harmonic_est_fp, ball_est_milli)`` — the
    ``k`` highest HyperBall-estimated harmonic centralities over the
    co-purchase graph (ALL sources, not the exact entry's 8-seed
    sample), ties → lowest node id. ``harmonic_est_fp`` is in
    milli-vertices × lcm(1..4) units; ``ball_est_milli`` is the round-4
    ball-size estimate in milli-vertices."""
    adj = copurchase_adjacency(spark, sf_dir).persist(
        StorageLevel.MEMORY_AND_DISK  # serialized — R scans, agg-heavy rounds
    )
    harmonic, est = hyperball_harmonic(adj)
    # hyperball_harmonic materialized its state eagerly (per-round lineage
    # truncation), so the returned frames no longer reference the adjacency
    # and the cache can be released before the final vertex-sized join.
    adj.unpersist()
    return (
        harmonic.join(est, "node")
        .select("node", "harmonic_est_fp", F.col("est").alias("ball_est_milli"))
        .orderBy(F.desc("harmonic_est_fp"), F.asc("node"))
        .limit(k)
    )


def harmonic_approx_error_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(seed, true_ball, est_ball_milli, abs_err_milli,
    rel_err_pm)`` — estimator-quality audit of the HyperBall sketch
    against EXACT 4-hop ball sizes for the exact entry's own 8 seeds
    (the ``ann_recall_report`` pattern: the approximate path and its
    ground truth in one certified row set). rel_err_pm is the exact
    integer per-mille error ``abs_err_milli div true_ball``.

    Scale: the exact side is an 8-seed BFS (frontier×adjacency joins);
    the sketch side reuses the full HyperBall run. Output is 8 rows.
    """
    adj = copurchase_adjacency(spark, sf_dir).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    _, est = hyperball_harmonic(adj)
    seeds = (
        adj.select("src").distinct().orderBy("src").limit(N_SEEDS)
        .select(F.col("src").alias("seed"))
    )
    # exact |B_4(seed)| including the seed itself
    visited = seeds.select("seed", F.col("seed").alias("node")).persist()
    frontier = visited
    for _ in range(ROUNDS):
        nxt = (
            frontier.join(adj, frontier["node"] == adj["src"])
            .select("seed", F.col("dst").alias("node"))
            .distinct()
            .join(visited, ["seed", "node"], "left_anti")
            .persist()
        )
        visited = visited.unionByName(nxt).persist()
        frontier = nxt
    true_ball = visited.groupBy("seed").agg(
        F.count(F.lit(1)).cast("long").alias("true_ball")
    )
    err = F.abs(F.col("est") - F.col("true_ball") * F.lit(EST_SCALE))
    out = (
        true_ball.join(est.withColumnRenamed("node", "seed"), "seed")
        .select(
            "seed",
            "true_ball",
            F.col("est").alias("est_ball_milli"),
            err.alias("abs_err_milli"),
            F.expr(
                f"abs(est - true_ball * {EST_SCALE}) div true_ball"
            ).alias("rel_err_pm"),
        )
        .orderBy("seed")
    )
    rows = out.collect()
    adj.unpersist()
    return spark.createDataFrame(
        rows,
        "seed long, true_ball long, est_ball_milli long,"
        " abs_err_milli long, rel_err_pm long",
    )
