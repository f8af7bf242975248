"""HITS (hubs & authorities) — Kleinberg '99 — over the property graph
[extension].

The reference's graph tier stops at pattern traversal plus its declared
PageRank TODO (``/root/reference/app/main.py:31-33``); HITS is the natural
companion ranking for a bipartite-ish commerce graph: orders/customers that
*point at* many well-endorsed products are hubs, products *pointed at* by
many strong hubs are authorities. Like PageRank (``graph/pagerank.py``),
the loop is the genuinely iterative piece Catalyst cannot express
(SURVEY.md §4 custom-work item 1), so it follows the same DataFrame
power-iteration discipline: persist the edge relation once, broadcast the
dimension-sized score vector into the message join, truncate lineage every
iteration, and spend exactly ONE driver action per half-step — the 1-row
normalization total, whose collect doubles as the materialization of the
previous half-step's lazily-checkpointed score vector (the pagerank
dangling-mass fold).

Exactness (the whole point of the fixed-point formulation): scores are
scaled BIGINTs. A plain L1/L2 normalization divides by a data-dependent
total — in floats that is engine-divergent; here each half-step computes

    raw_auth(v) = SUM over in-edges of hub(u)          (exact BIGINT)
    norm        = GREATEST(total_raw div FP_SCALE, 1)   (one 1-row agg)
    auth(v)     = raw_auth(v) div norm                  (exact BIGINT)

which keeps every intermediate an integer — summation order cannot perturb
anything, so the unrolled-CTE DuckDB oracle in ``__spark_entry__.py``
(``_hits_fp_sql``) reproduces the scores bit-for-bit and the iterative
tier gets a full value-hash check, not a rows-only one. The div-based
rescale keeps the vector's L1 mass at ~FP_SCALE so products never leave
int64: raw ≤ in_degree·FP_SCALE ≤ |E|·FP_SCALE, and nothing is ever
multiplied back up.

Scale notes (100 TB posture): per half-step ONE shuffle (groupBy on the
receiving endpoint) over the persisted edge relation; the score vector is
vertex-dimension-sized and broadcasts below ``_BROADCAST_RANKS_MAX``
(above it the join co-partitions edges and scores — same switch as
PageRank). The normalization total is a 1-row aggregate. Lineage is
truncated every iteration via the session checkpoint mode
(``graph/checkpointing.py``) so the logical plan stays O(1) across
iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .checkpointing import state_partitions, truncate_lineage
from .pagerank import FP_SCALE, _BROADCAST_RANKS_MAX

HITS_ITER = 4


def hits_fp(edges: DataFrame, num_iter: int = HITS_ITER) -> DataFrame:
    """Integer fixed-point HITS over ``edges(src, dst)``.

    Returns ``(id, auth_fp, hub_fp)`` for every vertex appearing as an
    endpoint. ``num_iter`` full (auth then hub) rounds from an all-ones
    hub vector scaled to FP_SCALE.
    """
    assert num_iter >= 1, "HITS needs at least one full round"
    edges = edges.select("src", "dst")
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    n_vertices = verts.count()
    small = n_vertices <= _BROADCAST_RANKS_MAX
    if small:
        # Shared partition budget (graph/checkpointing.py
        # state_partitions): sized off the state dimension, wide enough
        # that the per-half-step edge join parallelizes (r12: 1-wide
        # half-steps were 1.8-2.0 s vs 0.8-1.2 s at ~8-wide on sf0.1),
        # narrow enough that sf0.01-sized graphs stay at 1 partition.
        parts = state_partitions(n_vertices, edges)
        edges = edges.repartition(parts, F.col("src"))
        verts = verts.repartition(parts)
    edges = edges.persist()
    verts = verts.persist()
    verts.count()  # materialize the verts persist (edges fills on first half-step)

    # ONE driver action per half-step (the pagerank dangling-mass fold):
    # the normalization total's collect doubles as the materialization of
    # the PREVIOUS half-step's lazily-checkpointed score vector, so the
    # per-half-step action count is 1, not 2. The message aggregate is
    # persisted across its two uses (1-row total, then the state join);
    # since the new vector is now checkpointed LAZILY, the persist is
    # released one half-step LATE (after the next total has materialized
    # the vector that references it) — live state stays bounded at
    # edges + vertices + one score vector + two |V|-row aggregates.
    prev_raw: list[DataFrame] = []

    def _half_step(scores: DataFrame, score_col: str, join_on: str,
                   group_on: str, out_col: str) -> DataFrame:
        """One endorsement pass: ship ``score_col`` along edges joined on
        ``join_on``, aggregate by ``group_on``, renormalize to ~FP_SCALE
        mass with an exact integer div."""
        side = scores.select(F.col("id").alias(join_on), score_col)
        if small:
            side = F.broadcast(side)
        raw = (
            edges.join(side, join_on)
            .groupBy(F.col(group_on).alias("id"))
            .agg(F.sum(score_col).alias("raw"))
            .persist()
        )
        total = int(raw.agg(F.coalesce(F.sum("raw"), F.lit(0))).first()[0])
        if prev_raw:
            prev_raw.pop().unpersist()
        norm = max(total // FP_SCALE, 1)
        # the persisted |V|-bounded aggregate broadcasts into the merge so
        # the vertex frame is never re-exchanged (same bar as `side`)
        out = verts.join(F.broadcast(raw) if small else raw, "id", "left").select(
            "id",
            F.expr(f"coalesce(raw, cast(0 as bigint)) div {norm}").alias(out_col),
        )
        prev_raw.append(raw)
        return out.transform(truncate_lineage, eager=False)

    hubs = verts.select("id", F.lit(FP_SCALE).cast("long").alias("hub"))
    auths = None
    for _ in range(num_iter):
        auths = _half_step(hubs, "hub", "src", "dst", "auth")
        hubs = _half_step(auths, "auth", "dst", "src", "hub")
    out = auths.join(hubs, "id").select(
        "id", F.col("auth").alias("auth_fp"), F.col("hub").alias("hub_fp")
    )
    # Materialize the final vector (truncate_lineage is eager), then release
    # the iteration-scoped caches — a long session invoking HITS repeatedly
    # must not accumulate pinned edge/vertex blocks in executor storage.
    out = out.transform(truncate_lineage, eager=True)
    prev_raw.pop().unpersist()
    edges.unpersist()
    verts.unpersist()
    return out


def hits_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: top 20 authorities of the full property graph with
    their hub scores — ``(id, auth_fp, hub_fp, auth)``, ordered by
    authority (deterministic id tiebreak, compiles to
    TakeOrderedAndProject)."""
    from .queries import cached_graph

    g = cached_graph(spark, sf_dir)
    r = hits_fp(g.edges.select("src", "dst"), num_iter=HITS_ITER)
    return (
        r.select(
            "id",
            "auth_fp",
            "hub_fp",
            (F.col("auth_fp").cast("double") / F.lit(float(FP_SCALE))).alias("auth"),
        )
        .orderBy(F.desc("auth_fp"), F.asc("id"))
        .limit(20)
    )
