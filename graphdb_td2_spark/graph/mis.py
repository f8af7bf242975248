"""Deterministic Luby-style maximal-independent-set rounds [extension]
over the co-purchase graph — the classic symmetry-breaking primitive of
parallel graph processing (coloring, scheduling, contention-free batch
selection all reduce to it).

Luby's algorithm draws random priorities each round; a DETERMINISTIC
variant fixes one priority per vertex — ``p(v) = md5(v) || zero-padded
v`` (a total order: the md5 breaks neighborhood symmetry, the id suffix
makes even a hash collision unambiguous; plain ASCII string comparison,
bit-identical across engines). Per round, an ACTIVE vertex selects
itself iff its priority precedes every active neighbor's; selected
vertices and their neighbors deactivate. Every round is a local
min-aggregate — no sequential dependency inside a round, which is the
whole point of the algorithm at cluster scale.

Round count is FIXED at ``MIS_ROUNDS`` (the estimator's documented cap,
like the BFS/Brandes hop caps): the output reports ``n_remaining`` per
round, so an unconverged residue is visible rather than silently
absorbed, and the oracle unrolls the identical fixed number of rounds.
Luby's analysis removes a constant fraction of EDGES per round in
expectation; on every tested corpus the active set hits zero within 4.

Scale notes: per round — one semi-join restricting the cached adjacency
to active endpoints, one (src → min neighbor priority) hash agg
(map-side combined, |V| output), one anti-join to deactivate.
State is one |V|-bounded frame, lineage-truncated per round; every
state side (active / selected / removed, all |V|-bounded) broadcasts
into its join so the cached adjacency is never re-exchanged (the
betweenness/sssp discipline — pass ``broadcast_state=False`` above
broadcast capacity for the co-partitioned fallback, identical results).
``selected`` is persisted for its three per-round uses (neighbor
expansion, removal union, count) so the min-priority aggregate runs
once per round, not three times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .checkpointing import resolve_broadcast_state, truncate_lineage
from .walks import cached_copurchase_adjacency

MIS_ROUNDS = 6


def _lake_n_vertices(spark: SparkSession, sf_dir: str) -> int:
    """|V| of the co-purchase graph from the lake stats sidecar — free
    after the first build (the hyperball dispatch source): the
    broadcast-state gate must not cost a count job per call."""
    from ..lake import copurchase_stats

    return copurchase_stats(spark, sf_dir)["n_vertices"]


def _priority(node: F.Column) -> F.Column:
    s = node.cast("string")
    return F.concat(F.md5(s), F.lpad(s, 20, "0"))


def mis_round_sizes(
    spark: SparkSession,
    sf_dir: str,
    rounds: int = MIS_ROUNDS,
    broadcast_state: bool | None = None,
    n_vertices: int | None = None,
) -> DataFrame:
    """Registry entry: ``(round, n_selected, n_removed, n_remaining)`` —
    per Luby round: how many vertices joined the independent set, how
    many vertices deactivated in total (selected + their neighbors),
    and how many stay active. Ordered by round.

    ``broadcast_state``: tri-state (``resolve_broadcast_state``) — the
    default derives the dispatch from the lake stats sidecar's |V|, so
    above ``BROADCAST_STATE_MAX_VERTICES`` the active/selected/removed
    frames stay on the co-partitioned shuffle path instead of
    force-broadcasting vertex-scale state (VERDICT r12 finding #1).
    Identical results either way — every per-round combine is a MIN or a
    set operation over exact keys."""
    if broadcast_state is None and n_vertices is None:
        n_vertices = _lake_n_vertices(spark, sf_dir)
    bc = (
        F.broadcast
        if resolve_broadcast_state(broadcast_state, n_vertices)
        else (lambda df: df)
    )
    adj = cached_copurchase_adjacency(spark, sf_dir)
    active = (
        adj.select(F.col("src").alias("node"))
        .distinct()
        .select("node", _priority(F.col("node")).alias("p"))
        .transform(truncate_lineage)
    )
    rows = []
    for r in range(1, rounds + 1):
        adj_act = (
            adj.join(
                bc(active.select(F.col("node").alias("src"))),
                "src",
                "left_semi",
            )
            .join(
                bc(active.select(F.col("node").alias("dst"))),
                "dst",
                "left_semi",
            )
        )
        min_nb = (
            adj_act.join(
                bc(
                    active.select(
                        F.col("node").alias("dst"), F.col("p").alias("pd")
                    )
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("pd").alias("min_nb"))
        )
        cand = active.join(bc(min_nb), "node", "left")
        selected = (
            cand.filter(
                F.col("min_nb").isNull() | (F.col("p") < F.col("min_nb"))
            )
            .select("node")
            .persist()
        )
        nbrs = adj_act.join(
            bc(selected.select(F.col("node").alias("dst"))),
            "dst",
            "left_semi",
        ).select(F.col("src").alias("node"))
        # Lazy checkpoints (the hits_fp one-action-per-round discipline):
        # the per-round counts action below materializes removed's
        # checkpoint (its count leg computes it), and the NEXT round's
        # counts action materializes nxt's — the prior eager pair spent
        # three driver actions per round on the same work.
        removed = selected.unionByName(nbrs).distinct().transform(
            truncate_lineage, eager=False
        )
        nxt = active.join(bc(removed), "node", "left_anti").transform(
            truncate_lineage, eager=False
        )
        # collect the three counts EAGERLY while the per-round frames
        # are still cached (ADVICE-r9: lazy count plans re-derived the
        # adjacency and all per-round semi-joins after the caches dropped)
        cnt = (
            active.agg(F.count(F.lit(1)).alias("n_active"))
            .crossJoin(selected.agg(F.count(F.lit(1)).alias("n_selected")))
            .crossJoin(removed.agg(F.count(F.lit(1)).alias("n_removed")))
            .first()
        )
        rows.append(
            (
                r,
                cnt["n_selected"],
                cnt["n_removed"],
                cnt["n_active"] - cnt["n_removed"],
            )
        )
        selected.unpersist()
        active = nxt
    return spark.createDataFrame(
        rows, "round long, n_selected long, n_removed long, n_remaining long"
    ).orderBy("round")
