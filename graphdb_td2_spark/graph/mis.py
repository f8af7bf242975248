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

Physical shape (r13, the components/pagerank co-partitioned discipline —
this replaced the broadcast-state dispatch): the co-purchase adjacency
is SYMMETRIC, so every per-round relation is derivable with src-keyed
joins only —

    min_nb(v) = min p(u) over active neighbors u
              = groupBy dst of p(src) over (adj ⋈ active priorities ON src)

(by symmetry the dst-grouped min over active srcs IS the neighbor-min;
inactive dst rows fall out of the left join from the active state), and
neighbors-of-selected is the dst set of (adj ⋈ selected ON src). With
the adjacency src-partitioned (the cached lake artifact) and the active
state id-partitioned under ``static_planning``, a round plans to TWO
exchanges (the min-neighbor combine and the neighbor-set distinct — both
message-scale) with zero broadcasts, one lazily-checkpointed state frame,
and ONE driver action (the two-sum flag aggregate, which doubles as the
checkpoint materialization and yields n_selected/n_removed; n_active is
tracked arithmetically from the stats sidecar's |V|). Results are
identical to the explicit semi/anti formulation: every combine is a MIN
or a set membership over exact keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .checkpointing import graph_partitions, static_planning, truncate_lineage
from .walks import cached_copurchase_adjacency

MIS_ROUNDS = 6


def _lake_n_vertices(spark: SparkSession, sf_dir: str) -> int:
    """|V| of the co-purchase graph from the lake stats sidecar — free
    after the first build (the hyperball dispatch source): partition
    sizing must not cost a count job per call."""
    from ..lake import copurchase_stats

    return copurchase_stats(spark, sf_dir)["n_vertices"]


def _copurchase_parts(spark: SparkSession, sf_dir: str, df: DataFrame) -> int:
    """The SAME partition budget ``cached_copurchase_adjacency`` was
    shaped with (both read the free stats sidecar), so the loop's state
    frames co-partition with the adjacency exchange-free."""
    from ..lake import copurchase_stats

    stats = copurchase_stats(spark, sf_dir)
    return graph_partitions(stats["n_vertices"], stats["n_edges"], df)


def _priority(node: F.Column) -> F.Column:
    s = node.cast("string")
    return F.concat(F.md5(s), F.lpad(s, 20, "0"))


def mis_round_sizes(
    spark: SparkSession,
    sf_dir: str,
    rounds: int = MIS_ROUNDS,
) -> DataFrame:
    """Registry entry: ``(round, n_selected, n_removed, n_remaining)`` —
    per Luby round: how many vertices joined the independent set, how
    many vertices deactivated in total (selected + their neighbors),
    and how many stay active. Ordered by round."""
    adj = cached_copurchase_adjacency(spark, sf_dir)
    parts = _copurchase_parts(spark, sf_dir, adj)
    rows = []
    with static_planning(spark, shuffle_partitions=parts):
        active = truncate_lineage(
            adj.select(F.col("src").alias("node"))
            .distinct()
            .select("node", _priority(F.col("node")).alias("p"))
            .repartition(parts, "node")
        )
        for r in range(1, rounds + 1):
            a_src = active.select(F.col("node").alias("src"), F.col("p").alias("ps"))
            min_nb = (
                adj.join(a_src.hint("shuffle_hash"), "src")
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min("ps").alias("min_nb"))
            )
            cand = active.join(min_nb.hint("shuffle_hash"), "node", "left").select(
                "node",
                "p",
                (
                    F.col("min_nb").isNull() | (F.col("p") < F.col("min_nb"))
                ).alias("sel"),
            )
            sel_src = cand.filter("sel").select(F.col("node").alias("src"))
            nbr = (
                adj.join(sel_src.hint("shuffle_hash"), "src", "left_semi")
                .select(F.col("dst").alias("node"))
                .distinct()
                .withColumn("nb", F.lit(True))
            )
            state = truncate_lineage(
                cand.join(nbr.hint("shuffle_hash"), "node", "left"),
                eager=False,
            )
            # ONE action: n_active rides along as the row count, so the
            # remaining-count needs no separate job and no caller-supplied
            # total (state rows ARE this round's active set)
            cnt = state.agg(
                F.count(F.lit(1)).cast("long").alias("n_active"),
                F.coalesce(
                    F.sum(F.when(F.col("sel"), 1)), F.lit(0)
                ).cast("long").alias("n_selected"),
                F.coalesce(
                    F.sum(F.when(F.col("sel") | F.col("nb").isNotNull(), 1)),
                    F.lit(0),
                ).cast("long").alias("n_removed"),
            ).first()
            rows.append(
                (
                    r,
                    cnt["n_selected"],
                    cnt["n_removed"],
                    cnt["n_active"] - cnt["n_removed"],
                )
            )
            active = state.filter(
                ~(F.col("sel") | F.col("nb").isNotNull())
            ).select("node", "p")
    return spark.createDataFrame(
        rows, "round long, n_selected long, n_removed long, n_remaining long"
    ).orderBy("round")
