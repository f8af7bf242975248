"""Connected components of the property graph [extension] — iterative
min-label propagation, the companion to ``pagerank.py`` on the L3
"graph algorithms Catalyst can't express" tier (SURVEY.md §4 item 1).

Algorithm: every vertex starts labeled with its own id; each round a
vertex takes the minimum label among itself and its neighbors (edges
treated as undirected). Converges in O(component diameter) rounds —
checked each round, with a hard cap. ``pointer_jump=True`` adds a
label-doubling step per round (new_label(v) := new_label(new_label(v)),
well-defined because labels are vertex ids), which cuts the round bound
to O(log diameter) — the acceleration the pathological path-graph needs.
Both schedules reach the same fixpoint (the component-minimum id), so
the oracle twin matches either way.

Frontier-delta messages (r13, the ``bfs.py``/``sssp.py`` discipline):
only vertices whose label CHANGED last round emit messages — an
unchanged vertex's label already reached every neighbor in the round it
last changed, and the min-merge is monotone, so dropping repeat sends is
exactly equivalent to full propagation (the oracle, which unrolls FULL
rounds, hash-matches — the executable proof). Round 1 sends from
everyone; on dense corpora the frontier collapses within 2-3 rounds and
tail rounds cost frontier-scale, not |V|-scale.

Iterative-loop discipline (same as pagerank): the label frame's lineage
is truncated EVERY round. The labels enter the next round's plan through
both the join and the union leg, so without truncation the plan doubles
per round and Catalyst re-analysis goes exponential. The truncation mode
is session-configurable (``graph/checkpointing.py``): executor-local by
default, reliable FS-backed ``checkpoint()`` for durable cluster runs.

Not SQL-expressible in one query → the driver records the weaker
rows-only check (like pagerank/ppr); semantics are unit-tested on
fixtures with known components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .checkpointing import resolve_broadcast_state, truncate_lineage

from .queries import cached_graph

# Safety valve only — propagation stops at the first unchanged round (the
# corpus graph converges in <10; with pointer_jump the bound is
# logarithmic in the diameter instead of linear).
DEFAULT_MAX_ITER = 50


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    max_iter: int = DEFAULT_MAX_ITER,
    broadcast_state: bool | None = None,
    und: DataFrame | None = None,
    n_vertices: int | None = None,
    pointer_jump: bool = False,
) -> DataFrame:
    """``(id, component)`` — component = min vertex id reachable (any total
    order over ids works; string ids use their lexicographic order).

    ``broadcast_state``: tri-state, resolved by the tier-wide rule
    (``checkpointing.resolve_broadcast_state``). On the broadcast path the
    frontier broadcasts into the persisted edge join and the min-combined
    messages broadcast into the label merge (the betweenness/sssp
    state-side discipline) — the only per-round shuffle is the message
    combine. The default (None) derives the choice from ``n_vertices``:
    above ``BROADCAST_STATE_MAX_VERTICES`` — or when no count is supplied
    — every join stays on the co-partitioned shuffle path (a broadcast
    hint is obeyed regardless of size, and a vertex-scale broadcast dies
    at Spark's 8 GB limit on a 100 TB graph; VERDICT r12 finding #1).
    MIN over ids is order-free, so the labels are identical either way."""
    # ``und``: a caller-owned prebuilt undirected relation (the session
    # lake artifact, ``graph.queries.cached_und_edges``) — when absent the
    # loop derives and owns a call-scoped copy.
    owns_und = und is None
    if owns_und:
        und = (
            edges.select("src", "dst")
            .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
            .distinct()
            .persist()
        )
    bc = (
        F.broadcast
        if resolve_broadcast_state(broadcast_state, n_vertices)
        else (lambda df: df)
    )
    labels = vertices.select("id", F.col("id").alias("component")).transform(
        truncate_lineage
    )
    frontier = labels
    # ONE driver action per round (the hits_fp discipline): the convergence
    # probe over the persisted merged frame is the round's only action; the
    # new label vector and frontier checkpoint LAZILY and materialize
    # inside the NEXT round's probe, which still reads this round's
    # persisted merged — so the persist is released one round late (live
    # state stays bounded at und + labels + one merged frame).
    prev_merged: list = []
    for _ in range(max_iter):
        msgs = (
            und.join(bc(frontier), und.src == frontier.id)
            .select(F.col("dst").alias("id"), "component")
            .groupBy("id")
            .agg(F.min("component").alias("msg"))
        )
        merged = labels.join(bc(msgs), "id", "left")
        if pointer_jump:
            # label-doubling: after the propagate step, chase the new
            # label one hop through the label table itself. Labels are
            # vertex ids, so the lookup side is the propagated table
            # keyed by id; an unmatched or larger target keeps the
            # propagated label (labels only ever decrease).
            step = merged.select(
                "id",
                # least() skips NULLs: isolated vertices keep their label
                F.least("msg", "component").alias("comp1"),
                F.col("component").alias("old_comp"),
            )
            lookup = step.select(
                F.col("id").alias("jid"), F.col("comp1").alias("jcomp")
            )
            merged = (
                step.join(bc(lookup), step.comp1 == lookup.jid, "left")
                .select(
                    "id",
                    F.least(
                        F.coalesce("jcomp", "comp1"), F.col("comp1")
                    ).alias("msg"),
                    F.col("old_comp").alias("component"),
                )
            )
        merged = merged.persist()
        # least() skips NULLs: isolated vertices (msg NULL) keep their label
        new_labels = merged.select(
            "id", F.least("msg", "component").alias("component")
        ).transform(truncate_lineage, eager=False)
        improved = merged.filter(F.col("msg") < F.col("component"))
        frontier = improved.select(
            "id", F.col("msg").alias("component")
        ).transform(truncate_lineage, eager=False)
        changed = improved.limit(1).count()
        if prev_merged:
            prev_merged.pop().unpersist()
        prev_merged.append(merged)
        labels = new_labels
        if changed == 0:
            break
    # materialize the final (lazily-checkpointed) labels before releasing
    # the caches they were computed from
    labels = labels.transform(truncate_lineage, eager=True)
    if prev_merged:
        prev_merged.pop().unpersist()
    if owns_und:
        und.unpersist()
    return labels


def component_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Component-size histogram of the full property graph:
    ``(size, n_components)`` ordered by size descending."""
    from .queries import cached_und_edges, cached_vertex_count

    g = cached_graph(spark, sf_dir)
    cc = connected_components(
        g.vertices,
        g.edges,
        und=cached_und_edges(spark, sf_dir),
        n_vertices=cached_vertex_count(spark, sf_dir),
    )
    return (
        cc.groupBy("component")
        .agg(F.count(F.lit(1)).alias("size"))
        .groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_components"))
        .orderBy(F.desc("size"))
    )
