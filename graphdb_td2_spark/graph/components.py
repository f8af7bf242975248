"""Connected components of the property graph [extension] — iterative
min-label propagation, the companion to ``pagerank.py`` on the L3
"graph algorithms Catalyst can't express" tier (SURVEY.md §4 item 1).

Algorithm: every vertex starts labeled with its own id; each round a
vertex takes the minimum label among itself and its neighbors (edges
treated as undirected). Converges in O(component diameter) rounds —
checked each round, with a hard cap.

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

from .checkpointing import truncate_lineage

from .queries import cached_graph

# Safety valve only — propagation stops at the first unchanged round (the
# corpus graph converges in <10); rounds needed = component diameter, so a
# pathological path-graph would need pointer-jumping acceleration instead.
DEFAULT_MAX_ITER = 50


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    max_iter: int = DEFAULT_MAX_ITER,
    broadcast_state: bool = True,
    und: DataFrame | None = None,
) -> DataFrame:
    """``(id, component)`` — component = min vertex id reachable (any total
    order over ids works; string ids use their lexicographic order).

    ``broadcast_state`` (default): the vertex-sized label frame
    broadcasts into the persisted edge join and the min-combined
    messages broadcast into the label merge (the betweenness/sssp
    state-side discipline) — the only per-round shuffle is the message
    combine, and the persisted merged frame serves BOTH the new labels
    and the convergence probe without recomputation. Pass
    False above broadcast capacity; MIN over ids is order-free, so the
    labels are identical either way."""
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
    bc = F.broadcast if broadcast_state else (lambda df: df)
    labels = vertices.select("id", F.col("id").alias("component")).transform(truncate_lineage)
    # ONE driver action per round (the hits_fp discipline): the convergence
    # probe over the persisted merged frame is the round's only action; the
    # new label vector checkpoints LAZILY and materializes inside the NEXT
    # round's probe, which still reads this round's persisted merged — so
    # the persist is released one round late (live state stays bounded at
    # und + labels + one merged frame).
    prev_merged: list = []
    for _ in range(max_iter):
        msgs = (
            und.join(bc(labels), und.src == labels.id)
            .select(F.col("dst").alias("id"), "component")
            .groupBy("id")
            .agg(F.min("component").alias("msg"))
        )
        merged = labels.join(bc(msgs), "id", "left").persist()
        # least() skips NULLs: isolated vertices (msg NULL) keep their label
        new_labels = merged.select(
            "id", F.least("msg", "component").alias("component")
        ).transform(truncate_lineage, eager=False)
        changed = (
            merged.filter(F.col("msg") < F.col("component")).limit(1).count()
        )
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
    from .queries import cached_und_edges

    g = cached_graph(spark, sf_dir)
    cc = connected_components(
        g.vertices, g.edges, und=cached_und_edges(spark, sf_dir)
    )
    return (
        cc.groupBy("component")
        .agg(F.count(F.lit(1)).alias("size"))
        .groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_components"))
        .orderBy(F.desc("size"))
    )
