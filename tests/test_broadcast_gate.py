"""The r13 broadcast-state auto-gate (VERDICT r12 finding #1): every
iterative graph module must derive its ``F.broadcast`` hints from a
vertex count, so a >5M-vertex graph NEVER force-broadcasts vertex-scale
state (Spark's 8 GB broadcast hard limit would kill the job on a real
100 TB graph). The dispatch is exercised synthetically: a tiny fixture
with a SUPPLIED above-bar vertex count must build and run the loop
without a single broadcast hint, while the sub-bar count must hint —
witnessed by spying on ``pyspark.sql.functions.broadcast`` (the only
way any of these modules requests a broadcast)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphdb_td2_spark.graph.checkpointing import (
    BROADCAST_STATE_MAX_VERTICES,
    resolve_broadcast_state,
)

ABOVE_BAR = BROADCAST_STATE_MAX_VERTICES + 1


def test_resolver_explicit_choice_wins():
    assert resolve_broadcast_state(True, ABOVE_BAR) is True
    assert resolve_broadcast_state(False, 10) is False


def test_resolver_derives_from_vertex_count():
    assert resolve_broadcast_state(None, 10) is True
    assert resolve_broadcast_state(None, BROADCAST_STATE_MAX_VERTICES) is True
    assert resolve_broadcast_state(None, ABOVE_BAR) is False


def test_resolver_no_count_means_no_broadcast():
    # never guess a frame is broadcastable
    assert resolve_broadcast_state(None, None) is False


@pytest.fixture()
def broadcast_spy(monkeypatch):
    """Spy on the one entry point every module's ``bc`` closure uses.
    Patched on the shared ``pyspark.sql.functions`` module object, which
    is what each graph module imported as ``F``."""
    calls: list[int] = []
    real = F.broadcast

    def spy(df):
        calls.append(1)
        return real(df)

    monkeypatch.setattr(F, "broadcast", spy)
    return calls


def _two_islands(spark):
    vertices = spark.createDataFrame(
        [(i,) for i in range(1, 7)], "id long"
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5), (5, 6)], "src long, dst long"
    )
    return vertices, edges


def test_components_big_graph_path_never_hints_broadcast(spark, broadcast_spy):
    from graphdb_td2_spark.graph.components import connected_components

    vertices, edges = _two_islands(spark)
    cc = {
        r.id: r.component
        for r in connected_components(
            vertices, edges, n_vertices=ABOVE_BAR
        ).collect()
    }
    assert cc == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4}
    assert broadcast_spy == []


def test_components_never_hints_broadcast_even_below_bar(spark, broadcast_spy):
    """r13: components runs CO-PARTITIONED at every scale — the broadcast
    fast path was removed outright after the co-partitioned shape
    measured 2.3× faster at sf0.1 (no per-round driver collect), so no
    vertex count, large or small, may produce a broadcast hint."""
    from graphdb_td2_spark.graph.components import connected_components

    vertices, edges = _two_islands(spark)
    cc = {
        r.id: r.component
        for r in connected_components(vertices, edges, n_vertices=6).collect()
    }
    assert cc == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4}
    assert broadcast_spy == []


def test_components_single_round_plan_is_one_exchange(spark):
    """Pin the r13 co-partitioned round shape: with the und relation and
    the label vector both checkpointed pre-partitioned under
    static_planning, one propagation round plans to ShuffledHashJoins
    with NO BroadcastExchange and exactly ONE exchange (the message
    combine's repartition)."""
    from graphdb_td2_spark.graph.checkpointing import (
        static_planning,
        truncate_lineage,
    )

    vertices, edges = _two_islands(spark)
    with static_planning(spark, shuffle_partitions=2):
        e = edges.select("src", "dst")
        und = truncate_lineage(
            e.union(e.selectExpr("dst as src", "src as dst"))
            .distinct()
            .repartition(2, "src")
        )
        labels = truncate_lineage(
            vertices.selectExpr("id", "id as component").repartition(2, "id")
        )
        msgs = (
            und.join(labels.hint("shuffle_hash"), und.src == labels.id)
            .select(F.col("dst").alias("id"), "component")
            .groupBy("id")
            .agg(F.min("component").alias("msg"))
        )
        merged = labels.join(msgs.hint("shuffle_hash"), "id", "left")
        plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in plan
    assert "ShuffledHashJoin" in plan
    assert plan.count("Exchange") == 1, plan
    # map-side combine intact: the partial aggregate sits BELOW the exchange
    assert plan.index("partial_min") > plan.index("Exchange"), plan


def test_lpa_big_graph_path_never_hints_broadcast(spark, broadcast_spy):
    from graphdb_td2_spark.graph.lpa import label_propagation

    vertices, edges = _two_islands(spark)
    out = label_propagation(
        vertices, edges, rounds=2, n_vertices=ABOVE_BAR
    ).collect()
    assert len(out) == 6
    assert broadcast_spy == []


def test_betweenness_big_graph_path_never_hints_broadcast(spark, broadcast_spy):
    from graphdb_td2_spark.graph.betweenness import betweenness_fixed_point

    # path 1-2-3-4: node 2 and 3 are the brokers
    adj = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3)],
        "src long, dst long",
    )
    top = betweenness_fixed_point(
        adj, n_seeds=2, rounds=3, k=4, n_vertices=ABOVE_BAR
    ).collect()
    assert [r["node"] for r in top][:1] == [2]
    assert broadcast_spy == []


def test_mis_never_hints_broadcast(spark, sf_dir, broadcast_spy):
    """r13: MIS runs co-partitioned at every scale (symmetry-rewritten
    src-keyed joins) — no broadcast hint exists in the module anymore."""
    from graphdb_td2_spark.graph.mis import mis_round_sizes

    rows = mis_round_sizes(spark, sf_dir, rounds=2).collect()
    assert rows  # runs end-to-end on the co-partitioned path
    assert broadcast_spy == []


def test_components_dispatch_invariant_results(spark):
    """MIN over ids is order-free: the labels don't depend on the
    partition-count dispatch (supplied vertex count vs derived)."""
    from graphdb_td2_spark.graph.components import connected_components

    vertices, edges = _two_islands(spark)
    a = sorted(
        map(tuple, connected_components(vertices, edges, n_vertices=6).collect())
    )
    b = sorted(map(tuple, connected_components(vertices, edges).collect()))
    assert a == b


def _path_graph(spark, n):
    vertices = spark.createDataFrame([(i,) for i in range(1, n + 1)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "src long, dst long"
    )
    return vertices, edges


def test_pointer_jump_converges_logarithmically(spark):
    """A 24-vertex path graph needs 23 plain-propagation rounds; with
    label-doubling it must converge within 8 — the adversarial
    high-diameter case VERDICT r12 task 3 names."""
    from graphdb_td2_spark.graph.components import connected_components

    vertices, edges = _path_graph(spark, 24)
    cc = {
        r.id: r.component
        for r in connected_components(
            vertices, edges, max_iter=8, pointer_jump=True
        ).collect()
    }
    assert set(cc.values()) == {1}

    # plain propagation at the same round budget must NOT have converged —
    # the witness that the jump is doing the work
    plain = {
        r.id: r.component
        for r in connected_components(
            vertices, edges, max_iter=8, pointer_jump=False
        ).collect()
    }
    assert set(plain.values()) != {1}


def test_pointer_jump_matches_plain_at_convergence(spark):
    from graphdb_td2_spark.graph.components import connected_components

    vertices, edges = _two_islands(spark)
    a = sorted(map(tuple, connected_components(vertices, edges).collect()))
    b = sorted(
        map(
            tuple,
            connected_components(vertices, edges, pointer_jump=True).collect(),
        )
    )
    assert a == b
