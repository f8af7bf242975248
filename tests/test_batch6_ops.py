"""Edge support (graph/triangles.py), conversion latency
(operators/attribution.py), day-of-week anomalies (operators/anomaly.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from graphdb_td2_spark.graph.triangles import edge_support_histogram
from graphdb_td2_spark.operators.anomaly import dow_daily_anomalies
from graphdb_td2_spark.operators.attribution import conversion_latency_quantiles

EV = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
LI = "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, l_quantity double, l_extendedprice double, l_discount double, l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp"


def test_edge_support_hand_computed(spark, tmp_path):
    d = tmp_path / "fx"
    # K4 on products 1-4: every pair co-occurs in 2 orders → 6 edges,
    # each edge in exactly 2 triangles (4 triangles total in K4).
    rows = []
    oid = 0
    for rep in range(2):
        for a in range(1, 5):
            for b in range(a + 1, 5):
                oid += 1
                rows += [(oid, a), (oid, b)]
    spark.createDataFrame(
        [
            (ok, pk, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 1))
            for ok, pk in rows
        ],
        LI,
    ).write.parquet(str(d / "lineitem.parquet"))
    out = {r["support"]: r["n_edges"] for r in edge_support_histogram(spark, str(d)).collect()}
    assert out == {2: 6}


def test_edge_support_corpus_accounting(spark, sf_dir):
    rows = edge_support_histogram(spark, sf_dir).collect()
    assert rows
    # Σ support·n_edges = 3 · n_triangles — cross-check with triangle_stats
    from graphdb_td2_spark.graph.triangles import triangle_stats

    (t,) = triangle_stats(spark, sf_dir).collect()
    assert sum(r["support"] * r["n_edges"] for r in rows) == 3 * t["n_triangles"]
    assert sum(r["n_edges"] for r in rows) == t["n_edges"]


def test_latency_hand_computed(spark, tmp_path):
    t = dt.datetime(2024, 1, 1, 12, 0)
    rows = [
        (1, t, 1, "view", 0.0, "{}"),
        (2, t + dt.timedelta(minutes=2), 1, "click", 0.0, "{}"),
        (3, t + dt.timedelta(minutes=10), 1, "purchase", 0.0, "{}"),
    ]
    d = tmp_path / "fx"
    spark.createDataFrame(rows, EV).write.parquet(str(d / "events.parquet"))
    (r,) = conversion_latency_quantiles(spark, str(d)).collect()
    # first touch is the view at t → latency 600 s
    assert r["first_touch_type"] == "view"
    assert r["n_purchases"] == 1
    assert r["p50_latency_s"] == 600.0
    assert r["p90_latency_s"] == 600.0


def test_dow_anomalies_corpus(spark, sf_dir):
    rows = dow_daily_anomalies(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 7
    assert all(1 <= r["dow"] <= 7 for r in rows)
    total_days = sum(r["n_days"] for r in rows)
    # consistency with the dense daily rollup: every observed day counted once
    from graphdb_td2_spark.io import read_table

    n_days = (
        read_table(spark, sf_dir, "events", ["ts"])
        .select(F.date_trunc("day", "ts").alias("d"))
        .distinct()
        .count()
    )
    assert total_days == n_days
    assert all(r["n_outliers"] <= r["n_days"] for r in rows)


def test_ktruss_monotone_and_subset(spark, sf_dir):
    from graphdb_td2_spark.graph.triangles import (
        cooccurrence_edges,
        ktruss_edge_counts,
    )
    from graphdb_td2_spark.io import read_table

    rows = ktruss_edge_counts(spark, sf_dir).collect()
    assert [r["round"] for r in rows] == [1, 2]
    # peeling only removes edges
    li = read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    n0 = cooccurrence_edges(li).count()
    assert n0 >= rows[0]["n_edges"] >= rows[1]["n_edges"] >= 0


def test_ktruss_k4_clique_is_stable(spark, tmp_path):
    import datetime as dt

    from graphdb_td2_spark.graph.triangles import ktruss_edge_counts

    d = tmp_path / "fx"
    # K4 (every pair in 2 common orders): each edge closes 2 triangles →
    # survives k=4 peeling (needs ≥ k−2 = 2) in every round.
    rows = []
    oid = 0
    for rep in range(2):
        for a in range(1, 5):
            for b in range(a + 1, 5):
                oid += 1
                rows += [(oid, a), (oid, b)]
    spark.createDataFrame(
        [
            (ok, pk, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 1))
            for ok, pk in rows
        ],
        LI,
    ).write.parquet(str(d / "lineitem.parquet"))
    out = {r["round"]: r["n_edges"] for r in ktruss_edge_counts(spark, str(d)).collect()}
    assert out == {1: 6, 2: 6}
