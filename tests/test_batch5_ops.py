"""Modularity (graph/lpa.py), OLS trend (operators/timeseries.py),
ABC classes (recs/trending.py), activity streaks (operators/activity.py)."""

from __future__ import annotations

import datetime as dt

from graphdb_td2_spark.graph.lpa import community_modularity
from graphdb_td2_spark.operators.activity import user_activity_streaks
from graphdb_td2_spark.operators.timeseries import value_trend_by_type
from graphdb_td2_spark.recs.trending import abc_product_classes

EV = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def test_modularity_corpus_bounds(spark, sf_dir):
    (r,) = community_modularity(spark, sf_dir).collect()
    assert r["n_edges"] > 0
    assert r["n_communities"] >= 1
    # Newman Q is bounded in [-1/2, 1)
    assert -0.5 <= r["modularity"] < 1.0


def test_trend_hand_computed(spark, tmp_path):
    # perfect line: y = 100 + 50·x cents over days 0..3
    rows = [
        (i, dt.datetime(2024, 1, 1 + i), 1, "a", (100 + 50 * i) / 100.0, "{}")
        for i in range(4)
    ]
    d = tmp_path / "fx"
    spark.createDataFrame(rows, EV).write.parquet(str(d / "events.parquet"))
    (r,) = value_trend_by_type(spark, str(d)).collect()
    assert r["n_events"] == 4
    assert r["slope_cpd"] == 50.0
    assert r["intercept_c"] == 100.0


def test_abc_partition_and_order(spark, sf_dir):
    rows = {r["abc_class"]: r for r in abc_product_classes(spark, sf_dir).collect()}
    assert set(rows) == {"A", "B", "C"}
    total = sum(r["revenue_cents"] for r in rows.values())
    # by construction: A's cumulative share ≤ 80%, A+B's ≤ 95%
    assert rows["A"]["revenue_cents"] * 100 <= total * 80
    assert (rows["A"]["revenue_cents"] + rows["B"]["revenue_cents"]) * 100 <= total * 95
    # revenue-descending classes → average revenue per product decreases
    avg = {k: r["revenue_cents"] / r["n_products"] for k, r in rows.items()}
    assert avg["A"] >= avg["B"] >= avg["C"]


def test_streaks_hand_computed(spark, tmp_path):
    day = lambda n: dt.datetime(2024, 1, n)  # noqa: E731
    rows = [
        # user 1: days 1,2,3 then 5 → longest 3
        (1, day(1), 1, "a", 0.0, "{}"),
        (2, day(2), 1, "a", 0.0, "{}"),
        (3, day(3), 1, "a", 0.0, "{}"),
        (4, day(5), 1, "a", 0.0, "{}"),
        # user 2: single day → longest 1
        (5, day(2), 2, "a", 0.0, "{}"),
        # user 3: two separate 2-day runs → longest 2
        (6, day(1), 3, "a", 0.0, "{}"),
        (7, day(2), 3, "a", 0.0, "{}"),
        (8, day(7), 3, "a", 0.0, "{}"),
        (9, day(8), 3, "a", 0.0, "{}"),
    ]
    d = tmp_path / "fx"
    spark.createDataFrame(rows, EV).write.parquet(str(d / "events.parquet"))
    out = {r["streak_days"]: r["n_users"] for r in user_activity_streaks(spark, str(d)).collect()}
    assert out == {3: 1, 2: 1, 1: 1}
