"""Rolling-distinct / sweep-line activity analytics (operators/activity.py)
and link prediction (recs/linkpred.py): hand-computed fixtures + corpus
invariants."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from graphdb_td2_spark.operators.activity import (
    concurrent_sessions,
    rolling_active_users,
)
from graphdb_td2_spark.operators.quality_checks import benford_first_digit
from graphdb_td2_spark.recs.linkpred import (
    product_jaccard_topk,
    resource_allocation_topk,
)

EV = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def _write_events(spark, tmp_path, rows):
    d = tmp_path / "fx"
    spark.createDataFrame(rows, EV).write.parquet(str(d / "events.parquet"))
    return str(d)


def test_rolling_active_users_hand_computed(spark, tmp_path):
    day = lambda n: dt.datetime(2024, 1, n)  # noqa: E731
    # u1 active day1, u2 active day1+day3, u3 active day9.
    rows = [
        (1, day(1), 1, "a", 0.0, "{}"),
        (2, day(1), 2, "a", 0.0, "{}"),
        (3, day(3), 2, "a", 0.0, "{}"),
        (4, day(9), 3, "a", 0.0, "{}"),
    ]
    out = {
        r["day"].day: (r["active_1d"], r["active_7d"])
        for r in rolling_active_users(spark, _write_events(spark, tmp_path, rows)).collect()
    }
    # dense axis: every day 1..9 present, including gap days
    assert sorted(out) == list(range(1, 10))
    assert out[1] == (2, 2)
    assert out[3] == (1, 2)   # u1+u2 within trailing 7d
    assert out[7] == (0, 2)   # day1 still covers day7 (d..d+6)
    assert out[8] == (0, 1)   # day1 aged out, day3 still in
    assert out[9] == (1, 2)   # u3 plus u2's day3 (3+6=9)


def test_concurrent_sessions_peak_and_midnight_clip(spark, tmp_path):
    t = dt.datetime(2024, 1, 1, 12, 0)
    rows = [
        # u1: one session 12:00-12:10; u2: 12:05-12:15 → peak 2 on day 1
        (1, t, 1, "a", 0.0, "{}"),
        (2, t + dt.timedelta(minutes=10), 1, "a", 0.0, "{}"),
        (3, t + dt.timedelta(minutes=5), 2, "a", 0.0, "{}"),
        (4, t + dt.timedelta(minutes=15), 2, "a", 0.0, "{}"),
        # u3: session spanning midnight (23:55 → 00:05 next day, 10-min gap
        # is < 30 so it is ONE session clipped into both days)
        (5, dt.datetime(2024, 1, 1, 23, 55), 3, "a", 0.0, "{}"),
        (6, dt.datetime(2024, 1, 2, 0, 5), 3, "a", 0.0, "{}"),
    ]
    out = {
        r["day"].day: (r["n_sessions"], r["peak_concurrent"])
        for r in concurrent_sessions(spark, _write_events(spark, tmp_path, rows)).collect()
    }
    assert out[1] == (3, 2)  # three intervals touch day 1; peak is u1∥u2
    assert out[2] == (1, 1)  # the midnight session's day-2 clip


def test_concurrent_sessions_tie_start_equals_end(spark, tmp_path):
    t = dt.datetime(2024, 1, 1, 12, 0)
    # u1's session ends exactly when u2's starts: +1 sorts before -1,
    # so both count as open at t → peak 2.
    rows = [
        (1, t - dt.timedelta(minutes=5), 1, "a", 0.0, "{}"),
        (2, t, 1, "a", 0.0, "{}"),
        (3, t, 2, "a", 0.0, "{}"),
        (4, t + dt.timedelta(minutes=5), 2, "a", 0.0, "{}"),
    ]
    (r,) = concurrent_sessions(spark, _write_events(spark, tmp_path, rows)).collect()
    assert (r["n_sessions"], r["peak_concurrent"]) == (2, 2)


def test_linkpred_hand_computed(spark, tmp_path):
    d = tmp_path / "fx"
    orders = [(i, i, "O", 1.0, dt.datetime(2024, 1, 1), "1-URGENT") for i in range(1, 5)]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(d / "orders.parquet"))
    # customers 1,2 buy {10,20}; customer 3 buys {10,20,30}; customer 4 buys {30}
    li = [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 20), (3, 30), (4, 30)]
    spark.createDataFrame(
        [
            (ok, pk, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 1))
            for ok, pk in li
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, l_quantity double, l_extendedprice double, l_discount double, l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
    ).write.parquet(str(d / "lineitem.parquet"))
    jac = {(r["product_a"], r["product_b"]): r for r in product_jaccard_topk(spark, str(d)).collect()}
    # Γ(10)={1,2,3}, Γ(20)={1,2,3}, Γ(30)={3,4}: only (10,20) has ≥2 common
    assert set(jac) == {(10, 20)}
    assert jac[(10, 20)]["n_common"] == 3
    assert jac[(10, 20)]["jaccard"] == 1.0
    ra = {(r["product_a"], r["product_b"]): r for r in resource_allocation_topk(spark, str(d)).collect()}
    # RA(10,20) = 1e9//2 + 1e9//2 + 1e9//3 (customers 1,2 deg 2; customer 3 deg 3)
    assert ra[(10, 20)]["ra_score"] == 500_000_000 * 2 + 333_333_333


def test_benford_shares_sum_to_one(spark, sf_dir):
    rows = benford_first_digit(spark, sf_dir).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-9
    assert all(r["n_orders"] > 0 for r in rows)


def test_corpus_rolling_is_superset_of_daily(spark, sf_dir):
    rows = rolling_active_users(spark, sf_dir).collect()
    assert rows
    assert all(r["active_7d"] >= r["active_1d"] for r in rows)
    # dense axis: consecutive days
    days = [r["day"] for r in rows]
    assert all((b - a) == dt.timedelta(days=1) for a, b in zip(days, days[1:]))


def test_corpus_concurrency_bounds(spark, sf_dir):
    rows = concurrent_sessions(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["peak_concurrent"] <= r["n_sessions"]


def test_user_event_bitmaps_hand_computed(spark, tmp_path):
    from graphdb_td2_spark.operators.activity import user_event_bitmaps

    t = dt.datetime(2024, 1, 1)
    # types sorted: click(bit0), view(bit1). u1: click only → 1;
    # u2: view only → 2; u3: both → 3.
    rows = [
        (1, t, 1, "click", 0.0, "{}"),
        (2, t, 2, "view", 0.0, "{}"),
        (3, t, 3, "click", 0.0, "{}"),
        (4, t, 3, "view", 0.0, "{}"),
    ]
    out = {
        r["bitmap"]: (r["n_users"], r["example_types"])
        for r in user_event_bitmaps(spark, _write_events(spark, tmp_path, rows)).collect()
    }
    assert out == {
        1: (1, "click"),
        2: (1, "view"),
        3: (1, "click,view"),
    }
