"""Median/MAD anomaly detection (operators/anomaly.py): hand-computed
fixture + corpus sanity."""

from __future__ import annotations

import datetime as dt

from graphdb_td2_spark.operators.anomaly import event_value_anomalies

EV = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def test_hand_computed_mad(spark, tmp_path):
    t = dt.datetime(2024, 1, 1)
    # values 1..7 plus a wild 1000: med of 8 values = 4.5,
    # devs = [3.5, 2.5, 1.5, .5, .5, 1.5, 2.5, 995.5] → MAD = 2.0,
    # outliers: dev > 6 → only 1000
    rows = [
        (i, t, 1, "click", float(v), "{}")
        for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 1000])
    ]
    df = spark.createDataFrame(rows, EV)
    d = tmp_path / "fx"
    df.write.parquet(str(d / "events.parquet"))
    (r,) = event_value_anomalies(spark, str(d)).collect()
    assert r["med"] == 4.5
    assert r["mad"] == 2.0
    assert r["n_events"] == 8
    assert r["n_outliers"] == 1


def test_corpus_outliers_are_a_minority(spark, sf_dir):
    rows = event_value_anomalies(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["mad"] >= 0
        assert 0 <= r["n_outliers"] < r["n_events"] / 2


def test_winsorized_mean_between_bounds(spark, sf_dir):
    from graphdb_td2_spark.operators.anomaly import winsorized_value_stats

    rows = winsorized_value_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["p01"] <= r["p99"]
        assert r["p01"] <= r["mean_winsorized"] <= r["p99"]
        assert r["n_clipped"] <= r["n_events"] * 0.03  # ~2% tails


def test_autocorr_bounds(spark, sf_dir):
    import math

    from graphdb_td2_spark.operators.drift import daily_count_autocorr

    rows = daily_count_autocorr(spark, sf_dir).collect()
    assert [r["lag_days"] for r in rows] == [1, 7]
    for r in rows:
        assert r["n_pairs"] > 0
        if not math.isnan(r["autocorr"]):
            assert -1.0 - 1e-12 <= r["autocorr"] <= 1.0 + 1e-12


def test_changepoint_planted_step(spark, tmp_path):
    import datetime as dt

    from graphdb_td2_spark.operators.drift import revenue_changepoint

    d = tmp_path / "fx"
    # revenue 10.00/day for days 1-10, then 50.00/day for days 11-20:
    # best split is day 10 (left segment ends there)
    rows = [
        (i, 1, "O", 10.0 if i <= 10 else 50.0, dt.datetime(2024, 1, i), "1-URGENT")
        for i in range(1, 21)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(d / "orders.parquet"))
    (r,) = revenue_changepoint(spark, str(d)).collect()
    assert r["split_day"].day == 10
    assert r["mean_left"] == 1000.0 and r["mean_right"] == 5000.0
    assert r["n_left"] == 10 and r["n_right"] == 10
