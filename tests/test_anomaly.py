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
