"""LATERAL subquery (operators/sql_api.py) and Gini stump trainer
(functions/scoring.py)."""

from __future__ import annotations

import datetime as dt

from graphdb_td2_spark.functions.scoring import gini_stump_train
from graphdb_td2_spark.operators.sql_api import lateral_top_orders

EV = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def test_lateral_shape(spark, sf_dir):
    rows = lateral_top_orders(spark, sf_dir).collect()
    assert rows
    by_cust = {}
    for r in rows:
        by_cust.setdefault(r["c_custkey"], []).append(r)
    assert len(by_cust) <= 20
    for rs in by_cust.values():
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        # top-2 per customer, price-descending
        assert len(rs) <= 2
        prices = [r["o_totalprice_cents"] for r in rs]
        assert prices == sorted(prices, reverse=True)


def test_stump_separates_perfect_split(spark, tmp_path):
    t = dt.datetime(2024, 1, 1)
    # purchases all have value ≥ 10, others < 10 → perfect split at 5.00
    rows = [
        (1, t, 1, "view", 1.0, "{}"),
        (2, t, 1, "view", 2.0, "{}"),
        (3, t, 1, "click", 5.0, "{}"),
        (4, t, 1, "purchase", 10.0, "{}"),
        (5, t, 1, "purchase", 11.0, "{}"),
    ]
    d = tmp_path / "fx"
    spark.createDataFrame(rows, EV).write.parquet(str(d / "events.parquet"))
    (r,) = gini_stump_train(spark, str(d)).collect()
    assert r["threshold_cents"] == 500  # smallest threshold achieving gini 0
    assert r["weighted_gini"] == 0.0
    assert (r["n_left"], r["pos_left"], r["n_right"], r["pos_right"]) == (3, 0, 2, 2)


def test_stump_corpus_bounds(spark, sf_dir):
    (r,) = gini_stump_train(spark, sf_dir).collect()
    assert 0.0 <= r["weighted_gini"] <= 0.5
    assert r["n_left"] > 0 and r["n_right"] > 0
    assert r["pos_left"] + r["pos_right"] > 0


def test_variant_props_matches_string_path(spark, sf_dir):
    """VARIANT extraction must agree with the get_json_object histogram."""
    from graphdb_td2_spark.functions.json_props import (
        props_key_histogram,
        variant_props_stats,
    )

    v = {r["k_bucket"]: r["n_events"] for r in variant_props_stats(spark, sf_dir).collect()}
    s = {r["k_bucket"]: r["n_events"] for r in props_key_histogram(spark, sf_dir).collect()}
    assert v == s


def test_pit_no_leakage_and_coverage(spark, sf_dir):
    from graphdb_td2_spark.operators.asof import pit_training_set_stats

    rows = pit_training_set_stats(spark, sf_dir).collect()
    assert rows
    assert all(r["n_leaky"] == 0 for r in rows)  # strict-before invariant
    assert all(0 <= r["n_with_features"] <= r["n_labels"] for r in rows)
    # after day 1, most purchase labels should find a prior-day feature
    tail = rows[1:]
    assert sum(r["n_with_features"] for r in tail) > 0
