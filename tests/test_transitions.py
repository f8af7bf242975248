"""Markov transition matrix (operators/transitions.py): normalization
laws on the corpus plus a hand-computed fixture with equal-timestamp
ties."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from graphdb_td2_spark.operators.transitions import event_transition_matrix


def test_rows_normalize_and_counts_partition(spark, sf_dir):
    rows = event_transition_matrix(spark, sf_dir).collect()
    assert rows
    by_prev: dict[str, list] = {}
    for r in rows:
        by_prev.setdefault(r["prev_type"], []).append(r)
    for prev, grp in by_prev.items():
        n_from = grp[0]["n_from"]
        assert all(g["n_from"] == n_from for g in grp)
        assert sum(g["n_trans"] for g in grp) == n_from
        assert abs(sum(g["p"] for g in grp) - 1.0) < 1e-9
        for g in grp:
            assert g["p"] == g["n_trans"] / n_from


def test_hand_computed_fixture_with_ts_ties(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: a -> b -> b (second and third share ts; event_id orders them)
        (1, t0, 10, "a", 0.0, "{}"),
        (2, t0 + dt.timedelta(minutes=1), 10, "b", 0.0, "{}"),
        (3, t0 + dt.timedelta(minutes=1), 10, "b", 0.0, "{}"),
        # user 2: b -> a
        (4, t0, 20, "b", 0.0, "{}"),
        (5, t0 + dt.timedelta(minutes=5), 20, "a", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = tmp_path / "fx"
    df.repartition(2).write.parquet(str(d / "events.parquet"))
    got = {
        (r["prev_type"], r["next_type"]): (r["n_trans"], r["n_from"])
        for r in event_transition_matrix(spark, str(d)).collect()
    }
    assert got == {
        ("a", "b"): (1, 1),
        ("b", "b"): (1, 2),
        ("b", "a"): (1, 2),
    }


def test_type_affinity_symmetric_bounds(spark, sf_dir):
    from graphdb_td2_spark.operators.transitions import event_type_affinity

    rows = event_type_affinity(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert 0 < r["n_both"] <= min(r["n_a"], r["n_b"])
        assert r["lift"] > 0
