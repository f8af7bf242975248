"""SCD2 history (operators/cdc.py), negative sampling / balanced
downsampling (functions/sampling.py), ntile deciles (operators/windows.py)."""

from __future__ import annotations

import datetime as dt

from graphdb_td2_spark.functions.sampling import (
    balanced_label_sample,
    negative_sample_stats,
)
from graphdb_td2_spark.operators.cdc import scd2_customer_history
from graphdb_td2_spark.operators.windows import event_value_deciles


def test_scd2_hand_computed(spark, tmp_path):
    d = tmp_path / "fx"
    # key 1: insert (v1), update (v5), delete (v9) → two closed intervals
    # and a delete row that is NOT current; key 2: single open insert.
    rows = [
        (1, 1, "O", 10.0, dt.datetime(2024, 1, 1), "1-URGENT"),
        (5, 1, "F", 20.0, dt.datetime(2024, 1, 2), "5-LOW"),
        (9, 1, "P", 30.0, dt.datetime(2024, 1, 3), "5-LOW"),
        (3, 2, "O", 40.0, dt.datetime(2024, 1, 1), "2-HIGH"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(d / "orders.parquet"))
    out = scd2_customer_history(spark, str(d)).collect()
    k1 = [r for r in out if r["key"] == 1]
    assert [(r["valid_from"], r["valid_to"], r["op"], r["is_current"]) for r in k1] == [
        (1, 5, "I", False),
        (5, 9, "U", False),
        (9, None, "D", False),
    ]
    (k2,) = [r for r in out if r["key"] == 2]
    assert (k2["valid_to"], k2["op"], k2["is_current"]) == (None, "I", True)
    assert k2["price_cents"] == 4000


def test_scd2_intervals_chain(spark, sf_dir):
    out = scd2_customer_history(spark, sf_dir).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["key"], []).append(r)
    for rows in by_key.values():
        assert [r["valid_to"] for r in rows[:-1]] == [r["valid_from"] for r in rows[1:]]
        assert rows[-1]["valid_to"] is None
        assert sum(r["is_current"] for r in rows) <= 1


def test_negative_sampling_corpus(spark, sf_dir):
    rows = negative_sample_stats(spark, sf_dir).collect()
    assert [r["slot"] for r in rows] == [0, 1, 2, 3]
    n_users = rows[0]["n_candidates"]
    assert all(r["n_candidates"] == n_users for r in rows)
    for r in rows:
        assert 0 < r["n_negatives"] <= r["n_candidates"]
        assert r["neg_rate"] > 0.5  # positives are sparse → most draws negative


def test_balanced_sample_caps_every_label(spark, sf_dir):
    rows = balanced_label_sample(spark, sf_dir).collect()
    assert rows
    cap = min(r["n_total"] for r in rows)
    assert all(r["n_kept"] == cap for r in rows)
    assert all(r["kept_vec_id_sum"] > 0 for r in rows)


def test_deciles_shape(spark, sf_dir):
    rows = event_value_deciles(spark, sf_dir).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for rs in by_type.values():
        assert [r["decile"] for r in rs] == list(range(1, 11))
        # equal-frequency: ntile sizes differ by at most 1
        sizes = [r["n_events"] for r in rs]
        assert max(sizes) - min(sizes) <= 1
        # value ranges are non-overlapping and ordered
        for a, b in zip(rs, rs[1:]):
            assert a["max_value"] <= b["min_value"]
