"""Rank-1 fixed-point ALS (recs/als.py) and U-shaped attribution
(operators/attribution.py): hand fixtures + corpus invariants."""

from __future__ import annotations

import datetime as dt

from graphdb_td2_spark.operators.attribution import ushape_attribution
from graphdb_td2_spark.recs.als import ALS_SCALE, als_rank1_convergence

EV = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def _write_orders_lineitem(spark, tmp_path, baskets):
    d = tmp_path / "fx"
    orders = [
        (ok, ck, "O", 1.0, dt.datetime(2024, 1, 1), "1-URGENT")
        for ok, ck in {(ok, ck) for ok, ck, _ in baskets}
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(d / "orders.parquet"))
    spark.createDataFrame(
        [
            (ok, pk, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 1))
            for ok, _, pk in baskets
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, l_quantity double, l_extendedprice double, l_discount double, l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
    ).write.parquet(str(d / "lineitem.parquet"))
    return str(d)


def test_als_rank1_exact_on_rank1_matrix(spark, tmp_path):
    # A genuinely rank-1 rating matrix (all ratings 1) must reconstruct
    # (nearly) exactly: every u*v ≈ 1.0 within fixed-point floor error.
    baskets = [(10 * c + p, c, p) for c in (1, 2, 3) for p in (7, 8)]
    sf = _write_orders_lineitem(spark, tmp_path, baskets)
    rows = als_rank1_convergence(spark, sf).collect()
    assert [r["iteration"] for r in rows] == [1, 2]
    assert all(r["n_obs"] == 6 for r in rows)
    # SSE in S²-scaled fixed point: residuals are pure truncation noise,
    # far below 0.01² per observation.
    tol = 6 * int((0.01 * ALS_SCALE**2) ** 2 / ALS_SCALE**2)
    assert rows[0]["sse_fp"] <= tol
    assert rows[1]["sse_fp"] <= tol


def test_als_corpus_convergence(spark, sf_dir):
    rows = als_rank1_convergence(spark, sf_dir).collect()
    assert [r["iteration"] for r in rows] == [1, 2]
    assert rows[0]["n_obs"] == rows[1]["n_obs"] > 0
    # ALS minimizes SSE each half-step; allow fixed-point floor slack.
    assert rows[1]["sse_fp"] <= rows[0]["sse_fp"] * 1.001 + 1000


def test_ushape_hand_computed(spark, tmp_path):
    t = dt.datetime(2024, 1, 1, 12, 0)
    rows = [
        # user 1: view, click, view, purchase → 4000/1000(mid)/5000(last incl.
        # remainder 0: m=1 → mid 2000, last 4000+0... k=3: first 4000,
        # mid(=pos2) 2000, last 4000+(2000-1*2000)=4000
        (1, t, 1, "view", 0.0, "{}"),
        (2, t + dt.timedelta(minutes=1), 1, "click", 0.0, "{}"),
        (3, t + dt.timedelta(minutes=2), 1, "view", 0.0, "{}"),
        (4, t + dt.timedelta(minutes=3), 1, "purchase", 0.0, "{}"),
        # user 2: single touch → 10000
        (5, t, 2, "click", 0.0, "{}"),
        (6, t + dt.timedelta(minutes=5), 2, "purchase", 0.0, "{}"),
        # user 3: touch outside the 1h window → excluded entirely
        (7, t - dt.timedelta(hours=2), 3, "view", 0.0, "{}"),
        (8, t, 3, "purchase", 0.0, "{}"),
    ]
    d = tmp_path / "fx"
    spark.createDataFrame(rows, EV).write.parquet(str(d / "events.parquet"))
    out = {r["event_type"]: (r["credit_bp"], r["n_touches"]) for r in ushape_attribution(spark, str(d)).collect()}
    # user1: view first 4000 + view last 4000 = 8000; click mid 2000
    assert out["view"] == (8000, 2)
    assert out["click"] == (2000 + 10000, 2)


def test_ushape_corpus_credit_conserved(spark, sf_dir):
    rows = ushape_attribution(spark, sf_dir).collect()
    assert rows
    total = sum(r["credit_bp"] for r in rows)
    # every attributed purchase contributes exactly 10000 bp
    assert total % 10000 == 0
    assert total > 0
