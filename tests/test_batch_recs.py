"""Corpus-wide batch recommendation scoring (recs/batch.py)."""

from __future__ import annotations

import datetime as dt

from graphdb_td2_spark.recs.batch import (
    batch_recommendations,
    batch_recommendations_stats,
)

O = "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string"
LI = "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, l_quantity double, l_extendedprice double, l_discount double, l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp"
C = "c_custkey long, c_name string, c_nationkey int, c_mktsegment string"


def test_batch_recs_chain_hand_computed(spark, tmp_path):
    d = tmp_path / "fx"
    ts = dt.datetime(2024, 1, 1)
    # orders: customers 1..3 each one order; customer 4 exists but never bought.
    spark.createDataFrame(
        [(i, i, "O", 1.0, ts, "1-URGENT") for i in (1, 2, 3)], O
    ).write.parquet(str(d / "orders.parquet"))
    # products 10,20 co-occur in 2 baskets (support 2 → an edge);
    # customer 3 bought only 30 (edge-isolated).
    li = [(1, 10), (1, 20), (2, 10), (2, 20), (3, 30)]
    spark.createDataFrame(
        [(ok, pk, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts) for ok, pk in li], LI
    ).write.parquet(str(d / "lineitem.parquet"))
    spark.createDataFrame(
        [(i, f"c{i}", 0, "SEG") for i in (1, 2, 3, 4)], C
    ).write.parquet(str(d / "customer.parquet"))
    recs = {r["customer_id"]: r for r in batch_recommendations(spark, str(d)).collect()}
    assert set(recs) == {1, 2, 3, 4}
    # customers 1,2 own both edge endpoints → all candidates anti-joined
    # away → fallback to global best seller (10: min id at 2 buyers tie)
    assert recs[1]["strategy"] == "global_fallback" and recs[1]["product_id"] == 10
    # customer 3's only product has no edges → fallback
    assert recs[3]["strategy"] == "global_fallback"
    # customer 4 never bought anything → fallback
    assert recs[4]["strategy"] == "global_fallback"


def test_batch_recs_cf_scoring(spark, tmp_path):
    d = tmp_path / "fx"
    ts = dt.datetime(2024, 1, 1)
    # c1's order has only product 10; c2/c3's orders create the (10, 20)
    # edge with support 2 → c1's top candidate is 20 via co-occurrence.
    spark.createDataFrame(
        [(i, i, "O", 1.0, ts, "1-URGENT") for i in (1, 2, 3)], O
    ).write.parquet(str(d / "orders.parquet"))
    li = [(1, 10), (2, 10), (2, 20), (3, 10), (3, 20)]
    spark.createDataFrame(
        [(ok, pk, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts) for ok, pk in li], LI
    ).write.parquet(str(d / "lineitem.parquet"))
    spark.createDataFrame(
        [(i, f"c{i}", 0, "S") for i in (1, 2, 3)], C
    ).write.parquet(str(d / "customer.parquet"))
    recs = {r["customer_id"]: r for r in batch_recommendations(spark, str(d)).collect()}
    assert recs[1]["strategy"] == "cooccurrence"
    assert recs[1]["product_id"] == 20
    # c2/c3 own both endpoints → anti-joined away → fallback
    assert recs[2]["strategy"] == "global_fallback"


def test_batch_recs_stats_cover_all_customers(spark, sf_dir):
    stats = batch_recommendations_stats(spark, sf_dir).collect()
    from graphdb_td2_spark.io import read_table

    n_cust = read_table(spark, sf_dir, "customer", ["c_custkey"]).count()
    assert sum(r["n_customers"] for r in stats) == n_cust
    assert all(r["n_distinct_products"] >= 1 for r in stats)
