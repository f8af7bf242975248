"""Decayed popularity (recs/trending.py) and RFM segmentation
(operators/rfm.py): hand-computed decay fixture + accounting laws."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from graphdb_td2_spark.io import read_table
from graphdb_td2_spark.operators.rfm import rfm_segments
from graphdb_td2_spark.recs.trending import KMAX, decayed_product_popularity

ORD = (
    "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
    "o_orderdate timestamp, o_orderpriority string"
)
LI = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
    "l_returnflag string, l_linestatus string, l_shipdate timestamp"
)


def test_decay_weights_hand_computed(spark, tmp_path):
    t0 = dt.datetime(2024, 6, 1)

    def order(k, days_before):
        return (k, 1, "O", 10.0, t0 - dt.timedelta(days=days_before), "1-URGENT")

    def item(k, part):
        return (k, part, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", None)

    # product 100: purchases at age 0 and 45 (k=0 and k=1) → 2^20 + 2^19
    # product 200: one purchase at age 700 (k=20 capped)     → 2^0
    orders = spark.createDataFrame(
        [order(1, 0), order(2, 45), order(3, 700)], ORD
    )
    items = spark.createDataFrame(
        [item(1, 100), item(2, 100), item(3, 200)], LI
    )
    d = tmp_path / "fx"
    orders.write.parquet(str(d / "orders.parquet"))
    items.write.parquet(str(d / "lineitem.parquet"))
    got = {
        r["product_id"]: (r["score_fp"], r["n_purchases"])
        for r in decayed_product_popularity(spark, str(d)).collect()
    }
    assert got == {
        100: ((1 << KMAX) + (1 << (KMAX - 1)), 2),
        200: (1, 1),
    }


def test_rfm_accounts_for_every_customer_and_cent(spark, sf_dir):
    rows = rfm_segments(spark, sf_dir).collect()
    assert rows
    orders = read_table(spark, sf_dir, "orders", ["o_custkey", "o_totalprice"])
    n_cust = orders.select("o_custkey").distinct().count()
    cents = (
        orders.agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("c")
        ).collect()[0]["c"]
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
    assert sum(r["total_cents"] for r in rows) == cents
    for r in rows:
        assert 0 <= r["r_bucket"] <= 3
        assert 0 <= r["f_bucket"] <= 3
        assert 0 <= r["m_bucket"] <= 3
