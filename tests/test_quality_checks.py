"""Data-quality report (operators/quality_checks.py): planted-violation
fixture + clean-corpus expectations."""

from __future__ import annotations

import datetime as dt

from graphdb_td2_spark.operators.quality_checks import orders_quality_report

ORD = (
    "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
    "o_orderdate timestamp, o_orderpriority string"
)
CUST = "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string"


def test_planted_violations_are_counted(spark, tmp_path):
    t = dt.datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [
            (1, 10, "O", 5.0, t, "1-URGENT"),
            (1, 10, "O", 5.0, t, "2-HIGH"),  # duplicate key
            (2, 99, "O", -3.0, t, "5-LOW"),  # orphan custkey + negative price
            (3, 10, "O", 7.0, None, "BOGUS"),  # null date + bad domain
        ],
        ORD,
    )
    customers = spark.createDataFrame([(10, "c", 1, 0.0, "BUILDING")], CUST)
    d = tmp_path / "fx"
    orders.write.parquet(str(d / "orders.parquet"))
    customers.write.parquet(str(d / "customer.parquet"))
    got = {
        r["check_name"]: (r["n_violations"], r["n_total"])
        for r in orders_quality_report(spark, str(d)).collect()
    }
    assert got == {
        "completeness:o_orderkey": (0, 4),
        "completeness:o_orderdate": (1, 4),
        "uniqueness:o_orderkey": (1, 4),
        "range:o_totalprice>=0": (1, 4),
        "domain:o_orderpriority": (1, 4),
        "ref_integrity:o_custkey->customer": (1, 4),
    }


def test_corpus_is_clean(spark, sf_dir):
    rows = orders_quality_report(spark, sf_dir).collect()
    assert len(rows) == 6
    assert all(r["n_violations"] == 0 for r in rows)
