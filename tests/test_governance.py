"""Right-to-be-forgotten cascade (functions/governance.py): the impact
audit and the anti-join propagation must be complements of each other."""

from __future__ import annotations

from graphdb_td2_spark.functions.governance import (
    forget_customer_impact,
    propagate_forget,
)
from graphdb_td2_spark.io import read_table


def test_impact_plus_survivors_is_total(spark, sf_dir):
    impact = {
        r["table_name"]: r["n_rows"]
        for r in forget_customer_impact(spark, sf_dir).collect()
    }
    survivors = propagate_forget(spark, sf_dir)
    for table in ("customer", "orders", "lineitem", "events"):
        total = read_table(spark, sf_dir, table).count()
        assert impact[table] + survivors[table].count() == total, table


def test_survivors_reference_no_seed(spark, sf_dir):
    from pyspark.sql import functions as F

    survivors = propagate_forget(spark, sf_dir)
    seeds = {
        r["c_custkey"]
        for r in read_table(spark, sf_dir, "customer", ["c_custkey"])
        .filter(F.col("c_custkey") % 1000 == 1)
        .collect()
    }
    assert seeds, "fixture must produce a non-empty seed set"
    left_orders = {r["o_custkey"] for r in survivors["orders"].collect()}
    assert not (left_orders & seeds)
    left_events = {r["user_id"] for r in survivors["events"].collect()}
    assert not (left_events & seeds)
    # lineitem survivors must not reference a deleted order
    dead_orders = {
        r["o_orderkey"]
        for r in read_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey").isin(list(seeds)))
        .collect()
    }
    left_li = {r["l_orderkey"] for r in survivors["lineitem"].collect()}
    assert not (left_li & dead_orders)


def test_k_anonymity_monotone_in_qi(spark, sf_dir):
    from graphdb_td2_spark.functions.governance import k_anonymity_report

    rows = {r["quasi_identifier"]: r for r in k_anonymity_report(spark, sf_dir).collect()}
    assert set(rows) == {"nation", "segment", "nation+segment"}
    # refining the QI can only shrink groups: the pair has at least as
    # many groups and a min size no larger than either single QI
    both = rows["nation+segment"]
    for single in ("nation", "segment"):
        assert both["n_groups"] >= rows[single]["n_groups"]
        assert both["min_group_size"] <= rows[single]["min_group_size"]
    for r in rows.values():
        assert r["n_exposed_rows"] <= 5 * r["n_small_groups"]
