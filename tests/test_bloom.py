"""Bloom-filter pruning (functions/bloom.py): the no-false-negative
guarantee (with-bloom result == without-bloom result), false-positive-rate
sanity on a disjoint key set, and the plan shape (md5 pre-filter BELOW the
exact semi-join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_td2_spark.functions.bloom import (
    K_HASHES,
    M_BITS,
    bloom_urgent_order_events,
    build_bloom,
    might_contain,
)
from graphdb_td2_spark.io import read_table


def test_no_false_negatives_and_exact_result(spark, sf_dir):
    urgent = (
        read_table(spark, sf_dir, "orders", ["o_custkey", "o_orderpriority"])
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    bloom = build_bloom(urgent, "o_custkey")
    # every build-set key must probe true
    misses = urgent.filter(~might_contain(F.col("o_custkey"), bloom)).count()
    assert misses == 0
    # the registry entry equals the plain semi-join (bloom transparent)
    ev = read_table(spark, sf_dir, "events", ["user_id", "event_type"])
    plain = {
        (r["event_type"], r["n_events"])
        for r in ev.join(
            F.broadcast(urgent), ev.user_id == urgent.o_custkey, "left_semi"
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .collect()
    }
    got = {
        (r["event_type"], r["n_events"])
        for r in bloom_urgent_order_events(spark, sf_dir).collect()
    }
    assert got == plain


def test_false_positive_rate_on_disjoint_keys(spark):
    """Probe 2000 keys guaranteed absent from a 500-key build set: the
    pass count must be near the analytic FPR (generous 10x bound)."""
    import math

    build = spark.range(0, 500).select(F.col("id").alias("k"))
    bloom = build_bloom(build, "k")
    probe = spark.range(1_000_000, 1_002_000).select(F.col("id").alias("k"))
    n_pass = probe.filter(might_contain(F.col("k"), bloom)).count()
    fpr = (1 - math.exp(-K_HASHES * 500 / M_BITS)) ** K_HASHES
    assert n_pass <= max(5, 10 * fpr * 2000)


def test_plan_has_prefilter_below_semi_join(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["bloom_urgent_order_events"](
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "md5" in plan  # the bloom probe predicate survives into the plan
    assert "CartesianProduct" not in plan
    # the probe predicate must sit in a Filter, not inside the join keys
    assert "Filter" in plan
