"""Offline recommendation backtest [extension] — the evaluation harness
the reference's ``/recs`` endpoint has no counterpart for: split orders
at a time cutoff, train the co-occurrence model on the PAST only, and
measure hit-rate@k against what customers actually bought NEXT.

This is the measurement that turns the recs tier from "runs" into
"works": the reference (``app/main.py:49-127``) ships scores with no way
to know whether they predict anything. The protocol is the standard
leave-future-out split:

- cutoff = min order date + 4/5 of the corpus date span (exact integer
  day arithmetic — deterministic, corpus-derived, no RNG);
- TRAIN: co-occurrence edges (support ≥ 2, the same
  ``graph/triangles.py:cooccurrence_edges`` relation the production
  scorers use) built from orders at or before the cutoff;
- score: for every customer, candidate products adjacent to their train
  basket, summed edge weight, own train products anti-joined out — the
  set-based C1/C4 chain of ``recs/batch.py`` — keep top k = 10 per
  customer ((score DESC, product ASC) row_number);
- TEST: the customer's post-cutoff purchases of products NOT in their
  train basket (repeat buys are excluded by the same anti-join the
  recommender applies, so the target set is exactly what the model is
  allowed to predict);
- hit-rate@10 = evaluated customers (≥1 test purchase AND ≥1 rec) whose
  rec list intersects their test purchases, over evaluated customers.

Exactness: pure counts plus ONE 1e6 fixed-point ratio with truncating
integer division — the DuckDB oracle reproduces the row bit-for-bit.

Scale notes: identical join topology to the production batch scorer
(customer → basket → bounded-degree edge table; never customer-pair CF),
plus one date-filtered pass for the test set. The per-customer top-10 is
a partitioned window over candidate rows, not a global sort. Output is
one row.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..graph.triangles import cooccurrence_edges
from ..io import read_table

BACKTEST_K = 10
TRAIN_FRACTION_NUM, TRAIN_FRACTION_DEN = 4, 5
HR_FP = 1_000_000


def backtest_cutoff(spark: SparkSession, sf_dir: str) -> datetime.date:
    """min + (span·4 div 5) days — exact integer day arithmetic."""
    orders = read_table(spark, sf_dir, "orders", ["o_orderdate"])
    mn, mx = orders.agg(
        F.min(F.to_date("o_orderdate")), F.max(F.to_date("o_orderdate"))
    ).first()
    span = (mx - mn).days
    return mn + datetime.timedelta(
        days=span * TRAIN_FRACTION_NUM // TRAIN_FRACTION_DEN
    )


def recs_backtest_hitrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry (1 row): ``(n_train_orders, n_test_orders,
    n_eval_customers, n_hit_customers, hit_rate_fp)``."""
    cutoff = backtest_cutoff(spark, sf_dir)
    orders = read_table(spark, sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    lineitem = read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    odate = F.to_date("o_orderdate")
    train_orders = orders.filter(odate <= F.lit(cutoff))
    test_orders = orders.filter(odate > F.lit(cutoff))

    def owned_of(o: DataFrame) -> DataFrame:
        return (
            lineitem.join(o, lineitem["l_orderkey"] == o["o_orderkey"])
            .select(
                F.col("o_custkey").alias("customer_id"),
                F.col("l_partkey").alias("product_id"),
            )
            .distinct()
        )

    train_owned = owned_of(train_orders).persist()
    train_li = lineitem.join(
        train_orders.select("o_orderkey"),
        lineitem["l_orderkey"] == train_orders["o_orderkey"],
        "left_semi",
    )
    edges = cooccurrence_edges(train_li)
    und = edges.select("pa", "pb", "weight").unionByName(
        edges.select(F.col("pb").alias("pa"), F.col("pa").alias("pb"), "weight")
    )
    cand = (
        train_owned.join(und, train_owned["product_id"] == und["pa"])
        .select("customer_id", F.col("pb").alias("rec"), "weight")
        .groupBy("customer_id", "rec")
        .agg(F.sum("weight").cast("long").alias("score"))
        .join(
            train_owned.select("customer_id", F.col("product_id").alias("rec")),
            ["customer_id", "rec"],
            "left_anti",
        )
    )
    w = Window.partitionBy("customer_id").orderBy(F.desc("score"), F.asc("rec"))
    recs = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BACKTEST_K)
        .select("customer_id", "rec")
    )

    test_new = owned_of(test_orders).join(
        train_owned, ["customer_id", "product_id"], "left_anti"
    )

    eval_customers = (
        test_new.select("customer_id")
        .distinct()
        .join(recs.select("customer_id").distinct(), "customer_id", "left_semi")
    )
    hit_customers = recs.join(
        test_new,
        (recs["customer_id"] == test_new["customer_id"])
        & (recs["rec"] == test_new["product_id"]),
        "left_semi",
    ).select("customer_id").distinct()

    counts = (
        train_orders.agg(F.count(F.lit(1)).cast("long").alias("n_train_orders"))
        .crossJoin(
            test_orders.agg(F.count(F.lit(1)).cast("long").alias("n_test_orders"))
        )
        .crossJoin(
            eval_customers.agg(
                F.count(F.lit(1)).cast("long").alias("n_eval_customers")
            )
        )
        .crossJoin(
            hit_customers.agg(
                F.count(F.lit(1)).cast("long").alias("n_hit_customers")
            )
        )
    )
    return counts.select(
        "n_train_orders",
        "n_test_orders",
        "n_eval_customers",
        "n_hit_customers",
        F.expr(
            f"case when n_eval_customers > 0 then"
            f" (n_hit_customers * {HR_FP}) div n_eval_customers end"
        ).alias("hit_rate_fp"),
    )
