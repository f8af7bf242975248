"""Corpus-wide batch recommendation scoring — the OFFLINE twin of the
reference's per-request ``/recs`` chain (`app/main.py:49-127`): score a
top-1 next product for EVERY customer in one job, with the same
try-then-fallback semantics expressed set-based (left joins + priority
coalesce) instead of imperative per-request probing.

Strategy chain, set-based:
1. **co-occurrence**: candidate products adjacent (in the
   support-thresholded co-occurrence edge table — the SAME materialized
   relation the triangle/k-truss tier uses) to anything the customer
   bought, scored by summed edge weight, own products anti-joined out;
2. **global fallback**: customers with no candidate (no purchases, or
   only edge-isolated products) get the global top seller they haven't
   bought — here the global top by distinct orders.

Why this scales where naive corpus-wide CF does not: scoring goes
customer → their products → EDGES (support ≥ 2, bounded degree), never
customer → shared-product → customer (whose pair count is Σ_p deg(p)² —
quadratic in hub degree). The edge table is the recommender's
precomputed model artifact; per-customer work is |basket| · bounded
edge degree.

Determinism: integer weights/counts, (score DESC, product ASC)
row_number, checksums as integer sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..graph.triangles import cooccurrence_edges
from ..io import read_table


def batch_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``(customer_id, product_id, strategy)`` — one recommendation per
    customer (every customer in the dimension, purchaser or not)."""
    lineitem = read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    orders = read_table(spark, sf_dir, "orders", ["o_orderkey", "o_custkey"])
    customers = read_table(spark, sf_dir, "customer", ["c_custkey"]).select(
        F.col("c_custkey").alias("customer_id")
    )
    owned = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("o_custkey").alias("customer_id"),
            F.col("l_partkey").alias("product_id"),
        )
        .distinct()
    )
    edges = cooccurrence_edges(lineitem)  # (pa < pb, weight), support ≥ 2
    und = edges.select("pa", "pb", "weight").unionByName(
        edges.select(
            F.col("pb").alias("pa"), F.col("pa").alias("pb"), "weight"
        )
    )
    cand = (
        owned.join(und, owned["product_id"] == und["pa"])
        .select("customer_id", F.col("pb").alias("rec"), "weight")
        .groupBy("customer_id", "rec")
        .agg(F.sum("weight").cast("long").alias("score"))
        .join(
            owned.select(
                "customer_id", F.col("product_id").alias("rec")
            ),
            ["customer_id", "rec"],
            "left_anti",
        )
    )
    w = Window.partitionBy("customer_id").orderBy(F.desc("score"), F.asc("rec"))
    top_cf = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("customer_id", F.col("rec").alias("cf_product"))
    )
    best_seller = (
        owned.groupBy("product_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_buyers"))
        .orderBy(F.desc("n_buyers"), F.asc("product_id"))
        .limit(1)
        .select(F.col("product_id").alias("global_product"))
    )
    return (
        customers.join(top_cf, "customer_id", "left")
        .crossJoin(F.broadcast(best_seller))
        .select(
            "customer_id",
            F.coalesce("cf_product", "global_product").alias("product_id"),
            F.when(F.col("cf_product").isNotNull(), F.lit("cooccurrence"))
            .otherwise(F.lit("global_fallback"))
            .alias("strategy"),
        )
    )


def batch_recommendations_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(strategy, n_customers, product_id_sum,
    n_distinct_products)`` — coverage accounting of the corpus-wide
    batch scorer (every customer gets exactly one recommendation; the
    id-sum checksum pins the SELECTION, not just counts). Ordered by
    strategy."""
    recs = batch_recommendations(spark, sf_dir)
    return (
        recs.groupBy("strategy")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("product_id").cast("long").alias("product_id_sum"),
            F.countDistinct("product_id").cast("long").alias("n_distinct_products"),
        )
        .orderBy("strategy")
    )
