"""Time-decayed product popularity — the "trending now" ranking every
recommender serves alongside co-occurrence: recent purchases count more,
with exponential half-life decay.

Reference parity: ranks the same CONTAINS relation the reference's
``/recs`` co-occurrence strategy traverses (`app/main.py:51-60`), by
recency-weighted volume instead of basket overlap.

Exactness: a float ``2^(-age/h)`` is engine- and order-dependent, so the
decay is bucketed — ``k = age_days div HALFLIFE_DAYS`` half-lives, and
the weight is the exact integer ``2^(KMAX - min(k, KMAX))``: a purchase
this half-life scores 2× one from the previous, magnitudes bounded by
``2^KMAX``, and the score sum is an order-independent BIGINT.

Scale notes: the reference date is a 1-row broadcast (the scalar-
subquery pattern of ``top_price_orders``); the fact join
orders⋈lineitem shuffles on the order key (at 100 TB both are bucketed
on it); scoring is a narrow projection and one partial-aggregated
groupBy(product); top-k compiles to TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import read_table

HALFLIFE_DAYS = 30
KMAX = 20
TOP_K = 20


def decayed_product_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(product_id, score_fp, n_purchases)`` — top-20
    products by half-life-decayed purchase count (``score_fp`` in
    ``2^KMAX``-per-current-purchase units; ties → lowest product_id)."""
    orders = read_table(spark, sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    items = read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    ref = orders.agg(F.max("o_orderdate").alias("ref_date"))
    aged = (
        items.join(orders, items["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(ref))
        .select(
            F.col("l_partkey").alias("product_id"),
            F.datediff(F.col("ref_date"), F.col("o_orderdate")).alias("age_days"),
        )
    )
    weight = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST({KMAX} - "
        f"least(CAST(age_days AS BIGINT) div {HALFLIFE_DAYS}, {KMAX}) AS INT))"
    ).cast("long")
    return (
        aged.select("product_id", weight.alias("w"))
        .groupBy("product_id")
        .agg(
            F.sum("w").cast("long").alias("score_fp"),
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
        )
        .orderBy(F.desc("score_fp"), F.asc("product_id"))
        .limit(TOP_K)
    )


def abc_product_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(abc_class, n_products, revenue_cents)`` — Pareto
    / ABC inventory classification of products by revenue: class A holds
    products whose running cumulative revenue share (revenue-descending
    order) stays within 80%, B within 95%, C the tail. Ordered by class.

    Determinism: revenues are exact DECIMAL→BIGINT cents; the class
    boundary test is the integer inequality ``cum·100 ≤ total·{80,95}``
    (no float shares), over the total order (revenue DESC, p_partkey).

    Scale notes: the heavy part is the revenue rollup (fact-scan hash
    agg, map-side partials); the running sum's global window ranges over
    the PRODUCT dimension only — |part| rows, the same bounded-axis
    argument as the day-spine operators. Output is 3 rows.
    """
    from ..operators.prefix import bucketed_cumsum

    items = read_table(spark, sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])
    rev = (
        items.select(
            "l_partkey",
            F.col("l_extendedprice").cast("decimal(14,2)").alias("p"),
        )
        .groupBy("l_partkey")
        .agg((F.sum("p") * 100).cast("long").alias("cents"))
    )
    tot = rev.agg(F.sum("cents").cast("long").alias("total"))
    # Two-phase prefix sum over (cents DESC, partkey): $10k revenue
    # buckets are monotone non-increasing along the descending cents
    # order, and cent-ties share a bucket, so the Pareto running sum
    # never funnels through one partition (operators/prefix.py).
    classed = (
        bucketed_cumsum(
            rev,
            bucket=F.floor(F.col("cents") / 1_000_000),
            order=[F.desc("cents"), F.asc("l_partkey")],
            sums={"cum": "cents"},
            bucket_desc=True,
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.when(F.col("cum") * 100 <= F.col("total") * 80, F.lit("A"))
            .when(F.col("cum") * 100 <= F.col("total") * 95, F.lit("B"))
            .otherwise(F.lit("C"))
            .alias("abc_class"),
            "cents",
        )
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_products"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .orderBy("abc_class")
    )


def weekly_product_movers(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Registry entry: ``(l_partkey, prev_week_items, last_week_items,
    growth)`` — the ``k`` products with the largest absolute item-count
    change between the corpus's LAST full week and the week before — the
    "movers" screen a merchandising dashboard leads with. Ties break on
    partkey; growth is an exact integer difference.

    Deterministic week anchoring: weeks are UTC-Monday buckets; the
    "last" week is the maximum COMPLETE week (max ship-date week is
    excluded if the corpus ends mid-week — computed from the max date's
    own truncation, no wall-clock). Scale: one (product, week) rollup,
    a 1-row anchor broadcast, and a two-week self-alignment via
    conditional aggregation (no join).
    """
    items = read_table(spark, sf_dir, "lineitem", ["l_partkey", "l_shipdate"])
    weekly = items.select(
        "l_partkey", F.date_trunc("week", "l_shipdate").alias("week")
    )
    anchor = weekly.agg(
        F.date_trunc("week", F.max(F.col("week")) - F.expr("INTERVAL 7 DAY")).alias(
            "last_full"
        )
    )
    tagged = weekly.crossJoin(F.broadcast(anchor)).select(
        "l_partkey",
        F.when(F.col("week") == F.col("last_full"), F.lit(1))
        .when(
            F.col("week") == F.col("last_full") - F.expr("INTERVAL 7 DAY"), F.lit(0)
        )
        .alias("bucket"),
    ).filter(F.col("bucket").isNotNull())
    counts = tagged.groupBy("l_partkey").agg(
        F.sum(F.when(F.col("bucket") == 0, 1).otherwise(0))
        .cast("long")
        .alias("prev_week_items"),
        F.sum(F.when(F.col("bucket") == 1, 1).otherwise(0))
        .cast("long")
        .alias("last_week_items"),
    )
    return (
        counts.select(
            "l_partkey",
            "prev_week_items",
            "last_week_items",
            (F.col("last_week_items") - F.col("prev_week_items"))
            .cast("long")
            .alias("growth"),
        )
        .orderBy(F.desc(F.abs(F.col("growth"))), F.asc("l_partkey"))
        .limit(k)
    )
