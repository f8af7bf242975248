"""Frequent-itemset mining (a-priori) over order baskets — the market-
basket generalization of the pairwise co-occurrence tier: which product
TRIPLES recur across orders. The downward-closure prune (a triple can
only be frequent if all three of its pairs are) is what makes the
candidate space tractable — the defining idea of Agrawal & Srikant's
A-Priori (VLDB 1994).

Plan shape: basket pairs (the same AQE-skew-handled self-join as
``top_cooccurrence_pairs``) → frequent-pair support filter → candidate
triples from two frequent pairs sharing their lowest item, pruned by a
LEFT SEMI on the third pair (downward closure BEFORE any 3-way join) →
exact support count via one more basket equi-join. All shuffles key on
order/product ids; the candidate relation is support-pruned at every
stage, so the 3-way explosion never materializes.

Output is exact integer support, top-20 by (support, ids) — fully
deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import read_table

MIN_SUPPORT = 2
TOP_K = 20


def _baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
        .select(
            F.col("l_orderkey").alias("order_id"),
            F.col("l_partkey").alias("item"),
        )
        .distinct()
    )


def frequent_triples(
    spark: SparkSession,
    sf_dir: str,
    min_support: int = MIN_SUPPORT,
    k: int = TOP_K,
) -> DataFrame:
    """Registry entry: ``(item_a, item_b, item_c, support)`` — the top-k
    most frequent product triples (a < b < c) with support ≥
    ``min_support``, ordered by (support desc, a, b, c)."""
    baskets = _baskets(spark, sf_dir).persist()
    b2 = baskets.select("order_id", F.col("item").alias("item_b"))
    pairs = (
        baskets.join(b2, "order_id")
        .filter(F.col("item") < F.col("item_b"))
        .groupBy(F.col("item").alias("pa"), F.col("item_b").alias("pb"))
        .agg(F.count(F.lit(1)).cast("long").alias("pair_support"))
        .filter(F.col("pair_support") >= min_support)
        .select("pa", "pb")
        .persist()
    )
    # candidates (a, b, c): (a,b) and (a,c) frequent with b < c ...
    cand = (
        pairs.join(
            pairs.select(F.col("pa"), F.col("pb").alias("pc")), "pa"
        )
        .filter(F.col("pb") < F.col("pc"))
        # ... and downward closure: (b, c) must be frequent too
        .join(
            pairs.select(F.col("pa").alias("pb"), F.col("pb").alias("pc")),
            ["pb", "pc"],
            "left_semi",
        )
        .select(
            F.col("pa").alias("item_a"),
            F.col("pb").alias("item_b"),
            F.col("pc").alias("item_c"),
        )
    )
    # exact support: orders containing all three (two basket joins against
    # the pruned candidate set)
    support = (
        baskets.select("order_id", F.col("item").alias("item_a"))
        .join(F.broadcast(cand), "item_a")
        .join(
            baskets.select("order_id", F.col("item").alias("item_b")),
            ["order_id", "item_b"],
        )
        .join(
            baskets.select("order_id", F.col("item").alias("item_c")),
            ["order_id", "item_c"],
        )
        .groupBy("item_a", "item_b", "item_c")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .filter(F.col("support") >= min_support)
    )
    return (
        support.orderBy(
            F.desc("support"), F.asc("item_a"), F.asc("item_b"), F.asc("item_c")
        )
        .limit(k)
        .select("item_a", "item_b", "item_c", "support")
    )


def order_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(n_items, n_orders)`` — basket-size
    distribution (distinct products per order), the sanity histogram the
    whole basket-analysis tier (pairs, triples, lift) is calibrated
    against. Ordered by n_items.

    Scale: two stacked partial-agged hash aggs; output bounded by the
    largest basket."""
    items = read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    sizes = (
        items.select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_items"))
    )
    return (
        sizes.groupBy("n_items")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .orderBy("n_items")
    )


REPURCHASE_MIN_GAPS = 2


def repurchase_cycle_topk(
    spark: SparkSession, sf_dir: str, k: int = 20, min_gaps: int = REPURCHASE_MIN_GAPS
) -> DataFrame:
    """Registry entry: ``(l_partkey, n_gaps, p50_gap_days)`` — the ``k``
    products with the SHORTEST median repurchase interval (per-customer
    consecutive purchase-date gaps), the consumables/replenishment
    detector. Ties break on partkey; products with < ``min_gaps``
    observed gaps are excluded.

    Determinism: gaps are exact integer day deltas under the total
    (customer, product, date) order; the median is the parity-pinned
    percentile; top-k carries (p50 ASC, partkey ASC).

    Scale: one (customer, product)-keyed window over the joined facts
    (the same user-style partitioning as the window family), one
    product rollup, TakeOrderedAndProject.
    """
    from pyspark.sql import Window

    items = read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    orders = read_table(spark, sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    dated = (
        items.join(orders, items["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("o_custkey").alias("c"),
            F.col("l_partkey").alias("p"),
            F.date_trunc("day", "o_orderdate").alias("d"),
        )
        .distinct()
    )
    w = Window.partitionBy("c", "p").orderBy("d")
    gaps = dated.select(
        "p", F.datediff(F.col("d"), F.lag("d").over(w)).cast("long").alias("gap")
    ).filter(F.col("gap").isNotNull())
    from ..operators.percentiles import as_value, percentile_numerators

    pf = percentile_numerators(gaps, ["p"], "gap", [(1, 2, "p50n")])
    return (
        pf.filter(F.col("n") >= min_gaps)
        .select(
            F.col("p").alias("l_partkey"),
            F.col("n").alias("n_gaps"),
            as_value(F.col("p50n"), 2).alias("p50_gap_days"),
        )
        .orderBy(F.asc("p50_gap_days"), F.asc("l_partkey"))
        .limit(k)
    )


RULE_MIN_SUPPORT = 3
RULE_TOP_K = 20


def top_confidence_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(antecedent, consequent, n_both, n_antecedent,
    confidence)`` — the top DIRECTED association rules X→Y by confidence
    ``P(Y|X) = n_XY / n_X`` with support ≥ RULE_MIN_SUPPORT [extension]:
    the classic market-basket rule mining output, the directed companion
    of the symmetric lift ranking (``recs/queries.py:top_lift_pairs``) —
    confidence is what a "customers who bought X also bought Y" widget
    actually thresholds on.

    Exactness: integer counts; confidence is one IEEE division; the
    top-k carries a (confidence DESC, antecedent, consequent) total
    order and compiles to TakeOrderedAndProject. Scale notes: basket
    pairs come from the same bucketed co-occurrence shape as the lift
    query (pair space bounded by basket sizes, support filter applied
    before ranking); per-product counts broadcast onto the pair rows.
    """
    from ..graph.build import contains_pairs
    from ..io import read_table as _rt

    lineitem = _rt(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    pairs = contains_pairs(lineitem)
    a, b = pairs.alias("a"), pairs.alias("b")
    both = (
        a.join(
            b,
            (F.col("a.order_id") == F.col("b.order_id"))
            & (F.col("a.product_id") != F.col("b.product_id")),
        )
        .groupBy(
            F.col("a.product_id").alias("antecedent"),
            F.col("b.product_id").alias("consequent"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
        .filter(F.col("n_both") >= RULE_MIN_SUPPORT)
    )
    per_prod = pairs.groupBy(F.col("product_id").alias("antecedent")).agg(
        F.count(F.lit(1)).cast("long").alias("n_antecedent")
    )
    return (
        both.join(per_prod, "antecedent")
        .select(
            "antecedent",
            "consequent",
            "n_both",
            "n_antecedent",
            (
                F.col("n_both").cast("double") / F.col("n_antecedent").cast("double")
            ).alias("confidence"),
        )
        .orderBy(
            F.desc("confidence"), F.asc("antecedent"), F.asc("consequent")
        )
        .limit(RULE_TOP_K)
    )
