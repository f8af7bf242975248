"""Link prediction over the customer-product bipartite graph
(SURVEY.md §2.L2 extension — the normalized variants of co-occurrence).

The reference's co-occurrence query (`app/main.py:96-117`) scores product
pairs by RAW shared-order counts; the standard link-prediction literature
(Liben-Nowell & Kleinberg 2003) normalizes by neighborhood size:

- **Jaccard**: |Γ(a) ∩ Γ(b)| / |Γ(a) ∪ Γ(b)| over customer neighbor sets
  — popularity-neutral similarity.
- **Resource allocation**: Σ_{c ∈ Γ(a) ∩ Γ(b)} 1/|Γ(c)| — shared niche
  customers are worth more than shared big-basket customers. (We use RA
  rather than Adamic-Adar because RA's 1/deg term is rational — it runs
  in exact integer fixed point, where AA's 1/log(deg) would drag a
  transcendental into the cross-engine hash.)

Cross-engine determinism: intersections/degrees are exact integers;
Jaccard is ONE IEEE division of integer-valued doubles; RA terms are
``1e9 div deg`` BIGINT integer divisions summed exactly — bit-identical
in Spark and DuckDB.

Scale notes: the pair generator is the same customer-keyed equi-self-join
shape as ``top_cooccurrence_pairs`` (AQE skew-split posture proven in
tests/test_skew.py — a hot customer key gets split at runtime); per-node
degrees are a small per-product aggregate joined via broadcast, and the
per-customer degree rides along the basket rows before the self-join so
RA needs no third join. Top-k is TakeOrderedAndProject — no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import read_table

RA_SCALE = 1_000_000_000  # fixed-point numerator for 1/degree


def _customer_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (customer, product) edges of the bipartite purchase graph
    (orders ⋈ lineitem, FK-resolved as in the reference's ETL)."""
    orders = read_table(spark, sf_dir, "orders", ["o_orderkey", "o_custkey"])
    items = read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    return (
        items.join(orders, items["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("o_custkey").alias("customer_id"),
            F.col("l_partkey").alias("product_id"),
        )
        .distinct()
    )


def product_jaccard_topk(
    spark: SparkSession, sf_dir: str, k: int = 20, min_inter: int = 2
) -> DataFrame:
    """Registry entry: top-k product pairs by Jaccard similarity of their
    customer sets — ``(product_a, product_b, n_common, jaccard)``,
    ties broken by (product_a, product_b)."""
    edges = _customer_products(spark, sf_dir)
    deg = edges.groupBy("product_id").agg(F.count(F.lit(1)).alias("deg"))
    a, b = edges.alias("a"), edges.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.customer_id") == F.col("b.customer_id"))
            & (F.col("a.product_id") < F.col("b.product_id")),
        )
        .groupBy(
            F.col("a.product_id").alias("product_a"),
            F.col("b.product_id").alias("product_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_inter)
    )
    da = deg.select(F.col("product_id").alias("product_a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("product_id").alias("product_b"), F.col("deg").alias("deg_b"))
    return (
        inter.join(F.broadcast(da), "product_a")
        .join(F.broadcast(db), "product_b")
        .select(
            "product_a",
            "product_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), F.asc("product_a"), F.asc("product_b"))
        .limit(k)
    )


def resource_allocation_topk(
    spark: SparkSession, sf_dir: str, k: int = 20, min_inter: int = 2
) -> DataFrame:
    """Registry entry: top-k product pairs by resource-allocation index
    — ``(product_a, product_b, n_common, ra_score)`` with
    ``ra_score = Σ floor(1e9 / customer_degree)`` (exact BIGINT fixed
    point), ties broken by (product_a, product_b)."""
    edges = _customer_products(spark, sf_dir)
    cdeg = edges.groupBy("customer_id").agg(F.count(F.lit(1)).alias("cdeg"))
    # The RA weight rides along each basket row (one extra join keyed the
    # same as the self-join) so pair aggregation needs no post-join lookup.
    weighted = edges.join(cdeg, "customer_id").select(
        "customer_id",
        "product_id",
        F.expr(f"{RA_SCALE} DIV cdeg").cast("long").alias("w"),
    )
    a, b = weighted.alias("a"), weighted.alias("b")
    return (
        a.join(
            b,
            (F.col("a.customer_id") == F.col("b.customer_id"))
            & (F.col("a.product_id") < F.col("b.product_id")),
        )
        .groupBy(
            F.col("a.product_id").alias("product_a"),
            F.col("b.product_id").alias("product_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum(F.col("a.w")).cast("long").alias("ra_score"),
        )
        .filter(F.col("n_common") >= min_inter)
        .orderBy(F.desc("ra_score"), F.asc("product_a"), F.asc("product_b"))
        .limit(k)
    )


def brand_cooccurrence_topk(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Registry entry: ``(brand_a, brand_b, n_orders)`` — top-k BRAND
    pairs by distinct orders containing both (the cross-shopping matrix
    a category manager reads; the product-level pair machinery rolled
    up to the dimension grain). Ties on the brand pair.

    Scale: items map to brands via the broadcast part dim BEFORE
    pairing, and per-order brand sets are distinct-collapsed first, so
    the self-join blowup is bounded by |brands-per-order|², not
    |items-per-order|².
    """
    items = read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    part = read_table(spark, sf_dir, "part", ["p_partkey", "p_brand"])
    ob = (
        items.join(F.broadcast(part), items["l_partkey"] == part["p_partkey"])
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("b"))
        .distinct()
    )
    x, y = ob.alias("x"), ob.alias("y")
    return (
        x.join(
            y,
            (F.col("x.o") == F.col("y.o")) & (F.col("x.b") < F.col("y.b")),
        )
        .groupBy(F.col("x.b").alias("brand_a"), F.col("y.b").alias("brand_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "brand_a", "brand_b")
        .limit(k)
    )
