"""The four ``GET /recs`` strategies (``app/main.py:49-123``) as Catalyst
join chains, plus the driver-side try-then-fallback control flow (SURVEY.md
§3.1 step 4).

Core functions operate on normalized relation views so the same logic runs
over the driver corpus (lineitem/orders/part) and the reference-shape seed
fixture (order_items/orders/products):

- ``items(order_id, product_id)``      — raw CONTAINS candidates (dups OK)
- ``placed(order_id, customer_id)``    — PLACED edges
- ``products(product_id, category_id)``— product→category dimension

Cypher semantics reproduced exactly (verified against ``app/main.py``):

- CONTAINS is MERGE-deduped per (order, product) (``app/etl.py:243``), so
  co-occurrence counts *distinct pairs*, not raw line items — dedup happens
  here AFTER seed-driven narrowing (same result, no full-table shuffle).
- The customer query (``app/main.py:90-92``) is two MATCH clauses; Cypher
  relationship-uniqueness applies per clause, so the only implicit
  constraint is ``other ≠ p`` inside the second MATCH — path counts
  accumulate across (o1, p, o2) triples (SURVEY §2 D1: do NOT dedup before
  counting).
- ``WHERE NOT (c)-[:PLACED]->(:Order)-[:CONTAINS]->(other)`` is a left-anti
  join against the customer's purchased set (C5).
- Every LIMIT carries a deterministic total order (score DESC, product_id
  ASC) — a documented tightening of Neo4j's unspecified tie order
  (SURVEY §7 risk register).

Scale notes: all seed-derived sides (orders of one product, one customer's
orders / purchased set) are tiny → explicitly broadcast; the only big-big
joins are items⋈items restricted by those broadcasts. Seed equality filters
push down to the parquet scan. Top-k compiles to TakeOrderedAndProject (no
full sort). Degree skew (a hyper-popular product) is absorbed by AQE skew
splitting on the shuffled legs.
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import read_table

TOP_K = 10  # LIMIT 10 everywhere in the reference (app/main.py:57,77,95,116)

# Deterministic default seeds for the oracle-checked corpus queries; both
# exist at every scale factor (keys are 1-based dense).
DEFAULT_PART = 1
DEFAULT_CUSTOMER = 1


# --- core logic over normalized views ----------------------------------------


def _dedup_pairs(df: DataFrame) -> DataFrame:
    return df.select("order_id", "product_id").distinct()


def product_cooccurrence_core(items: DataFrame, seed_product) -> DataFrame:
    """C1+B3+D1+F1 (app/main.py:51-60): basket co-occurrence for one product.

    ``(p {id:$pid})<-[:CONTAINS]-(o)-[:CONTAINS]->(other) WHERE other<>p
    RETURN other.id, count(*) AS score ORDER BY score DESC LIMIT 10``
    """
    seed_orders = (
        items.filter(F.col("product_id") == seed_product)
        .select("order_id")
        .distinct()
    )
    cand = _dedup_pairs(items.join(F.broadcast(seed_orders), "order_id"))
    return (
        cand.filter(F.col("product_id") != seed_product)
        .groupBy("product_id")
        .agg(F.count(F.lit(1)).cast("double").alias("score"))
        .select("product_id", "score", F.lit("co-occurrence").alias("reason"))
        .orderBy(F.desc("score"), F.asc("product_id"))
        .limit(TOP_K)
    )


def product_same_brand_core(products: DataFrame, seed_product) -> DataFrame:
    """C2 fallback (app/main.py:72-84): products sharing the seed's category,
    constant score 1.0, reason "same-category"."""
    seed_cat = (
        products.filter(F.col("product_id") == seed_product)
        .select("category_id")
        .distinct()
    )
    return (
        products.join(F.broadcast(seed_cat), "category_id")
        .filter(F.col("product_id") != seed_product)
        .select(
            "product_id",
            F.lit(1.0).alias("score"),
            F.lit("same-category").alias("reason"),
        )
        .orderBy(F.asc("product_id"))
        .limit(TOP_K)
    )


def purchased_products_core(items: DataFrame, placed: DataFrame, seed_customer) -> DataFrame:
    """C3 (app/main.py:90): distinct products the customer has purchased."""
    my_orders = (
        placed.filter(F.col("customer_id") == seed_customer)
        .select("order_id")
        .distinct()
    )
    return (
        _dedup_pairs(items.join(F.broadcast(my_orders), "order_id"))
        .select("product_id")
        .distinct()
    )


def customer_cooccurrence_core(
    items: DataFrame, placed: DataFrame, seed_customer
) -> DataFrame:
    """C3+C4+C5+D1+F1 (app/main.py:88-98): products co-occurring with the
    customer's purchases, excluding already-purchased, path-count scored.

    Path = (o1, p, o2, other) with placed(c,o1), contains(o1,p),
    contains(o2,p), contains(o2,other), other≠p, other ∉ purchased(c);
    score(other) = number of such paths (no dedup before counting — D1).
    """
    my_orders = (
        placed.filter(F.col("customer_id") == seed_customer)
        .select("order_id")
        .distinct()
    )
    # c1: (o1, p) — the customer's purchase pairs (MERGE-deduped CONTAINS).
    c1 = _dedup_pairs(items.join(F.broadcast(my_orders), "order_id"))
    purchased = c1.select("product_id").distinct()
    # c2: (o2, p) — all orders containing a purchased product.
    c2 = _dedup_pairs(items.join(F.broadcast(purchased), "product_id"))
    # c3: (o2, other) — full contents of those orders. The o2 set can be
    # large for heavy customers: join it un-hinted and let AQE choose.
    o2 = c2.select("order_id").distinct()
    c3 = _dedup_pairs(items.join(o2, "order_id"))
    paths = (
        c1.alias("a")
        .join(c2.alias("b"), F.col("a.product_id") == F.col("b.product_id"))
        .join(c3.alias("c"), F.col("b.order_id") == F.col("c.order_id"))
        # r3 ≠ r4 within MATCH 2 → other ≠ p (per-clause rel-uniqueness).
        .filter(F.col("c.product_id") != F.col("a.product_id"))
        .select(F.col("c.product_id").alias("product_id"))
    )
    return (
        paths.join(F.broadcast(purchased), "product_id", "left_anti")  # C5
        .groupBy("product_id")
        .agg(F.count(F.lit(1)).cast("double").alias("score"))
        .select("product_id", "score", F.lit("co-occurrence").alias("reason"))
        .orderBy(F.desc("score"), F.asc("product_id"))
        .limit(TOP_K)
    )


def customer_brand_fallback_core(
    items: DataFrame, placed: DataFrame, products: DataFrame, seed_customer
) -> DataFrame:
    """C6+C5+D2+F2 (app/main.py:110-119): categories of the customer's
    purchases → all products in them → minus purchased → DISTINCT, LIMIT 10
    (deterministically lowest product ids)."""
    purchased = purchased_products_core(items, placed, seed_customer)
    cats = (
        products.join(F.broadcast(purchased), "product_id")
        .select("category_id")
        .distinct()
    )
    return (
        products.join(F.broadcast(cats), "category_id")
        .join(F.broadcast(purchased), "product_id", "left_anti")
        .select("product_id")
        .distinct()
        .orderBy(F.asc("product_id"))
        .limit(TOP_K)
        .select(
            "product_id",
            F.lit(1.0).alias("score"),
            F.lit("same-category").alias("reason"),
        )
    )


# --- corpus views (FIXTURES.md mapping) ---------------------------------------
#
# Session-scoped materialized adjacency views: every /recs strategy starts
# from the same 2-column projections, so they persist once per (application,
# sf_dir) — the in-session analogue of the bucketed adjacency tables a
# production deployment would maintain on the lake (see sources/sinks.py).

_VIEW_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _cached_view(spark: SparkSession, sf_dir: str, name: str, build) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"), name)
    df = _VIEW_CACHE.get(key)
    if df is None:
        df = build().persist()
        _VIEW_CACHE[key] = df
    return df


def _items(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cached_view(
        spark,
        sf_dir,
        "items",
        lambda: read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"]).select(
            F.col("l_orderkey").alias("order_id"), F.col("l_partkey").alias("product_id")
        ),
    )


def _placed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cached_view(
        spark,
        sf_dir,
        "placed",
        lambda: read_table(spark, sf_dir, "orders", ["o_orderkey", "o_custkey"]).select(
            F.col("o_orderkey").alias("order_id"), F.col("o_custkey").alias("customer_id")
        ),
    )


def _products(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cached_view(
        spark,
        sf_dir,
        "products",
        lambda: read_table(spark, sf_dir, "part", ["p_partkey", "p_brand"]).select(
            F.col("p_partkey").alias("product_id"), F.col("p_brand").alias("category_id")
        ),
    )


def product_cooccurrence(
    spark: SparkSession, sf_dir: str, part_key: int = DEFAULT_PART
) -> DataFrame:
    return product_cooccurrence_core(_items(spark, sf_dir), part_key)


def product_same_brand(
    spark: SparkSession, sf_dir: str, part_key: int = DEFAULT_PART
) -> DataFrame:
    return product_same_brand_core(_products(spark, sf_dir), part_key)


def customer_cooccurrence(
    spark: SparkSession, sf_dir: str, cust_key: int = DEFAULT_CUSTOMER
) -> DataFrame:
    return customer_cooccurrence_core(
        _items(spark, sf_dir), _placed(spark, sf_dir), cust_key
    )


def customer_brand_fallback(
    spark: SparkSession, sf_dir: str, cust_key: int = DEFAULT_CUSTOMER
) -> DataFrame:
    return customer_brand_fallback_core(
        _items(spark, sf_dir),
        _placed(spark, sf_dir),
        _products(spark, sf_dir),
        cust_key,
    )


def purchased_products(
    spark: SparkSession, sf_dir: str, cust_key: int = DEFAULT_CUSTOMER
) -> DataFrame:
    return purchased_products_core(
        _items(spark, sf_dir), _placed(spark, sf_dir), cust_key
    ).orderBy("product_id")


# --- the API surface (app/main.py:23-135) ------------------------------------


def recommend(
    spark: SparkSession,
    sf_dir: str,
    product_id: int | None = None,
    customer_id: int | None = None,
    source: str = "batch",
) -> dict[str, Any]:
    """``GET /recs`` semantics end-to-end (SURVEY §3.1-3.2).

    Sequential try-then-fallback in driver code (primary top-k is ≤10 rows,
    so probing it is one cheap action), ``product_id`` precedence when both
    are passed (``if/elif``, app/main.py:49,86), neither → empty items,
    catch-all → empty items (app/main.py:125-127), ``took_ms`` wall-clock
    (app/main.py:35,134).

    ``source="ivm"`` answers the product co-occurrence step from the
    INCREMENTALLY MAINTAINED view (streaming/ivm.py) instead of the lake
    recompute — the serving-reads-maintained-state architecture the
    reference's roadmap implies ("make the ETL run automatically",
    README:5). Fallback steps are source-independent (they read dimension
    tables, not the pair view).
    """
    if source not in ("batch", "ivm"):
        raise ValueError(f"recommend source must be 'batch' or 'ivm', got {source!r}")
    started = time.time()
    items: list[dict[str, Any]] = []
    try:
        if product_id is not None:
            if source == "ivm":
                from ..streaming.ivm import ivm_served_recs_product

                rows = ivm_served_recs_product(spark, sf_dir, product_id).collect()
            else:
                rows = product_cooccurrence(spark, sf_dir, product_id).collect()
            if not rows:
                rows = product_same_brand(spark, sf_dir, product_id).collect()
        elif customer_id is not None:
            rows = customer_cooccurrence(spark, sf_dir, customer_id).collect()
            if not rows:
                rows = customer_brand_fallback(spark, sf_dir, customer_id).collect()
        else:
            rows = []
        items = [
            {
                "product_id": r["product_id"],
                "score": float(r["score"]),
                "reason": r["reason"],
            }
            for r in rows
        ]
    except Exception:
        items = []  # graceful degradation, app/main.py:125-127
    took_ms = int((time.time() - started) * 1000)
    return {"items": items, "took_ms": took_ms}


def top_cooccurrence_pairs(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """The un-seeded generalization of C1: global basket co-occurrence —
    top-k product pairs by number of shared orders. This is the scale-hard
    shape (the CONTAINS self-join with no seed anchor): the join shuffles
    on the order key, hot orders are the skew risk, and the pair space is
    bounded by per-order basket sizes, not |products|².

    Skew posture: AQE skew-join splitting — PROVEN to engage on this exact
    join shape by ``tests/test_skew.py`` (hot-key fixture, plan assertion).
    ``salted_join`` does not apply here (both sides of a self-join are big;
    it replicates the small side). Note the aggregation keys (product_a,
    product_b) differ from the join key, which is what makes the split free
    for AQE — an order_id-keyed consumer would veto it (see test docstring).

    Lake path: the adjacency comes from the bucketed ``lake_items`` table
    (graphdb_td2_spark/lake.py), so the self-join is exchange-free — the
    one remaining shuffle is the pair aggregation (pinned in
    tests/test_plans.py).
    """
    from ..lake import items_bucketed

    items = items_bucketed(spark, sf_dir)
    a, b = items.alias("a"), items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.order_id") == F.col("b.order_id"))
            & (F.col("a.product_id") < F.col("b.product_id")),
        )
        .groupBy(
            F.col("a.product_id").alias("product_a"),
            F.col("b.product_id").alias("product_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("product_a"), F.asc("product_b"))
        .limit(k)
    )


def top_lift_pairs(
    spark: SparkSession, sf_dir: str, k: int = 20, min_support: int = 2
) -> DataFrame:
    """Lift-scored co-occurrence: ``lift = P(a,b) / (P(a)·P(b))`` over
    baskets — the normalization that stops globally-popular products from
    dominating pair rankings (raw counts reward popularity, lift rewards
    association). ``min_support`` discards noise pairs.

    Determinism: lift is computed as ONE double expression over exact
    integer counts — ``(n_ab · n_baskets) / (n_a · n_b)`` with the same
    parenthesization in the DuckDB oracle, so the IEEE ops match 1:1.
    Scale: reuses the pair self-join shape of ``top_cooccurrence_pairs``
    (AQE skew posture proven in tests/test_skew.py); the per-product
    counts and the 1-row basket total are broadcast joins.
    """
    items = _dedup_pairs(_items(spark, sf_dir))
    n_baskets = items.select("order_id").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    per_prod = items.groupBy("product_id").agg(F.count(F.lit(1)).alias("n_p"))
    a, b = items.alias("a"), items.alias("b")
    pair_counts = (
        a.join(
            b,
            (F.col("a.order_id") == F.col("b.order_id"))
            & (F.col("a.product_id") < F.col("b.product_id")),
        )
        .groupBy(
            F.col("a.product_id").alias("product_a"),
            F.col("b.product_id").alias("product_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    na = per_prod.select(F.col("product_id").alias("product_a"), F.col("n_p").alias("n_a"))
    nb = per_prod.select(F.col("product_id").alias("product_b"), F.col("n_p").alias("n_b"))
    # na/nb are |product|-sized: no broadcast hint — at 100x the part
    # dimension a forced broadcast is an executor-memory risk; AQE picks
    # broadcast on its own whenever the side actually fits.
    return (
        pair_counts.join(na, "product_a")
        .join(nb, "product_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "product_a",
            "product_b",
            "n_ab",
            (
                (F.col("n_ab").cast("double") * F.col("n_baskets").cast("double"))
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("product_a"), F.asc("product_b"))
        .limit(k)
    )
