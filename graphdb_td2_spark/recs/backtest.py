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


GLOBAL_CAND_K = 100  # explicit candidate cap for the global-list scorers
TREND_HALFLIFE_DAYS = 30
TREND_KMAX = 20
ALS_BT_ITERATIONS = 2


def _strategy_row(
    strategy: str,
    recs: DataFrame,
    test_new: DataFrame,
) -> DataFrame:
    """One scored row ``(strategy, n_eval_customers, n_hit_customers,
    hit_rate_fp)`` under the shared leave-future-out protocol."""
    eval_customers = (
        test_new.select("customer_id")
        .distinct()
        .join(recs.select("customer_id").distinct(), "customer_id", "left_semi")
    )
    hit_customers = (
        recs.join(
            test_new,
            (recs["customer_id"] == test_new["customer_id"])
            & (recs["rec"] == test_new["product_id"]),
            "left_semi",
        )
        .select("customer_id")
        .distinct()
    )
    return (
        eval_customers.agg(F.count(F.lit(1)).cast("long").alias("n_eval_customers"))
        .crossJoin(
            hit_customers.agg(
                F.count(F.lit(1)).cast("long").alias("n_hit_customers")
            )
        )
        .select(
            F.lit(strategy).alias("strategy"),
            "n_eval_customers",
            "n_hit_customers",
            F.expr(
                f"case when n_eval_customers > 0 then"
                f" (n_hit_customers * {HR_FP}) div n_eval_customers end"
            ).alias("hit_rate_fp"),
        )
    )


def _edge_weighted_recs(train_owned: DataFrame, edges: DataFrame) -> DataFrame:
    """Per-customer top-10 by summed adjacent edge weight, own products
    anti-joined out — the production C1/C4 chain (bounded-degree edge
    table, never customer-pair CF)."""
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
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BACKTEST_K)
        .select("customer_id", "rec")
    )


def _global_list_recs(train_owned: DataFrame, ranked: DataFrame) -> DataFrame:
    """Per-customer top-10 of a GLOBAL candidate list (columns
    ``product_id, grank`` with grank 1..GLOBAL_CAND_K) minus the
    customer's own products. The global list is a ≤100-row broadcast, so
    this is one map-side cross of the customer dimension against a tiny
    relation — no per-customer scoring pass at all."""
    custs = train_owned.select("customer_id").distinct()
    cand = (
        custs.crossJoin(
            F.broadcast(ranked.select(F.col("rec"), "grank"))
        ).join(
            train_owned.select("customer_id", F.col("product_id").alias("rec")),
            ["customer_id", "rec"],
            "left_anti",
        )
    )
    w = Window.partitionBy("customer_id").orderBy(F.asc("grank"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BACKTEST_K)
        .select("customer_id", "rec")
    )


def recs_backtest_by_strategy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry (5 rows, ordered by strategy): the leave-future-out
    hit-rate@10 of EVERY production scorer — ``(strategy,
    n_eval_customers, n_hit_customers, hit_rate_fp)`` — so a model change
    has measured accuracy consequences across the whole /recs surface
    (VERDICT r8 task 6), not just the co-occurrence path:

    - ``cooccurrence``: summed support-≥2 edge weights (the
      ``recs_backtest_hitrate`` scorer verbatim);
    - ``ivm_cooccurrence``: the IVM-served variant — the maintained view
      keeps UNCAPPED pair counts (support ≥ 1); scored batch-side here,
      legitimate because maintained-state ≡ batch is separately pinned
      (``ivm_served_recs_*`` share the batch oracles);
    - ``brand_fallback``: products sharing a brand with the customer's
      purchases, lowest-id-first (the C6/F2 deterministic-LIMIT chain);
    - ``trending``: half-life-decayed popularity (exact power-of-two
      bucket weights, anchored at the TRAIN max date) — global
      top-``GLOBAL_CAND_K`` list minus owned;
    - ``als``: rank-1 implicit ALS (``recs/als.py`` half-solves, all-ones
      deterministic init, 2 alternating rounds) on TRAIN ratings; the
      product-factor ranking's global top-``GLOBAL_CAND_K`` minus owned.

    The global-list scorers carry an EXPLICIT candidate cap
    (GLOBAL_CAND_K = 100, documented here, no silent truncation): their
    recommendation semantics is "best 10 of the global top-100 you don't
    already own".

    Exactness: every scorer is integer-arithmetic (edge counts,
    power-of-two decay buckets, fixed-point ALS factors) with
    (score DESC, product ASC) / (product ASC) tiebreaks, so the DuckDB
    oracle reproduces all five rows bit-for-bit.

    Scale notes: one shared train/test split and owned/test-new pass;
    the co-occurrence scorers reuse the bounded-degree edge topology;
    brand fallback is two broadcast dimension joins; trending/ALS reduce
    to a ≤100-row broadcast against the customer dimension. ALS adds
    2×2 vertex-sized half-solve aggregates.
    """
    from .als import _solve_half

    cutoff = backtest_cutoff(spark, sf_dir)
    orders = read_table(
        spark, sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    )
    lineitem = read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    part = read_table(spark, sf_dir, "part", ["p_partkey", "p_brand"])

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
    test_new = owned_of(test_orders).join(
        train_owned, ["customer_id", "product_id"], "left_anti"
    ).persist()
    train_li = lineitem.join(
        train_orders.select("o_orderkey"),
        lineitem["l_orderkey"] == train_orders["o_orderkey"],
        "left_semi",
    )

    rows = []

    # -- cooccurrence (support >= 2) and its IVM (support >= 1) variant --
    for name, min_w in (("cooccurrence", 2), ("ivm_cooccurrence", 1)):
        edges = cooccurrence_edges(train_li, min_weight=min_w)
        rows.append(
            _strategy_row(name, _edge_weighted_recs(train_owned, edges), test_new)
        )

    # -- brand fallback: lowest-id products of the customer's brands -----
    # Fan-out prune (r10, found by the sf1 disk monitor): the naive
    # (customer, brand) × all-brand-products join is QUADRATIC in scale
    # factor — products-per-brand grows with the corpus while the brand
    # domain stays fixed, so sf1 emitted ~1.2B candidate rows and filled
    # 77 GB of shuffle spill. The ranking is lowest-product-id-first, so
    # a product with ≥ n_owned_in_brand + K smaller-id brandmates can
    # NEVER reach the customer's top-K (at most n_owned of the smaller
    # ones are owned, leaving ≥ K better non-owned candidates in the
    # same brand). Keeping per (customer, brand) only the brand's lowest
    # (n_owned_in_brand + K) ids makes the candidate set
    # |owned| + K·|customer-brand pairs| — linear — with a provably
    # identical result (the oracle hash is unchanged at both scales).
    owned_in_brand = (
        train_owned.join(
            F.broadcast(part),
            train_owned["product_id"] == part["p_partkey"],
        )
        .groupBy("customer_id", "p_brand")
        .agg(F.count(F.lit(1)).cast("int").alias("n_owned_b"))
    )
    wbrand = Window.partitionBy("p_brand").orderBy(F.asc("p_partkey"))
    ranked_parts = part.select(
        "p_brand", "p_partkey", F.row_number().over(wbrand).alias("brank")
    )
    brand_cand = (
        owned_in_brand.join(F.broadcast(ranked_parts), "p_brand")
        .filter(F.col("brank") <= F.col("n_owned_b") + BACKTEST_K)
        .select("customer_id", F.col("p_partkey").alias("rec"))
        .join(
            train_owned.select("customer_id", F.col("product_id").alias("rec")),
            ["customer_id", "rec"],
            "left_anti",
        )
    )
    wb = Window.partitionBy("customer_id").orderBy(F.asc("rec"))
    brand_recs = (
        brand_cand.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") <= BACKTEST_K)
        .select("customer_id", "rec")
    )
    rows.append(_strategy_row("brand_fallback", brand_recs, test_new))

    # -- trending: train-anchored half-life decay, global top-100 --------
    ref = train_orders.agg(F.max(odate).alias("ref_date"))
    aged = (
        lineitem.join(
            train_orders.select("o_orderkey", odate.alias("d")),
            lineitem["l_orderkey"] == train_orders["o_orderkey"],
        )
        .select(F.col("l_partkey").alias("product_id"), "d")
        .crossJoin(F.broadcast(ref))
        .select(
            "product_id",
            F.expr(
                f"shiftleft(cast(1 as bigint), {TREND_KMAX} - cast(least("
                f"datediff(ref_date, d) div {TREND_HALFLIFE_DAYS},"
                f" {TREND_KMAX}) as int))"
            ).alias("wgt"),
        )
    )
    trend_scores = aged.groupBy("product_id").agg(
        F.sum("wgt").cast("long").alias("score")
    )
    # TakeOrderedAndProject first (distributed top-k), THEN rank the
    # ≤100 surviving rows — no corpus-sized single-partition window.
    wg = Window.orderBy(F.desc("score"), F.asc("product_id"))
    trend_top = (
        trend_scores.orderBy(F.desc("score"), F.asc("product_id"))
        .limit(GLOBAL_CAND_K)
        .withColumn("grank", F.row_number().over(wg))
        .select(F.col("product_id").alias("rec"), "grank")
    )
    rows.append(
        _strategy_row(
            "trending", _global_list_recs(train_owned, trend_top), test_new
        )
    )

    # -- als: rank-1 implicit factors on train ratings -------------------
    ratings = (
        lineitem.join(train_orders, lineitem["l_orderkey"] == train_orders["o_orderkey"])
        .select(
            F.col("o_custkey").alias("c"),
            F.col("l_partkey").alias("p"),
            F.col("o_orderkey").alias("o"),
        )
        .distinct()
        .groupBy("c", "p")
        .agg(F.count(F.lit(1)).cast("long").alias("r"))
        .persist()
    )
    from .als import ALS_SCALE

    v = ratings.select("p").distinct().select(
        "p", F.lit(ALS_SCALE).cast("long").alias("f")
    )
    for _ in range(ALS_BT_ITERATIONS):
        u = _solve_half(ratings, v, "c", "p")
        v = _solve_half(ratings, u, "p", "c")
    wa = Window.orderBy(F.desc("f"), F.asc("p"))
    als_top = (
        v.orderBy(F.desc("f"), F.asc("p"))
        .limit(GLOBAL_CAND_K)
        .withColumn("grank", F.row_number().over(wa))
        .select(F.col("p").alias("rec"), "grank")
    )
    rows.append(
        _strategy_row("als", _global_list_recs(train_owned, als_top), test_new)
    )

    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    out = out.orderBy("strategy")
    # materialize the 5-row result eagerly so the three persisted frames
    # (train_owned / test_new / ratings) can be released — a long session
    # running the whole registry must not accumulate pinned corpus-sized
    # blocks per query (the hyperball/mis unpersist discipline; the r10
    # full-registry scale runner OOM'd on exactly this accumulation)
    collected = out.collect()
    for df in (train_owned, test_new, ratings):
        df.unpersist()
    return spark.createDataFrame(collected, out.schema)
