"""Analytic relational operators over the corpus star schema.

These exercise the full §2 relational inventory at OLAP scale: projections
and filters that push to the parquet scan (B1-B4), broadcast equi-joins over
the dimension chain region→nation→customer (C7/C8), partial+final hash
aggregation (D1/D3), rollup grouping sets, set operations (§2.G
[extension]), and deterministic top-k (F1).

Cross-engine float determinism: unordered floating-point SUM/AVG is
order-dependent, and the DuckDB oracle would hash-mismatch on the last bits.
Money-like doubles in the corpus carry ≤2 decimal digits, so every such
aggregate here is computed exactly: cast to DECIMAL(12,2) (lossless for the
data, exact in both engines), summed exactly, then cast back to DOUBLE for
output. Products (discount/tax factors) stay within explicit intermediate
precisions so Spark and DuckDB never hit their (different) precision-loss
rules. Averages are ``exact_sum / count`` evaluated in double — one
deterministic division.

Scale notes: region/nation/customer/part are dimensions (broadcast);
orders/lineitem are the fact tables (shuffled hash agg with map-side partial
aggregation; AQE coalesces post-shuffle partitions). Top-k compiles to
TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..io import read_table

# Exact-decimal sum of a ≤2-dp money double, returned as double.
def _money(col) -> F.Column:
    return F.col(col).cast("decimal(12,2)")


def _dsum(col, alias: str) -> F.Column:
    return F.sum(_money(col)).cast("double").alias(alias)


def _dsum_expr(expr: F.Column, alias: str) -> F.Column:
    return F.sum(expr).cast("double").alias(alias)


def disc_price_expr() -> F.Column:
    """Exact per-row discounted price: DECIMAL(12,2) × DECIMAL(5,2) →
    explicit DECIMAL(18,4) — identical intermediate types in the oracle."""
    factor = (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(4,2)")
    ).cast("decimal(5,2)")
    return (_money("l_extendedprice") * factor).cast("decimal(18,4)")


def charge_expr() -> F.Column:
    tax_factor = (
        F.lit(1).cast("decimal(3,2)") + F.col("l_tax").cast("decimal(4,2)")
    ).cast("decimal(5,2)")
    return (disc_price_expr() * tax_factor).cast("decimal(24,6)")


def pricing_summary(spark: SparkSession, sf_dir: str, cutoff: str = "2024-09-01") -> DataFrame:
    """TPC-H Q1-shaped pricing summary: filter pushed to the scan, grouped
    hash agg with exact-decimal sums, deterministic group ordering."""
    li = read_table(spark, sf_dir, "lineitem")
    disc_price = disc_price_expr()
    charge = charge_expr()
    out = (
        li.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity", "sum_qty"),
            _dsum("l_extendedprice", "sum_base_price"),
            _dsum_expr(disc_price, "sum_disc_price"),
            _dsum_expr(charge, "sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn("avg_qty", F.col("sum_qty") / F.col("count_order"))
        .withColumn("avg_price", F.col("sum_base_price") / F.col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        "avg_qty",
        "avg_price",
        "count_order",
    )


def brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per brand: fact⋈dimension broadcast join + hash agg + top-k
    (generalizes C2's category dimension to an aggregate query)."""
    li = read_table(spark, sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])
    part = read_table(spark, sf_dir, "part", ["p_partkey", "p_brand"])
    revenue = disc_price_expr()
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(_dsum_expr(revenue, "revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy(F.desc("revenue"), F.asc("p_brand"))
    )


def region_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total order value per region: the full dimension chain
    region⋈nation⋈customer broadcast-joined into orders (C7 at OLAP shape)."""
    region = read_table(spark, sf_dir, "region")
    nation = read_table(spark, sf_dir, "nation")
    customer = read_table(spark, sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = read_table(spark, sf_dir, "orders", ["o_custkey", "o_totalprice"])
    return (
        orders.join(
            F.broadcast(customer), orders.o_custkey == customer.c_custkey
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            _dsum("o_totalprice", "total_sales"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("r_name")
    )


def top_customers(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Top-k customers by exact total spend (F1 top-k with full tiebreak)."""
    customer = read_table(spark, sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    orders = read_table(spark, sf_dir, "orders", ["o_custkey", "o_totalprice"])
    return (
        orders.groupBy("o_custkey")
        .agg(_dsum("o_totalprice", "total_spent"), F.count(F.lit(1)).alias("n_orders"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("mktsegment"),
            "total_spent",
            "n_orders",
        )
        .orderBy(F.desc("total_spent"), F.asc("custkey"))
        .limit(k)
    )


def order_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (status, priority) — grouping sets [extension], free in
    Spark SQL (SURVEY §2.D note). Includes exact sums per grouping set."""
    orders = read_table(spark, sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"])
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum("o_totalprice", "total_value"),
        )
        .orderBy(
            F.asc_nulls_first("o_orderstatus"), F.asc_nulls_first("o_orderpriority")
        )
    )


def market_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment customer stats (exact sums; avg as exact-sum/count)."""
    customer = read_table(spark, sf_dir, "customer", ["c_mktsegment", "c_acctbal"])
    return (
        customer.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _dsum("c_acctbal", "sum_acctbal"),
        )
        .withColumn("avg_acctbal", F.col("sum_acctbal") / F.col("n_customers"))
        .orderBy("c_mktsegment")
    )


def customer_activity_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (§2.G [extension]): classify customer keys by whether
    they appear as order placers, event users, or both — INTERSECT /
    EXCEPT / UNION ALL composed into one tagged result."""
    order_custs = (
        read_table(spark, sf_dir, "orders", ["o_custkey"])
        .select(F.col("o_custkey").alias("key"))
        .distinct()
    )
    event_users = (
        read_table(spark, sf_dir, "events", ["user_id"])
        .select(F.col("user_id").alias("key"))
        .distinct()
    )
    both = order_custs.intersect(event_users).select(
        F.lit("both").alias("cohort"), "key"
    )
    orders_only = order_custs.exceptAll(event_users).select(
        F.lit("orders_only").alias("cohort"), "key"
    )
    events_only = event_users.exceptAll(order_custs).select(
        F.lit("events_only").alias("cohort"), "key"
    )
    return (
        both.unionByName(orders_only)
        .unionByName(events_only)
        .groupBy("cohort")
        .agg(F.count(F.lit(1)).alias("n_keys"))
        .orderBy("cohort")
    )


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: revenue from lineitems where the supplier and the
    ordering customer share a nation, per nation — the only query shape
    that exercises ``supplier`` and closes the corpus-table coverage.

    Plan shape at scale: lineitem (fact) joins orders on the order key
    (sort-merge at volume), then customer / supplier / nation all
    broadcast; the nation-equality predicate prunes before the aggregate.
    """
    li = read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    orders = read_table(spark, sf_dir, "orders", ["o_orderkey", "o_custkey"])
    customer = read_table(spark, sf_dir, "customer", ["c_custkey", "c_nationkey"])
    supplier = read_table(spark, sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nation = read_table(spark, sf_dir, "nation", ["n_nationkey", "n_name"])
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            _dsum_expr(disc_price_expr(), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def returnflag_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all four grouping-set
    combinations in one pass — the grouping-sets generalization of the
    ROLLUP row ([ext] per SURVEY §2.D: free in Spark SQL, so exposed).
    ``grouping_id`` disambiguates NULL-as-subtotal from NULL data."""
    li = read_table(spark, sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _dsum("l_quantity", "sum_qty"),
            F.grouping_id().cast("long").alias("grouping_id"),
        )
        .orderBy(
            F.col("grouping_id"),
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
        .select("l_returnflag", "l_linestatus", "grouping_id", "n_items", "sum_qty")
    )


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles of event value per type.

    Engine-exact via ``operators/percentiles.py``: 2-decimal values go
    through exact cents, ranks are integer arithmetic over a
    per-(type, cents) histogram, and the single float step is one shared
    division (Spark ``percentile`` vs DuckDB ``quantile_cont`` differ in
    the last ulp for the wrong group size — the r7 sf0.1 lesson)."""
    from .percentiles import as_value, percentile_numerators

    events = read_table(spark, sf_dir, "events", ["event_type", "value"])
    q = events.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    pf = percentile_numerators(
        q,
        ["event_type"],
        "cents",
        [(1, 4, "p25n"), (1, 2, "p50n"), (3, 4, "p75n"), (19, 20, "p95n")],
    )
    return pf.select(
        "event_type",
        as_value(F.col("p25n"), 4, 100.0).alias("p25"),
        as_value(F.col("p50n"), 2, 100.0).alias("p50"),
        as_value(F.col("p75n"), 4, 100.0).alias("p75"),
        as_value(F.col("p95n"), 20, 100.0).alias("p95"),
        F.col("n").alias("n_events"),
    ).orderBy("event_type")


def top_price_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery pattern [extension]: orders priced within 10% of the
    global maximum. The scalar (one row) is cross-joined back — Catalyst
    broadcasts it, the fact scan streams once; MAX is order-independent so
    the threshold is engine-exact (0.9·max: one IEEE multiply)."""
    orders = read_table(spark, sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    mx = orders.agg(F.max("o_totalprice").alias("max_price"))
    return (
        orders.crossJoin(F.broadcast(mx))
        .filter(F.col("o_totalprice") >= F.lit(0.9) * F.col("max_price"))
        .select("o_orderkey", "o_totalprice", "max_price")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    )


def urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / semi-join pattern [extension]: customers with at least one
    1-URGENT order, with their market segment. ``left_semi`` keeps the
    probe side unduplicated (no post-join distinct) and the priority filter
    pushes to the orders parquet scan."""
    customer = read_table(spark, sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    urgent = (
        read_table(spark, sf_dir, "orders", ["o_custkey", "o_orderpriority"])
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        customer.join(urgent, "c_custkey", "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: top-10 unshipped orders of one market segment by
    outstanding revenue (ordered before / shipped after the cutoff).

    Plan shape at scale: the segment filter prunes customer (broadcast);
    both date predicates push to the orders / lineitem parquet scans; the
    fact-fact join on the order key is sort-merge at volume; top-k
    compiles to TakeOrderedAndProject."""
    cutoff = "1998-01-01"
    customer = read_table(spark, sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = read_table(spark, sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    li = read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"])
    return (
        li.filter(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp"))
        .join(
            orders.filter(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(
                customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_dsum_expr(disc_price_expr(), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def user_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT [extension]: per-user event counts, one column per event type.
    The pivot value list is FIXED (stable output schema — a dynamic pivot
    would need an extra distinct pass and make the schema data-dependent);
    compiles to one hash aggregate with conditional counts, no extra
    shuffle vs a plain groupBy."""
    events = read_table(spark, sf_dir, "events", ["user_id", "event_type"])
    return (
        events.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
        .select(
            "user_id", *[F.col(t).cast("long").alias(f"n_{t}") for t in EVENT_TYPES]
        )
        .orderBy("user_id")
    )


def user_event_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt [extension]: the pivot's inverse — wide per-user counts
    back to long (user_id, event_type, n) rows, zero-count cells dropped
    (narrow generator expression, no shuffle beyond the pivot's own)."""
    wide = user_event_pivot(spark, sf_dir)
    return (
        wide.unpivot(
            "user_id",
            [f"n_{t}" for t in EVENT_TYPES],
            "event_type",
            "n",
        )
        .withColumn("event_type", F.expr("substring(event_type, 3)"))
        .filter(F.col("n") > 0)
        .orderBy("user_id", "event_type")
    )


def daily_activity_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two daily activity series — order volume vs
    event volume per calendar day. The two calendars only partially
    overlap (orders span years, events a few days), so both null sides
    are exercised; missing counts coalesce to 0. The join key is
    dimension-sized (days), so this is a broadcast-able full-outer —
    Spark demotes to sort-merge only when both sides outgrow the
    threshold, which a day-grained rollup never does."""
    orders = read_table(spark, sf_dir, "orders", ["o_orderdate"])
    events = read_table(spark, sf_dir, "events", ["ts"])
    od = (
        orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    ev = (
        events.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        od.join(ev, "day", "full_outer")
        .select(
            "day",
            F.coalesce(F.col("n_orders"), F.lit(0)).cast("long").alias("n_orders"),
            F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        )
        .orderBy("day")
    )


def geo_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(region, nation, revenue_cents, nation_share,
    region_share)`` — order revenue rolled up the region→nation→customer
    dimension chain, with each nation's share of its region and each
    region's share of the total as windowed percent-of-parent ratios.
    Ordered by (region, nation).

    Determinism: exact DECIMAL→BIGINT cents; shares are single IEEE
    divisions of integer-valued window sums over the BOUNDED nation
    axis (25 rows at any corpus scale).

    Scale notes: the fact-side rollup aggregates to customer-nation
    grain BEFORE touching the dim chain; region/nation/customer joins
    broadcast (classic star schema); the share windows range over the
    dimension axis only.
    """
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders", ["o_custkey", "o_totalprice"])
    customer = read_table(spark, sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = read_table(spark, sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    region = read_table(spark, sf_dir, "region", ["r_regionkey", "r_name"])
    per_cust = (
        orders.select(
            "o_custkey", F.col("o_totalprice").cast("decimal(14,2)").alias("p")
        )
        .groupBy("o_custkey")
        .agg((F.sum("p") * 100).cast("long").alias("cents"))
    )
    per_nation = (
        per_cust.join(
            F.broadcast(customer), per_cust["o_custkey"] == customer["c_custkey"]
        )
        .groupBy("c_nationkey")
        .agg(F.sum("cents").cast("long").alias("revenue_cents"))
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            "revenue_cents",
        )
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return per_nation.select(
        "region",
        "nation",
        "revenue_cents",
        (
            F.col("revenue_cents").cast("double")
            / F.sum("revenue_cents").over(w_region).cast("double")
        ).alias("nation_share"),
        (
            F.sum("revenue_cents").over(w_region).cast("double")
            / F.sum("revenue_cents").over(w_all).cast("double")
        ).alias("region_share"),
    ).orderBy("region", "nation")


def shipping_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(o_orderpriority, n_items, p50_days, p90_days)``
    — order-to-ship latency distribution per priority class: does URGENT
    actually ship faster? Exact integer day deltas through the
    parity-pinned percentile. Ordered by priority.

    Scale notes: one orders⋈lineitem join on the order key (bucketed
    co-location at lake scale), integer datediff projection, and a
    5-group percentile agg.
    """
    orders = read_table(spark, sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
    items = read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    lat = items.join(orders, items["l_orderkey"] == orders["o_orderkey"]).select(
        "o_orderpriority",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).cast("long").alias("d"),
    )
    from .percentiles import as_value, percentile_numerators

    pf = percentile_numerators(
        lat, ["o_orderpriority"], "d", [(1, 2, "p50n"), (9, 10, "p90n")]
    )
    return pf.select(
        "o_orderpriority",
        F.col("n").alias("n_items"),
        as_value(F.col("p50n"), 2).alias("p50_days"),
        as_value(F.col("p90n"), 10).alias("p90_days"),
    ).orderBy("o_orderpriority")


def supplier_concentration_topk(
    spark: SparkSession, sf_dir: str, k: int = 20, min_suppliers: int = 2
) -> DataFrame:
    """Registry entry: ``(l_partkey, n_suppliers, sum_qty, hhi)`` — the
    ``k`` parts with the most concentrated supplier base by Herfindahl-
    Hirschman index (Σ share², share = supplier quantity / part
    quantity), the supply-chain-risk screen. Ties break on partkey;
    single-supplier parts (HHI trivially 1) are excluded by
    ``min_suppliers``.

    Determinism: quantities are ≤2-dp → exact integer centiquantities;
    HHI = Σq_s² / (Σq)² is ONE division of exact integers (numerator
    summed as int64). Scale notes: two stacked partial-agged hash aggs
    ((part, supplier) then part); top-k is TakeOrderedAndProject.
    """
    items = read_table(spark, sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity"])
    per_supp = (
        items.select(
            "l_partkey",
            "l_suppkey",
            (F.col("l_quantity").cast("decimal(14,2)") * 100).cast("long").alias("q"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("q").cast("long").alias("sq"))
    )
    per_part = per_supp.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum("sq").cast("long").alias("sum_q"),
        F.sum(F.col("sq") * F.col("sq")).cast("long").alias("sum_sq2"),
    )
    return (
        per_part.filter(F.col("n_suppliers") >= min_suppliers)
        .select(
            "l_partkey",
            "n_suppliers",
            F.col("sum_q").alias("sum_qty"),
            (
                F.col("sum_sq2").cast("double")
                / (F.col("sum_q").cast("double") * F.col("sum_q").cast("double"))
            ).alias("hhi"),
        )
        .orderBy(F.desc("hhi"), F.asc("l_partkey"))
        .limit(k)
    )


def nation_trade_flows(spark: SparkSession, sf_dir: str, k: int = 25) -> DataFrame:
    """Registry entry: ``(cust_nation, supp_nation, n_items,
    revenue_cents)`` — the TPC-H Q7 "volume shipping" shape: line-item
    revenue flowing from supplier nation to customer nation, top-k flows
    by revenue (ties on the nation pair). The canonical two-armed
    star join — one fact scan resolving BOTH role-playing nation
    dimensions.

    Determinism: exact DECIMAL→BIGINT revenue cents
    (extendedprice·(1−discount) per Q7, both ≤2-dp so the product is
    exact at 4 decimals); top-k carries a total order.

    Scale notes: the fact joins orders on the order key (bucketed at
    lake scale); customer/supplier/nation dims broadcast; the flow
    matrix is |nations|²-bounded before the top-k.
    """
    li = read_table(
        spark, sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    orders = read_table(spark, sf_dir, "orders", ["o_orderkey", "o_custkey"])
    customer = read_table(spark, sf_dir, "customer", ["c_custkey", "c_nationkey"])
    supplier = read_table(spark, sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nation = read_table(spark, sf_dir, "nation", ["n_nationkey", "n_name"])
    cn = nation.select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("s_nationkey"), F.col("n_name").alias("supp_nation")
    )
    # revenue in exact 1/10000 currency units: price(2dp) × (1-disc)(2dp)
    rev_fp = (
        F.col("l_extendedprice").cast("decimal(14,2)")
        * (F.lit(1).cast("decimal(14,2)") - F.col("l_discount").cast("decimal(14,2)"))
        * 10000
    ).cast("long")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cn), "c_nationkey")
        .join(F.broadcast(sn), "s_nationkey")
        .select("cust_nation", "supp_nation", rev_fp.alias("rev"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.expr("CAST(SUM(rev) DIV 100 AS BIGINT)").alias("revenue_cents"),
        )
        .orderBy(F.desc("revenue_cents"), "cust_nation", "supp_nation")
        .limit(k)
    )


MKT_REGION = "ASIA"
MKT_BRAND = "Brand#1"


def brand_market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(o_year, brand_cents, total_cents, mkt_share)``
    — the TPC-H Q8 "national market share" shape: per order year, the
    share of ASIA-region customer revenue carried by Brand#1 parts. The
    deepest join chain in the registry — six tables
    (region→nation→customer→orders→lineitem→part) — exercising
    Catalyst's join reordering with every dimension broadcast. Ordered
    by year.

    Determinism: exact 1/10000-unit revenue fixed point (as Q7's
    flows); the share is ONE division of int64 sums. Scale: the
    region→nation→customer reduction happens dim-side BEFORE touching
    facts (a semi-join-shaped broadcast), parts broadcast with the
    brand flag riding along, one fact pass.
    """
    li = read_table(
        spark, sf_dir, "lineitem",
        ["l_orderkey", "l_partkey", "l_extendedprice", "l_discount"],
    )
    orders = read_table(spark, sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    customer = read_table(spark, sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = read_table(spark, sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    region = read_table(spark, sf_dir, "region", ["r_regionkey", "r_name"])
    part = read_table(spark, sf_dir, "part", ["p_partkey", "p_brand"])
    asia_custs = (
        customer.join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .join(
            F.broadcast(region.filter(F.col("r_name") == MKT_REGION)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    rev_fp = (
        F.col("l_extendedprice").cast("decimal(14,2)")
        * (F.lit(1).cast("decimal(14,2)") - F.col("l_discount").cast("decimal(14,2)"))
        * 10000
    ).cast("long")
    flagged = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(asia_custs), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            rev_fp.alias("rev"),
            (F.col("p_brand") == MKT_BRAND).cast("long").alias("is_brand"),
        )
    )
    return (
        flagged.groupBy("o_year")
        .agg(
            F.expr("CAST(SUM(rev * is_brand) DIV 100 AS BIGINT)").alias("brand_cents"),
            F.expr("CAST(SUM(rev) DIV 100 AS BIGINT)").alias("total_cents"),
        )
        .select(
            "o_year",
            "brand_cents",
            "total_cents",
            (
                F.col("brand_cents").cast("double")
                / F.col("total_cents").cast("double")
            ).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


CHURN_WINDOW_DAYS = 90


def segment_churn_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(c_mktsegment, n_customers, n_active, n_churned,
    n_never, churn_rate)`` — customer-lifecycle accounting per market
    segment: active = ordered within the trailing ``CHURN_WINDOW_DAYS``
    of the corpus horizon (the corpus max order date — no wall clock),
    churned = ordered before that only, never = no orders at all.
    Ordered by segment.

    Determinism: the horizon is a 1-row broadcast scalar; buckets are
    integer date comparisons; churn_rate = churned / ever-ordered, one
    division. Scale: one per-customer max-date rollup joined to the
    broadcast segment dim; output |segment|-bounded.
    """
    customer = read_table(spark, sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = read_table(spark, sf_dir, "orders", ["o_custkey", "o_orderdate"])
    last = orders.groupBy("o_custkey").agg(F.max("o_orderdate").alias("last_order"))
    horizon = orders.agg(F.max("o_orderdate").alias("hmax"))
    tagged = (
        customer.join(last, customer["c_custkey"] == last["o_custkey"], "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            "c_mktsegment",
            F.when(F.col("last_order").isNull(), F.lit("never"))
            .when(
                F.col("last_order")
                >= F.col("hmax") - F.expr(f"INTERVAL {CHURN_WINDOW_DAYS} DAY"),
                F.lit("active"),
            )
            .otherwise(F.lit("churned"))
            .alias("state"),
        )
    )
    return (
        tagged.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum((F.col("state") == "active").cast("long")).cast("long").alias("n_active"),
            F.sum((F.col("state") == "churned").cast("long")).cast("long").alias("n_churned"),
            F.sum((F.col("state") == "never").cast("long")).cast("long").alias("n_never"),
        )
        .select(
            "c_mktsegment",
            "n_customers",
            "n_active",
            "n_churned",
            "n_never",
            (
                F.col("n_churned").cast("double")
                / (F.col("n_active") + F.col("n_churned")).cast("double")
            ).alias("churn_rate"),
        )
        .orderBy("c_mktsegment")
    )


def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(l_returnflag, total_weight, median_price_cents)``
    — QUANTITY-WEIGHTED median of line-item price per return flag, a
    statistic Spark has no built-in for: the exact integer-ECDF
    construction (the KS/stump trick) finds the first price whose
    doubled running weight reaches the total. Ordered by flag.

    Determinism: prices and quantities are exact integer cents /
    centiquantities; the selection predicate ``2·cum ≥ total`` is pure
    integer comparison — no interpolation, no floats anywhere. Scale:
    one (flag, price) rollup, a per-flag window over the distinct-price
    axis, one row per flag out.
    """
    from pyspark.sql import Window

    items = read_table(
        spark, sf_dir, "lineitem", ["l_returnflag", "l_extendedprice", "l_quantity"]
    )
    per_price = (
        items.select(
            "l_returnflag",
            (F.col("l_extendedprice").cast("decimal(14,2)") * 100)
            .cast("long")
            .alias("price_cents"),
            (F.col("l_quantity").cast("decimal(14,2)") * 100)
            .cast("long")
            .alias("w"),
        )
        .groupBy("l_returnflag", "price_cents")
        .agg(F.sum("w").cast("long").alias("w"))
    )
    win = (
        Window.partitionBy("l_returnflag")
        .orderBy("price_cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = per_price.groupBy("l_returnflag").agg(
        F.sum("w").cast("long").alias("total_weight")
    )
    cums = per_price.select(
        "l_returnflag", "price_cents", F.sum("w").over(win).cast("long").alias("cum")
    )
    hits = (
        cums.join(tot, "l_returnflag")
        .filter(F.col("cum") * 2 >= F.col("total_weight"))
        .groupBy("l_returnflag")
        .agg(
            F.first("total_weight").cast("long").alias("total_weight"),
            F.min("price_cents").cast("long").alias("median_price_cents"),
        )
    )
    return hits.orderBy("l_returnflag")


def brand_return_rates(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Registry entry: ``(p_brand, n_items, n_returned, return_rate)`` —
    line-item return share per brand (l_returnflag = 'R'), the
    product-quality complaint signal, top-k by rate with (rate DESC,
    brand) order and a minimum-volume floor of 100 items.

    Integer counts + one division; broadcast part dim; |brand|-bounded
    before the top-k."""
    items = read_table(spark, sf_dir, "lineitem", ["l_partkey", "l_returnflag"])
    part = read_table(spark, sf_dir, "part", ["p_partkey", "p_brand"])
    return (
        items.join(F.broadcast(part), items["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum((F.col("l_returnflag") == "R").cast("long"))
            .cast("long")
            .alias("n_returned"),
        )
        .filter(F.col("n_items") >= 100)
        .select(
            "p_brand",
            "n_items",
            "n_returned",
            (
                F.col("n_returned").cast("double") / F.col("n_items").cast("double")
            ).alias("return_rate"),
        )
        .orderBy(F.desc("return_rate"), "p_brand")
        .limit(k)
    )


def discount_quantity_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(p_brand, n_lineitems, slope_cq_per_bp,
    mean_discount_bp, mean_quantity_cq)`` — per-brand OLS slope of order
    quantity against the offered discount [extension]: the
    demand-response (elasticity proxy) curve a pricing team fits, and a
    feature a recommender's ranking model consumes.

    Exactness (same construction as ``value_trend_by_type``): x =
    discount in exact basis points, y = quantity in exact centi-units;
    the five sufficient statistics are exact DECIMAL(38,0) (mirroring
    DuckDB's HUGEINT sums — no int64 wrap at any realistic per-brand row
    count) and the slope/means
    are each ONE IEEE division of integer values, with the singular case
    (a brand priced at a single discount level) NULL-guarded identically
    in both engines.

    Scale notes: one broadcast part-dimension join to resolve the brand,
    one map-side-partial hash agg; output is |brand|-bounded.
    """
    lineitem = read_table(
        spark, sf_dir, "lineitem", ["l_partkey", "l_discount", "l_quantity"]
    )
    part = read_table(spark, sf_dir, "part", ["p_partkey", "p_brand"])
    xy = lineitem.join(
        F.broadcast(part), lineitem["l_partkey"] == part["p_partkey"]
    ).select(
        "p_brand",
        (F.col("l_discount").cast("decimal(6,4)") * 10000).cast("long").alias("x"),
        (F.col("l_quantity").cast("decimal(14,2)") * 100).cast("long").alias("y"),
    )
    # Sufficient statistics in DECIMAL(38,0): n·sxx and sx² reach ~n²·1e6,
    # which wraps int64 once a brand holds ≳3M lineitems (~sf10+). DuckDB
    # sums into HUGEINT, so decimal sums keep exact cross-engine parity
    # with no per-brand row bound (values stay integral; divisions below
    # are the only IEEE steps, identical in both engines).
    d38 = "decimal(38,0)"
    stats = xy.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x").cast(d38)).alias("sx"),
        F.sum(F.col("y").cast(d38)).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(d38)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(d38)).alias("sxx"),
    )
    det = F.col("n").cast(d38) * F.col("sxx") - F.col("sx") * F.col("sx")
    return stats.select(
        "p_brand",
        F.col("n").alias("n_lineitems"),
        F.when(
            det != 0,
            (
                F.col("n").cast(d38) * F.col("sxy") - F.col("sx") * F.col("sy")
            ).cast("double")
            / det.cast("double"),
        ).alias("slope_cq_per_bp"),
        (F.col("sx").cast("double") / F.col("n").cast("double")).alias(
            "mean_discount_bp"
        ),
        (F.col("sy").cast("double") / F.col("n").cast("double")).alias(
            "mean_quantity_cq"
        ),
    ).orderBy("p_brand")


CONCENTRATION_PCTS = (1, 5, 10, 25, 100)


def customer_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(pct, n_top_customers, revenue_cents,
    revenue_share)`` — the whale curve [extension]: how much of total
    order revenue the top 1/5/10/25/100% of customers (by spend) carry.
    The customer companion of ``supplier_concentration_topk``/ABC
    classes, and the statistic that sizes personalization ROI.

    Exactness: exact-cents spend; the cut at rank ``ceil(n·p/100)`` uses
    pure integer arithmetic; the cumulative revenue at the cut comes from
    the two-phase distributed prefix machinery (``operators/prefix.py``)
    over (spend DESC, custkey ASC) with a spend-derived monotone bucket —
    NO corpus-sized single-partition window (the DuckDB oracle uses the
    plain global window, which is the same total order). Share is one
    IEEE division of exact integers.

    Scale notes: one customer-grain hash agg; the rank/prefix pass
    shuffles the customer DIMENSION (not facts) partitioned by spend
    bucket; the 5 cut rows come from an isin filter + broadcast map join.
    """
    from .prefix import bucketed_cumsum, bucketed_row_number

    orders = read_table(spark, sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cents = F.expr("cast(cast(o_totalprice as decimal(14,2)) * 100 as bigint)")
    spend = orders.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.sum(cents).cast("long").alias("spend")
    )
    row = spend.agg(
        F.count(F.lit(1)).cast("long"), F.coalesce(F.sum("spend"), F.lit(0)).cast("long")
    ).first()
    n, total = int(row[0]), int(row[1])
    # monotone NON-INCREASING in the DESC primary key spend → ascending
    # bucket ids; ties share a bucket (function of spend alone)
    bucket = F.expr("-(spend div 1048576)")
    order = [F.col("spend").desc(), F.col("customer_id").asc()]
    ranked = bucketed_row_number(spend, bucket, order, out="rn")
    ranked = bucketed_cumsum(ranked, bucket, order, sums={"cum": "spend"})
    cuts = [(p, max((n * p + 99) // 100, 1)) for p in CONCENTRATION_PCTS]
    cut_df = F.broadcast(
        spark.createDataFrame(cuts, "pct long, rn long")
    )
    return (
        ranked.join(cut_df, "rn")
        .select(
            "pct",
            F.col("rn").alias("n_top_customers"),
            F.col("cum").alias("revenue_cents"),
            (F.col("cum").cast("double") / F.lit(float(total))).alias(
                "revenue_share"
            ),
        )
        .orderBy("pct")
    )


def product_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(product_id, n_orders, price_cents)`` — the
    SKYLINE (Pareto frontier) of products over (popularity MAX, price
    MIN) [extension]: products no other product dominates (at least as
    popular AND at least as cheap, strictly better in one) — the
    multi-criteria "best value" shortlist, a relational operator class
    (Börzsönyi et al.'s SKYLINE OF) none of the single-criterion top-k
    queries cover.

    Plan (the scale-correct 2-D skyline): the quadratic NOT EXISTS
    dominance test collapses to per-POPULARITY-LEVEL min prices + a
    running min over strictly-more-popular levels. The level axis is
    |distinct popularity counts|-bounded (hundreds even at 100 TB corpus
    sizes — it is a count histogram axis, not the product dimension), so
    the running-min window rides the same bounded-axis dispensation as
    the calendar windows; products never self-join. A product is on the
    frontier iff its price equals its level minimum AND beats every
    more-popular level's minimum strictly. Exact cents; equal
    (popularity, price) ties are mutually non-dominating and all kept.

    The DuckDB oracle uses the textbook NOT EXISTS formulation — two
    independent formulations agreeing is the correctness argument.
    """
    lineitem = read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    part = read_table(spark, sf_dir, "part", ["p_partkey", "p_retailprice"])
    pop = (
        lineitem.select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy(F.col("l_partkey").alias("product_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )
    prods = pop.join(
        part.select(
            F.col("p_partkey").alias("product_id"),
            F.expr(
                "cast(cast(p_retailprice as decimal(14,2)) * 100 as bigint)"
            ).alias("price_cents"),
        ),
        "product_id",
    )
    levels = prods.groupBy("n_orders").agg(
        F.min("price_cents").alias("lvl_min")
    )
    w = Window.orderBy(F.desc("n_orders")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    levels = levels.withColumn("higher_min", F.min("lvl_min").over(w))
    return (
        prods.join(F.broadcast(levels), "n_orders")
        .filter(
            (F.col("price_cents") == F.col("lvl_min"))
            & (
                F.col("higher_min").isNull()
                | (F.col("price_cents") < F.col("higher_min"))
            )
        )
        .select("product_id", "n_orders", "price_cents")
        .orderBy(F.desc("n_orders"), F.asc("price_cents"), F.asc("product_id"))
    )
