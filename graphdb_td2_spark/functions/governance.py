"""Data-governance operators [extension]: right-to-be-forgotten cascade
over the relational corpus — the deletion counterpart of the PII scan
(:mod:`graphdb_td2_spark.functions.pii`).

Given a seed set of customers, the FK closure that references them is
(orders via o_custkey) → (lineitem via those orders) → (events via
user_id). ``forget_customer_impact`` reports how many rows a forget
request would touch per table (the audit artifact a DSAR pipeline files);
``propagate_forget`` returns the surviving frames (anti-join semantics),
ready for the lake sinks.

No reference counterpart (the reference never deletes); modeled on the
FK graph in ``postgres/init/01_schema.sql:19-39``.

Cross-engine determinism: pure integer counts over equi-joins.

Scale notes: the seed set is broadcast everywhere (a forget batch is
human-sized — thousands, not billions); the orders-of-seeds key set used
by the lineitem hop is order-cardinality-of-the-seeds-sized and also
broadcast. Every fact table is touched once, with only its key columns
read for the impact counts (column-pruned scans); nothing shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import read_table

FORGET_SEED_MOD = 1000  # deterministic demo seed set: c_custkey % 1000 == 1


def _seed_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "customer", ["c_custkey"]).filter(
        F.col("c_custkey") % FORGET_SEED_MOD == 1
    )


def forget_customer_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``(table_name, n_rows)`` — rows per table that deleting the seed
    customers would cascade to, ordered by table_name."""
    seeds = F.broadcast(_seed_customers(spark, sf_dir))

    customers = seeds.select(F.col("c_custkey").alias("k"))
    orders = read_table(spark, sf_dir, "orders", ["o_orderkey", "o_custkey"]).join(
        seeds, F.col("o_custkey") == F.col("c_custkey")
    )
    order_keys = F.broadcast(orders.select("o_orderkey"))
    lineitem = read_table(spark, sf_dir, "lineitem", ["l_orderkey"]).join(
        order_keys, F.col("l_orderkey") == F.col("o_orderkey")
    )
    events = read_table(spark, sf_dir, "events", ["event_id", "user_id"]).join(
        seeds, F.col("user_id") == F.col("c_custkey")
    )

    def _count(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )

    return (
        _count(customers, "customer")
        .union(_count(orders, "orders"))
        .union(_count(lineitem, "lineitem"))
        .union(_count(events, "events"))
        .orderBy("table_name")
    )


def propagate_forget(
    spark: SparkSession, sf_dir: str, seeds: DataFrame | None = None
) -> dict[str, DataFrame]:
    """The surviving rows per table after the cascade (left_anti on the
    same key sets the impact count uses) — write these through the lake
    sinks to execute the forget."""
    if seeds is None:
        seeds = _seed_customers(spark, sf_dir)
    seeds = F.broadcast(seeds.select("c_custkey"))

    customer = read_table(spark, sf_dir, "customer").join(
        seeds, "c_custkey", "left_anti"
    )
    orders_all = read_table(spark, sf_dir, "orders")
    dead_orders = F.broadcast(
        orders_all.join(
            seeds, orders_all["o_custkey"] == seeds["c_custkey"]
        ).select("o_orderkey")
    )
    orders = orders_all.join(dead_orders, "o_orderkey", "left_anti")
    lineitem = read_table(spark, sf_dir, "lineitem").join(
        dead_orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "l_orderkey",
        "left_anti",
    )
    events_all = read_table(spark, sf_dir, "events")
    events = events_all.join(
        seeds.withColumnRenamed("c_custkey", "user_id"), "user_id", "left_anti"
    )
    return {
        "customer": customer,
        "orders": orders,
        "lineitem": lineitem,
        "events": events,
    }


K_ANON_THRESHOLD = 5


def k_anonymity_report(
    spark: SparkSession, sf_dir: str, k: int = K_ANON_THRESHOLD
) -> DataFrame:
    """Registry entry: ``(quasi_identifier, n_groups, min_group_size,
    n_small_groups, n_exposed_rows)`` — k-anonymity audit over the
    customer dimension's quasi-identifier combinations (nation,
    market segment, and their pair): groups smaller than ``k`` are
    re-identification risks, and ``n_exposed_rows`` counts the
    customers inside them. The privacy gate that complements the
    right-to-be-forgotten cascade. Ordered by quasi_identifier.

    Scale: one hash agg per quasi-identifier set (all partial-agged),
    output bounded by the QI list. All exact integers.
    """
    customer = read_table(
        spark, sf_dir, "customer", ["c_custkey", "c_nationkey", "c_mktsegment"]
    )
    qis = {
        "nation": [F.col("c_nationkey").cast("string")],
        "segment": [F.col("c_mktsegment")],
        "nation+segment": [
            F.col("c_nationkey").cast("string"),
            F.col("c_mktsegment"),
        ],
    }
    out = None
    for name, cols in qis.items():
        groups = customer.groupBy(
            F.concat_ws("|", *cols).alias("g")
        ).agg(F.count(F.lit(1)).cast("long").alias("n"))
        row = groups.agg(
            F.lit(name).alias("quasi_identifier"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.min("n").cast("long").alias("min_group_size"),
            F.sum((F.col("n") < k).cast("long")).cast("long").alias("n_small_groups"),
            F.sum(F.when(F.col("n") < k, F.col("n")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_exposed_rows"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("quasi_identifier")


L_DIVERSITY_THRESHOLD = 3  # groups with fewer distinct sensitive values leak


def l_diversity_report(
    spark: SparkSession, sf_dir: str, l_min: int = L_DIVERSITY_THRESHOLD
) -> DataFrame:
    """Registry entry: ``(quasi_identifier, n_groups, min_l, n_weak_groups,
    n_exposed_rows)`` — distinct-l-diversity audit over the same
    quasi-identifier sets as :func:`k_anonymity_report`, with the
    sensitive attribute = the account-balance band (exact cents // 1000
    dollars). A QI group where every member shares one of fewer than
    ``l_min`` sensitive values is attribute-disclosure-prone even when it
    is k-anonymous — ``min_l`` is the weakest group's distinct-value
    count and ``n_exposed_rows`` the customers inside weak groups.
    Ordered by quasi_identifier.

    No reference counterpart [extension]; complements the k-anonymity
    gate the way homogeneity attacks motivate l-diversity over
    k-anonymity in the published privacy literature.

    Scale: one (QI, band) hash agg then one QI agg per quasi-identifier
    set — both partial-agged, output bounded by the QI list. Exact
    integers throughout (cents via the shared ``floor(x*100 + 0.5)``
    rule; band via floor division, negative balances land in band −1).
    """
    customer = read_table(
        spark,
        sf_dir,
        "customer",
        ["c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"],
    )
    band = F.floor(
        (F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long"))
        / F.lit(100000)
    ).cast("long")
    qis = {
        "nation": [F.col("c_nationkey").cast("string")],
        "segment": [F.col("c_mktsegment")],
        "nation+segment": [
            F.col("c_nationkey").cast("string"),
            F.col("c_mktsegment"),
        ],
    }
    out = None
    for name, cols in qis.items():
        groups = (
            customer.groupBy(
                F.concat_ws("|", *cols).alias("g"), band.alias("band")
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .groupBy("g")
            .agg(
                F.count(F.lit(1)).cast("long").alias("l"),
                F.sum("n").cast("long").alias("n_rows"),
            )
        )
        row = groups.agg(
            F.lit(name).alias("quasi_identifier"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.min("l").cast("long").alias("min_l"),
            F.sum((F.col("l") < l_min).cast("long"))
            .cast("long")
            .alias("n_weak_groups"),
            F.sum(F.when(F.col("l") < l_min, F.col("n_rows")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_exposed_rows"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("quasi_identifier")


T_CLOSENESS_FP = 200_000  # groups with EMD > 0.2 (micro units) leak
T_SCALE = 1_000_000


def t_closeness_report(
    spark: SparkSession, sf_dir: str, t_max_fp: int = T_CLOSENESS_FP
) -> DataFrame:
    """Registry entry: ``(quasi_identifier, n_groups, max_t_fp,
    n_weak_groups, n_exposed_rows)`` — t-closeness audit over the same
    quasi-identifier sets as :func:`k_anonymity_report`, sensitive
    attribute = the shared acctbal band. t is the 1-D earth mover's
    distance between a group's band distribution and the GLOBAL one —
    the skewness attack l-diversity misses: a group can hold ``l``
    distinct values yet sit almost entirely in the tail.

    Ground distance is BAND RANK, not band value (ADVICE r10): the CDF
    runs over the globally PRESENT bands in order, normalized by
    (B−1) where B = count of present bands, so two bands separated by
    a gap in the band domain are one unit apart, same as adjacent
    bands. On this corpus the band domain is contiguous, where rank
    and value distance coincide; the rank metric is the
    cross-engine-stable choice (both engines enumerate the same
    present-band lattice) and is pinned by the Python-reference test.
    Completes the privacy family k-anonymity → l-diversity →
    t-closeness. Ordered by quasi_identifier.

    Cross-engine exactness: 1-D EMD over ordered bands is
    Σ_i |CDF_group(i) − CDF_global(i)|; with integer counts that is

        t_fp = (Σ_i |cum_g(i)·N − CUM(i)·n_g|) · T_SCALE
                 div (n_g · N · (B−1))

    — one floor division over an exact integer sum (DECIMAL(38,0)
    accumulators, the tfidf discipline, so the products are exact far
    beyond int64 corpora).

    Scale: one (QI, band) hash agg per QI set (partial-agged,
    corpus-sized scan) — everything after is over the bounded
    |groups| × |bands| lattice (domain-bounded, never corpus-sized);
    the global CDF window runs on the ~100-row band axis.
    """
    from pyspark.sql import Window

    customer = read_table(
        spark,
        sf_dir,
        "customer",
        ["c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"],
    )
    band = F.floor(
        (F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long"))
        / F.lit(100000)
    ).cast("long")
    qis = {
        "nation": [F.col("c_nationkey").cast("string")],
        "segment": [F.col("c_mktsegment")],
        "nation+segment": [
            F.col("c_nationkey").cast("string"),
            F.col("c_mktsegment"),
        ],
    }
    glob = customer.groupBy(band.alias("band")).agg(
        F.count(F.lit(1)).cast("long").alias("gn")
    )
    w_glob = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    glob_cdf = glob.select(
        "band", F.sum("gn").over(w_glob).cast("long").alias("cum_all")
    )
    totals = glob.agg(
        F.sum("gn").cast("long").alias("n_all"),
        F.count(F.lit(1)).cast("long").alias("n_bands"),
    )
    out = None
    for name, cols in qis.items():
        gb = customer.groupBy(
            F.concat_ws("|", *cols).alias("g"), band.alias("band")
        ).agg(F.count(F.lit(1)).cast("long").alias("n"))
        grp = gb.groupBy("g").agg(F.sum("n").cast("long").alias("n_g"))
        lattice = (
            grp.crossJoin(F.broadcast(glob_cdf.select("band")))
            .join(gb, ["g", "band"], "left")
            .select("g", "band", "n_g", F.coalesce("n", F.lit(0)).alias("n"))
        )
        w_g = Window.partitionBy("g").orderBy("band").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        cdfs = lattice.select(
            "g",
            "band",
            "n_g",
            F.sum("n").over(w_g).cast("long").alias("cum_g"),
        ).join(F.broadcast(glob_cdf), "band").crossJoin(F.broadcast(totals))
        per_group = (
            cdfs.select(
                "g",
                "n_g",
                "n_all",
                "n_bands",
                F.abs(
                    F.col("cum_g").cast("decimal(38,0)") * F.col("n_all")
                    - F.col("cum_all").cast("decimal(38,0)") * F.col("n_g")
                ).alias("diff"),
            )
            .groupBy("g", "n_g", "n_all", "n_bands")
            .agg(F.sum("diff").alias("sdiff"))
            .select(
                "g",
                "n_g",
                F.expr(
                    f"cast((sdiff * {T_SCALE}) div (cast(n_g as decimal(38,0))"
                    " * n_all * greatest(n_bands - 1, 1)) as bigint)"
                ).alias("t_fp"),
            )
        )
        row = per_group.agg(
            F.lit(name).alias("quasi_identifier"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.max("t_fp").cast("long").alias("max_t_fp"),
            F.sum((F.col("t_fp") > t_max_fp).cast("long"))
            .cast("long")
            .alias("n_weak_groups"),
            F.sum(
                F.when(F.col("t_fp") > t_max_fp, F.col("n_g")).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_exposed_rows"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("quasi_identifier")
