"""Declarative data-quality report over the fact tables — the
Deequ/Great-Expectations tier of a production lake: completeness,
key-uniqueness, referential-integrity, range and domain checks emitted
as one audit table a pipeline gate can assert on.

Reference parity: generalizes the graph-side validation job
(``graph/queries.py:graph_constraint_checks``, the engine's twin of the
reference's Neo4j constraint DDL, `app/etl.py:74-86`) to the relational
inputs themselves — the checks a pipeline runs BEFORE building anything.

Scale notes: completeness/range/domain checks fold into ONE pass over
each scanned table (conditional-sum hash aggregate, map-side partials);
uniqueness is a countDistinct on the key column only; referential
integrity is a LEFT ANTI against the broadcast-able dimension key set.
Output is check-count-bounded.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import read_table

PRIORITY_DOMAIN = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")


def orders_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(check_name, n_violations, n_total)`` — the
    orders-table quality audit, ordered by check_name."""
    orders = read_table(
        spark,
        sf_dir,
        "orders",
        ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate", "o_orderpriority"],
    )
    viol = lambda c: F.sum(c.cast("long")).cast("long")  # noqa: E731
    single_pass = orders.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        viol(F.col("o_orderkey").isNull()).alias("key_complete"),
        viol(F.col("o_orderdate").isNull()).alias("date_complete"),
        viol(F.col("o_totalprice") < 0).alias("price_range"),
        viol(~F.col("o_orderpriority").isin(*PRIORITY_DOMAIN)).alias(
            "priority_domain"
        ),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("long")
        .alias("key_unique"),
    )
    folded = single_pass.select(
        F.expr(
            "stack(5,"
            " 'completeness:o_orderkey', key_complete,"
            " 'completeness:o_orderdate', date_complete,"
            " 'uniqueness:o_orderkey', key_unique,"
            " 'range:o_totalprice>=0', price_range,"
            " 'domain:o_orderpriority', priority_domain"
            ") AS (check_name, n_violations)"
        ),
        "n_total",
    )
    customers = read_table(spark, sf_dir, "customer", ["c_custkey"])
    ri = (
        orders.select("o_custkey")
        .join(customers, orders["o_custkey"] == customers["c_custkey"], "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        .select(
            F.lit("ref_integrity:o_custkey->customer").alias("check_name"),
            "n_violations",
        )
        .crossJoin(F.broadcast(single_pass.select("n_total")))
    )
    return functools.reduce(
        DataFrame.unionByName, [folded.select("check_name", "n_violations", "n_total"), ri]
    ).orderBy("check_name")


def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(digit, n_orders, share)`` — first-significant-
    digit distribution of ``o_totalprice``, the Benford's-law audit a
    fraud/quality pipeline runs over monetary columns (synthetic TPC-H
    prices are uniform-ish, so the point is the OPERATOR, not the law
    holding). Ordered by digit.

    Determinism: prices carry ≤2 decimals, so ``floor(p·100 + 0.5)`` is
    an exact integer in both engines (DuckDB CAST rounds while Spark
    CAST truncates — flooring first sidesteps that divergence); the
    leading digit comes from the BIGINT's decimal string, and ``share``
    is one integer/integer IEEE division. Scale: one projected scan into
    a 9-group hash aggregate with map-side partials.
    """
    orders = read_table(spark, sf_dir, "orders", ["o_totalprice"])
    digit = F.substring(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("string"), 1, 1
    ).cast("int")
    counts = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    total = counts.agg(F.sum("n_orders").alias("n_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n_orders",
            (F.col("n_orders").cast("double") / F.col("n_total").cast("double")).alias(
                "share"
            ),
        )
        .orderBy("digit")
    )


# The engine's hottest shuffle/join keys (recs C1 self-join, graph build
# C7 FK joins, the window family's user axis) — the keys whose skew
# decides whether the 100 TB plan needs salting/AQE skew splits.
SKEW_KEYS: tuple[tuple[str, str], ...] = (
    ("events", "user_id"),
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"),
    ("orders", "o_custkey"),
)

SKEW_FP = 1000  # skew_ratio fixed-point scale (max/mean, milli-units)


def join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(join_key, n_rows, n_keys, max_key_rows,
    top_key, skew_ratio_fp)`` — per hot join key, the cardinality and
    hot-spot profile that decides the shuffle strategy at scale:
    ``skew_ratio_fp = max_key_rows·n_keys·1000 div n_rows`` is the
    heaviest key's multiple of the mean (1000 = perfectly uniform).

    This is the operational complement of the plan pins: a key whose
    ratio drifts past AQE's skew threshold (~5x mean) is the signal to
    pre-salt BEFORE the nightly build hits it. ``top_key`` is the
    smallest key achieving the maximum (deterministic under ties).

    Scale notes: one partial-aggregated groupBy per profiled key (the
    same shuffle the production join itself pays), then 1-row aggregates;
    the max-count key lookup joins the counts against a broadcast 1-row
    maximum — no global window over the key axis. Output is
    |SKEW_KEYS| rows. All integer arithmetic.
    """
    parts = []
    for table, key in SKEW_KEYS:
        g = (
            read_table(spark, sf_dir, table, [key])
            .groupBy(F.col(key).alias("k"))
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        stats = g.agg(
            F.sum("c").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.max("c").alias("max_key_rows"),
        )
        top = (
            g.join(
                F.broadcast(stats.select(F.col("max_key_rows").alias("__mx"))),
                F.col("c") == F.col("__mx"),
            )
            .agg(F.min("k").cast("long").alias("top_key"))
        )
        parts.append(
            stats.crossJoin(top).select(
                F.lit(f"{table}.{key}").alias("join_key"),
                "n_rows",
                "n_keys",
                "max_key_rows",
                "top_key",
                F.expr(f"max_key_rows * n_keys * {SKEW_FP} div n_rows").alias(
                    "skew_ratio_fp"
                ),
            )
        )
    out = functools.reduce(DataFrame.unionByName, parts)
    return out.orderBy("join_key")
