"""SQL entry point [extension] — the engine is DataFrame-first, but a
reference user coming from Cypher/SQL gets the full ``spark.sql`` surface
over the same corpus: ``register_corpus_views`` exposes every table as a
temp view (through the same reader layer, so TIMESTAMP(NANOS) handling
and column pruning behave identically), and queries are plain ANSI SQL
strings that Catalyst plans exactly like their DataFrame twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import read_table
from ..schemas import TABLE_NAMES


def register_corpus_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a session temp view named after the
    table (idempotent; re-registering swaps in the new sf_dir)."""
    for t in TABLE_NAMES:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)


def sql_brand_order_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-SQL query over the registered views: per brand, the share of
    all orders that contain at least one of its parts — a semi-join +
    window expressed as the SQL a migrating user would write. The plan is
    the same Catalyst output the DataFrame API yields (scan pruning,
    broadcast part dim, partial aggs)."""
    register_corpus_views(spark, sf_dir)
    return spark.sql(
        """
        WITH brand_orders AS (
          SELECT p.p_brand, COUNT(DISTINCT l.l_orderkey) AS n_orders
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          GROUP BY p.p_brand
        ),
        total AS (SELECT COUNT(DISTINCT o_orderkey) AS n_total FROM orders)
        SELECT b.p_brand,
               b.n_orders,
               CAST(b.n_orders AS DOUBLE) / CAST(t.n_total AS DOUBLE)
                 AS order_share
        FROM brand_orders b CROSS JOIN total t
        ORDER BY b.n_orders DESC, b.p_brand
        """
    )


def order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped CORRELATED SUBQUERY: per order priority, how many
    orders had at least one late shipment — ``EXISTS`` referencing BOTH
    the outer key and the outer order date (a genuine correlated
    predicate, not a plain key semi-join; the corpus carries no
    commit/receipt dates, so lateness is ship > order date + 60 days).

    Catalyst decorrelates the EXISTS into a left-semi join with the date
    condition pulled into the join predicate — the plan a hand-written
    semi-join would get, scans pruned to the three referenced columns.
    That rewrite is the operator under test here."""
    register_corpus_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_late_orders
        FROM orders o
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


def sales_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the generalized form of ROLLUP/CUBE (both covered
    elsewhere): region-level totals, market-segment-level totals, and the
    grand total in ONE aggregation pass (Catalyst expands the sets and
    hash-aggregates once), instead of three unioned jobs. SQL-only
    surface in Spark's DataFrame-free form, hence it lives here."""
    register_corpus_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT r.r_name,
               c.c_mktsegment,
               CAST(GROUPING(r.r_name) * 2 + GROUPING(c.c_mktsegment) AS BIGINT)
                 AS grouping_id,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                 AS total_sales
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY GROUPING SETS ((r.r_name), (c.c_mktsegment), ())
        ORDER BY grouping_id, r_name NULLS FIRST, c_mktsegment NULLS FIRST
        """
    )


def lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(c_custkey, o_orderkey, o_totalprice_cents,
    rnk)`` — each of the 20 highest-spend customers with their top-2
    orders by price, written as a CORRELATED LATERAL subquery (the
    SQL:2016 `LATERAL` a migrating user reaches for before learning
    window functions; Catalyst decorrelates it into the same
    window/join plan).

    Determinism: spend and prices go through exact cents; every LIMIT
    carries a total order (price DESC, orderkey ASC; spend DESC,
    custkey ASC). Scale notes: decorrelation turns the per-row
    subquery into one shuffle on custkey — no nested-loop re-execution;
    the outer top-20 compiles to TakeOrderedAndProject.
    """
    register_corpus_views(spark, sf_dir)
    return spark.sql(
        """
        WITH spend AS (
          SELECT o_custkey AS c_custkey,
                 SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT))
                   AS spend_cents
          FROM orders GROUP BY o_custkey
          ORDER BY spend_cents DESC, c_custkey ASC LIMIT 20
        )
        SELECT s.c_custkey, t.o_orderkey, t.cents AS o_totalprice_cents, t.rnk
        FROM spend s,
        LATERAL (
          SELECT o_orderkey,
                 CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
                   AS cents,
                 CAST(row_number() OVER (
                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rnk
          FROM orders o
          WHERE o.o_custkey = s.c_custkey
          ORDER BY cents DESC, o_orderkey ASC LIMIT 2
        ) t
        ORDER BY s.c_custkey, t.rnk
        """
    )
