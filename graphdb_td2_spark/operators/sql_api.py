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
