"""RFM (recency / frequency / monetary) customer segmentation — the
classic BI rollup a marketing stack runs over the order history, as one
exact-integer pipeline.

Buckets use fixed integer breakpoints (days / order counts / cents), so
segment assignment is pure integer comparison and the segment profile is
bit-identical across engines and partitionings; monetary sums are exact
``floor(price·100)`` cents.

Scale notes: one groupBy(customer) over orders (map-side partials; the
per-customer frame is orders-sized, never joined to facts again), a
1-row reference-date broadcast, then a segment rollup whose output is
bounded by the 4³ bucket grid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..io import read_table

R_BREAKS = (30, 90, 365)  # days since last order
F_BREAKS = (2, 5, 10)  # order count
M_BREAKS = (100_00, 1_000_00, 10_000_00)  # lifetime cents


def _bucket(col: Column, breaks: tuple[int, ...]) -> Column:
    out = F.lit(len(breaks)).cast("long")
    for i, b in sorted(enumerate(breaks), reverse=True):
        out = F.when(col <= b, F.lit(i).cast("long")).otherwise(out)
    return out


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(r_bucket, f_bucket, m_bucket, n_customers,
    total_cents)`` — customer counts and lifetime value per RFM cell,
    ordered by the three buckets."""
    orders = read_table(
        spark, sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"]
    )
    ref = orders.agg(F.max("o_orderdate").alias("ref_date"))
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        .join(F.broadcast(ref))
        .select(
            _bucket(
                F.datediff(F.col("ref_date"), F.col("last_order")).cast("long"),
                R_BREAKS,
            ).alias("r_bucket"),
            _bucket(F.col("n_orders"), F_BREAKS).alias("f_bucket"),
            _bucket(F.col("cents"), M_BREAKS).alias("m_bucket"),
            "cents",
        )
    )
    return (
        per_cust.groupBy("r_bucket", "f_bucket", "m_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
        .orderBy("r_bucket", "f_bucket", "m_bucket")
    )
