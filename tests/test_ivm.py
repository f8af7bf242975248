"""IVM correctness: streaming the lineitem corpus through in single-file
micro-batches must maintain EXACTLY the counts a batch recompute of the
co-occurrence self-join produces — including orders whose items straddle
micro-batch boundaries (the cross-batch delta term)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_td2_spark.io import read_table
from graphdb_td2_spark.streaming.ivm import (
    maintained_counts,
    run_incremental_cooccurrence,
)


def test_incremental_matches_batch_recompute(spark, sf_dir, tmp_path):
    li = read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    # fragment into 4 files; hash partitioning scatters each order's items
    # across batches, forcing the cross-batch pair path
    stream_dir = str(tmp_path / "stream")
    li.repartition(4).write.parquet(stream_dir)
    state_dir = str(tmp_path / "state")

    run_incremental_cooccurrence(
        spark, stream_dir, state_dir, schema=li.schema
    )

    got = {
        (r["product_a"], r["product_b"]): r["n_orders"]
        for r in maintained_counts(spark, state_dir).collect()
    }
    items = li.select(
        F.col("l_orderkey").alias("order_id"), F.col("l_partkey").alias("product_id")
    ).distinct()
    a, b = items.alias("a"), items.alias("b")
    expected = {
        (r["product_a"], r["product_b"]): r["n_orders"]
        for r in a.join(
            b,
            (F.col("a.order_id") == F.col("b.order_id"))
            & (F.col("a.product_id") < F.col("b.product_id")),
        )
        .groupBy(
            F.col("a.product_id").alias("product_a"),
            F.col("b.product_id").alias("product_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .collect()
    }
    got = {k: v for k, v in got.items() if v > 0}
    assert got == expected
