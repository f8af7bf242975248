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


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-applying an already-committed
    batch id must be a no-op (the versioned pointer-flip guard)."""
    from graphdb_td2_spark.streaming.ivm import apply_cooccurrence_delta

    state = str(tmp_path / "st")
    b0 = spark.createDataFrame([(1, 10), (1, 11)], "order_id long, product_id long")
    b1 = spark.createDataFrame([(1, 12), (2, 20)], "order_id long, product_id long")
    apply_cooccurrence_delta(spark, b0, 0, state)
    apply_cooccurrence_delta(spark, b1, 1, state)
    before = sorted(map(tuple, maintained_counts(spark, state).collect()))
    # replay both batches out of order — both must be skipped
    apply_cooccurrence_delta(spark, b0, 0, state)
    apply_cooccurrence_delta(spark, b1, 1, state)
    after = sorted(map(tuple, maintained_counts(spark, state).collect()))
    assert before == after
    # (10,11) within b0; (10,12),(11,12) cross-batch; (20,·) none
    assert dict(((a, b), n) for a, b, n in after) == {
        (10, 11): 1, (10, 12): 1, (11, 12): 1,
    }


def test_merge_upsert_rejects_duplicate_key_updates(spark, tmp_path):
    import pytest as _pytest

    from graphdb_td2_spark.sources.sinks import merge_upsert_parquet

    path = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], "k long, v string").write.parquet(path)
    dup = spark.createDataFrame([(2, "B"), (2, "BB")], "k long, v string")
    with _pytest.raises(ValueError, match="duplicate key"):
        merge_upsert_parquet(spark, path, dup, keys=["k"])
