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


def test_merge_upsert_rejects_null_key_updates(spark, tmp_path):
    """A single NULL-key update row used to trip the duplicate-key check
    (count_distinct skips NULLs); it must get its own dedicated error."""
    import pytest as _pytest

    from graphdb_td2_spark.sources.sinks import merge_upsert_parquet

    path = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], "k long, v string").write.parquet(path)
    nullrow = spark.createDataFrame([(None, "B")], "k long, v string")
    with _pytest.raises(ValueError, match="NULL"):
        merge_upsert_parquet(spark, path, nullrow, keys=["k"])


def test_untouched_buckets_not_rewritten(spark, tmp_path):
    """The 100 TB property: a micro-batch rewrites ONLY the state buckets
    its delta touches. Batch 1 inserts a single order; its version dir must
    contain a strict subset of buckets and the final manifest must inherit
    every untouched bucket from version 0's files (which still exist,
    unmodified)."""
    import json

    from graphdb_td2_spark.streaming.ivm import (
        _fs,
        _read_manifest,
        apply_cooccurrence_delta,
    )

    state = str(tmp_path / "st")
    # batch 0: many orders → populates many item/count buckets
    b0 = spark.createDataFrame(
        [(o, p) for o in range(1, 41) for p in (o * 10, o * 10 + 1)],
        "order_id long, product_id long",
    )
    apply_cooccurrence_delta(spark, b0, 0, state)
    m0 = _read_manifest(spark, state, 0)
    assert len(m0["items"]) > 4  # the fixture really does spread out

    # batch 1: ONE order → touches at most one item bucket + one count bucket
    b1 = spark.createDataFrame([(1000, 5), (1000, 6)], "order_id long, product_id long")
    apply_cooccurrence_delta(spark, b1, 1, state)
    m1 = _read_manifest(spark, state, 1)

    v1_item_buckets = {k for k, rel in m1["items"].items() if rel.startswith("v1/")}
    inherited = {k for k, rel in m1["items"].items() if rel.startswith("v0/")}
    assert len(v1_item_buckets) == 1  # only the touched bucket was rewritten
    assert inherited == set(m0["items"]) - v1_item_buckets
    v1_count_buckets = {k for k, rel in m1["counts"].items() if rel.startswith("v1/")}
    assert len(v1_count_buckets) == 1

    # inherited bucket files physically survive (GC kept everything the
    # current manifest references)
    fs, _, jvm = _fs(spark, state)
    for k in inherited:
        p = jvm.org.apache.hadoop.fs.Path(f"{state}/{m1['items'][k]}")
        assert fs.exists(p)

    # and the maintained view is still the full batch answer
    got = dict(
        ((r["product_a"], r["product_b"]), r["n_orders"])
        for r in maintained_counts(spark, state).collect()
    )
    assert got[(5, 6)] == 1
    assert got[(10, 11)] == 1
    assert len(got) == 41


def test_lost_pointer_raises_instead_of_empty_replay(spark, tmp_path):
    """A missing _LATEST with committed versions present is corruption
    (silently rebuilding from empty would undercount) — it must raise, not
    return 'empty state'."""
    import pytest as _pytest

    from graphdb_td2_spark.streaming.ivm import _fs, apply_cooccurrence_delta

    state = str(tmp_path / "st")
    b0 = spark.createDataFrame([(1, 10), (1, 11)], "order_id long, product_id long")
    apply_cooccurrence_delta(spark, b0, 0, state)
    fs, p, jvm = _fs(spark, f"{state}/_LATEST")
    fs.delete(p, False)  # simulate the crash-between-delete-and-rename gap
    with _pytest.raises(RuntimeError, match="no _LATEST pointer"):
        maintained_counts(spark, state)
    # a brand-new state dir still reads as genuinely empty
    fresh = str(tmp_path / "fresh")
    assert maintained_counts(spark, fresh).count() == 0
