"""Incremental view maintenance (IVM) for the co-occurrence pair counts —
the materialized view behind ``/recs`` kept fresh WITHOUT recomputing the
self-join over history (``top_cooccurrence_pairs`` recomputes; this
maintains).

The delta algebra of a self-join aggregate: when a micro-batch adds items
ΔI to the accumulated item set I, the new pairs are

    Δpairs = (ΔI ⋈ I on order)  ∪  (ΔI ⋈ ΔI on order, a < b)

i.e. cross-batch pairs against STATE plus within-batch pairs — so an
order whose items straddle micro-batches still counts every pair exactly
once. Counts are additive, so the view merge is a full-outer sum.

State lives as two parquet dirs (items, counts) maintained by
``foreachBatch`` with staged rewrites (same no-self-overwrite discipline
as ``sources/sinks.py:merge_upsert_parquet``); on a transaction-log
format both merges become ``MERGE INTO``/append and the shapes are
unchanged. At 100 TB the items state is order-partitioned so the
per-batch join touches only the orders present in the batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _write_staged(df: DataFrame, path: str) -> None:
    spark = df.sparkSession
    tmp = path.rstrip("/") + "__stage"
    df.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(path)
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(tmp)
    p.getFileSystem(conf).delete(p, True)


def _read_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    try:
        return spark.read.parquet(path)
    except Exception:
        return spark.createDataFrame([], schema)


def apply_cooccurrence_delta(
    spark: SparkSession, batch: DataFrame, state_dir: str
) -> None:
    """Fold one micro-batch of (order_id, product_id) into the maintained
    items/counts state."""
    items_path = f"{state_dir}/items"
    counts_path = f"{state_dir}/counts"
    state_items = _read_or_empty(
        spark, items_path, "order_id long, product_id long"
    )
    # new items only: MERGE-dedup against both the batch and the state
    batch_items = batch.select("order_id", "product_id").distinct()
    new_items = batch_items.join(
        state_items, ["order_id", "product_id"], "left_anti"
    ).persist()

    def as_pair(a, b):
        return [
            F.least(a, b).alias("product_a"),
            F.greatest(a, b).alias("product_b"),
        ]

    cross = (
        new_items.alias("n")
        .join(state_items.alias("s"), F.col("n.order_id") == F.col("s.order_id"))
        .filter(F.col("n.product_id") != F.col("s.product_id"))
        .select(*as_pair(F.col("n.product_id"), F.col("s.product_id")))
    )
    within = (
        new_items.alias("x")
        .join(
            new_items.alias("y"),
            (F.col("x.order_id") == F.col("y.order_id"))
            & (F.col("x.product_id") < F.col("y.product_id")),
        )
        .select(*as_pair(F.col("x.product_id"), F.col("y.product_id")))
    )
    delta = (
        cross.unionByName(within)
        .groupBy("product_a", "product_b")
        .agg(F.count(F.lit(1)).alias("dn"))
    )
    counts = _read_or_empty(
        spark, counts_path, "product_a long, product_b long, n_orders long"
    )
    merged = (
        counts.join(delta, ["product_a", "product_b"], "full_outer")
        .select(
            "product_a",
            "product_b",
            (
                F.coalesce(F.col("n_orders"), F.lit(0))
                + F.coalesce(F.col("dn"), F.lit(0))
            ).cast("long").alias("n_orders"),
        )
    )
    _write_staged(merged, counts_path)
    _write_staged(state_items.unionByName(new_items), items_path)
    new_items.unpersist()


def run_incremental_cooccurrence(
    spark: SparkSession, stream_dir: str, state_dir: str, schema
) -> None:
    """Drive the IVM from a file stream of lineitem-shaped parquet,
    one file per micro-batch (availableNow → runs to completion)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
        .select(
            F.col("l_orderkey").alias("order_id"),
            F.col("l_partkey").alias("product_id"),
        )
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda batch, _bid: apply_cooccurrence_delta(spark, batch, state_dir)
        )
        .option("checkpointLocation", f"{state_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)


def maintained_counts(spark: SparkSession, state_dir: str) -> DataFrame:
    return spark.read.parquet(f"{state_dir}/counts")


# Session-scoped IVM state (one maintenance run per (application, sf_dir);
# registry re-invocations read the maintained view, they don't re-stream).
_IVM_CACHE: dict[tuple[str, str], str] = {}


def ivm_cooccurrence_top20(
    spark: SparkSession, sf_dir: str, k: int = 20
) -> DataFrame:
    """Registry entry: maintain the co-occurrence view INCREMENTALLY (the
    corpus streamed in single-file micro-batches with orders straddling
    batch boundaries), then top-k it. The oracle is the plain batch SQL —
    IVM correctness means the maintained view is indistinguishable from a
    recompute, which is exactly what the value-hash asserts."""
    import tempfile

    from ..io import read_table

    key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"))
    state_dir = _IVM_CACHE.get(key)
    if state_dir is None:
        li = read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
        root = tempfile.mkdtemp(prefix="spark_ivm_")
        stream_dir = f"{root}/stream"
        li.repartition(4).write.parquet(stream_dir)
        state_dir = f"{root}/state"
        run_incremental_cooccurrence(spark, stream_dir, state_dir, schema=li.schema)
        _IVM_CACHE[key] = state_dir
    return (
        maintained_counts(spark, state_dir)
        .filter(F.col("n_orders") > 0)
        .orderBy(F.desc("n_orders"), F.asc("product_a"), F.asc("product_b"))
        .limit(k)
    )
