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

Durability & replay-idempotency (foreachBatch is at-least-once): state is
VERSIONED — batch ``b`` writes brand-new ``v{b}/items`` + ``v{b}/counts``
dirs derived from the previous version, then flips the ``_LATEST``
pointer (one tiny file: the atomic commit point). A replayed batch whose
id is already committed is skipped; a crash before the pointer flip
leaves the previous version live, and the replay re-derives ``v{b}`` from
it — never a double-count, never a half-written view, and no overwrite
ever touches live data. This is exactly the transaction-log discipline a
lake format (Delta/Iceberg) provides natively; on one of those, the two
writes become MERGE INTO + append inside a single commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_ITEMS_SCHEMA = "order_id long, product_id long"
_COUNTS_SCHEMA = "product_a long, product_b long, n_orders long"


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf), p, jvm


def _latest_version(spark: SparkSession, state_dir: str) -> int:
    """Committed batch id, or -1 before the first commit. Only the
    pointer-missing case means 'empty state' — any other read error is a
    real failure and propagates (silently resetting maintained state to
    empty would be data loss)."""
    fs, p, jvm = _fs(spark, f"{state_dir}/_LATEST")
    if not fs.exists(p):
        return -1
    stream = fs.open(p)
    try:
        data = bytes(stream.readAllBytes())
    finally:
        stream.close()
    return int(data.decode().strip())


def _commit_version(spark: SparkSession, state_dir: str, bid: int) -> None:
    fs, p, jvm = _fs(spark, f"{state_dir}/_LATEST")
    tmp = jvm.org.apache.hadoop.fs.Path(f"{state_dir}/_LATEST.tmp")
    out = fs.create(tmp, True)
    try:
        out.write(str(bid).encode())
    finally:
        out.close()
    fs.delete(p, False)
    if not fs.rename(tmp, p):
        raise RuntimeError(f"could not commit IVM version {bid} at {state_dir}")


def _read_version(
    spark: SparkSession, state_dir: str, version: int, name: str, schema: str
) -> DataFrame:
    if version < 0:
        return spark.createDataFrame([], schema)
    return spark.read.parquet(f"{state_dir}/v{version}/{name}")


def apply_cooccurrence_delta(
    spark: SparkSession, batch: DataFrame, batch_id: int, state_dir: str
) -> None:
    """Fold one micro-batch of (order_id, product_id) into the maintained
    state as version ``batch_id``; no-op if that version is already
    committed (at-least-once replay)."""
    latest = _latest_version(spark, state_dir)
    if batch_id <= latest:
        return  # replayed batch — already committed
    state_items = _read_version(spark, state_dir, latest, "items", _ITEMS_SCHEMA)
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
    counts = _read_version(spark, state_dir, latest, "counts", _COUNTS_SCHEMA)
    merged = counts.join(delta, ["product_a", "product_b"], "full_outer").select(
        "product_a",
        "product_b",
        (
            F.coalesce(F.col("n_orders"), F.lit(0))
            + F.coalesce(F.col("dn"), F.lit(0))
        ).cast("long").alias("n_orders"),
    )
    # new version dirs first (never touching live data), pointer flip last
    merged.write.mode("overwrite").parquet(f"{state_dir}/v{batch_id}/counts")
    state_items.unionByName(new_items).write.mode("overwrite").parquet(
        f"{state_dir}/v{batch_id}/items"
    )
    new_items.unpersist()
    _commit_version(spark, state_dir, batch_id)
    # retire versions older than the previous one (kept as the recovery point)
    fs, root, jvm = _fs(spark, state_dir)
    if latest >= 0:
        for old in range(latest):
            oldp = jvm.org.apache.hadoop.fs.Path(f"{state_dir}/v{old}")
            if fs.exists(oldp):
                fs.delete(oldp, True)


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
            lambda batch, bid: apply_cooccurrence_delta(spark, batch, bid, state_dir)
        )
        .option("checkpointLocation", f"{state_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError(
            "IVM stream did not finish within 600 s — maintained state is "
            "at the last committed version, not the full input"
        )


def maintained_counts(spark: SparkSession, state_dir: str) -> DataFrame:
    version = _latest_version(spark, state_dir)
    return _read_version(spark, state_dir, version, "counts", _COUNTS_SCHEMA)


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
