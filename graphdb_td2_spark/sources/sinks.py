"""Sink layer (SURVEY.md §2.A rows A5/A9 re-expressed for a lake).

The reference's only sinks are Cypher MERGE writes and a JSON HTTP body
(``app/etl.py:75-77``, ``app/main.py:62-69``). The lake-native equivalents:

- ``write_partitioned``: hive-style partitioned parquet — partition
  pruning for every downstream reader (the 100 TB layout: e.g. ``events``
  partitioned by event date).
- ``write_sorted_buckets``: bucketed + sorted table write — co-located,
  pre-sorted join sides so repeated joins on the bucket key skip both the
  exchange and the sort (the Spark analogue of the reference's lookup
  indexes, ``app/queries.cypher:19-29``).
- ``to_json_items``: the ``/recs`` HTTP result shape (A9) from any
  top-k DataFrame, at the driver, for API parity.

Scale notes: ``write_partitioned`` repartitions by the partition columns
first so each task writes one file per partition instead of
files × tasks fragments; bucketed writes shuffle once on the bucket key
and amortize it across every later join.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned parquet write, pre-shuffled so each output
    partition is a small number of whole files (not task-count fragments)."""
    (
        df.repartition(*[F.col(c) for c in partition_by])
        .write.mode(mode)
        .partitionBy(*partition_by)
        .parquet(path)
    )


def write_sorted_buckets(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sorted) managed-table write. Joins between
    tables bucketed the same way on the same key are exchange-free."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)


def to_json_items(df: DataFrame, started_at: float | None = None) -> dict:
    """The reference's ``/recs`` response shape (``app/main.py:62-69,
    134-135``): ``{"items": [...], "took_ms": int}``. Collect is bounded —
    callers pass top-k frames."""
    t0 = started_at if started_at is not None else time.time()
    items = [row.asDict(recursive=True) for row in df.collect()]
    return {"items": items, "took_ms": int((time.time() - t0) * 1000)}


def compact_parquet_dir(
    spark,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction — the maintenance job every long-lived lake
    table needs (streaming sinks and per-batch appends fragment into
    thousands of KB-sized files; scan planning cost then dominates reads).

    Sizes the output by the SOURCE's on-disk bytes (compressed), so the
    rewrite targets ``target_file_bytes`` per output file. Returns the
    number of files written. Uses coalesce (no shuffle) — compaction
    must be IO-bound, not a reshuffle of 100 TB.
    """
    import math

    df = spark.read.parquet(src_path)
    # distinct source files + their sizes via the Hadoop FS of the session
    # (driver-side metadata listing, no data read)
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = path.getFileSystem(conf)
    total = 0
    it = fs.listFiles(path, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.endswith(".parquet"):
            total += f.getLen()
    n_files = max(1, math.ceil(total / target_file_bytes))
    # coalesce can only SHRINK the partition count; when the target exceeds
    # the read parallelism (splitting few big files into many), repartition
    out = (
        df.coalesce(n_files)
        if n_files <= df.rdd.getNumPartitions()
        else df.repartition(n_files)
    )
    out.write.mode("overwrite").parquet(dst_path)
    return n_files


def staged_overwrite(df: DataFrame, target_path: str, stage_path: str) -> int:
    """Materialize ``df`` into ``stage_path``, then copy it over
    ``target_path``; returns the row count. The stage breaks the
    read-your-own-overwrite race (the plan reading the target cannot feed
    an overwrite of the target) and is the recovery point if the final
    copy fails — but plain parquet has NO atomic dir swap, so a crash
    DURING the final overwrite still leaves the target partial (recover
    from the stage dir, which is only cleaned up on success). A
    transaction-log format removes that window entirely; the versioned
    pointer-flip in ``streaming/ivm.py`` is the no-log workaround."""
    spark = df.sparkSession
    df.write.mode("overwrite").parquet(stage_path)
    staged = spark.read.parquet(stage_path)
    n = staged.count()
    staged.write.mode("overwrite").parquet(target_path)
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(stage_path)
    p.getFileSystem(conf).delete(p, True)
    return n


def merge_upsert_parquet(
    spark,
    target_path: str,
    updates: DataFrame,
    keys: list[str],
) -> int:
    """Batch MERGE upsert into a parquet directory — the lake-at-rest
    analogue of the reference's Cypher ``MERGE`` (D4): rows whose keys
    match are replaced by the update, new keys append, untouched rows
    survive. Returns the resulting row count.

    The updates batch must be unique per key (MERGE's one-row-per-key
    contract) — enforced here with an explicit check rather than a silent
    arbitrary-winner dedup, because which duplicate should win is
    caller-specific (pre-aggregate with ``max_by`` over your ordering).

    Mechanics: target left-anti updates on the keys, union the updates,
    ``staged_overwrite`` rewrite (see its docstring for the exact
    durability guarantees). The anti-join is broadcast when the update
    batch is dimension-sized — the common case for incremental loads; a
    transaction-log format replaces the rewrite with MERGE INTO at scale.
    """
    import functools
    import operator

    from pyspark.sql import functions as F  # noqa: F811 (local clarity)

    # one job: group by the keys, then check (a) no group repeats and
    # (b) no group carries a NULL key. count_distinct would skip NULL keys
    # and mis-report a single NULL-key row as a duplicate; NULL keys are
    # rejected outright because they can never anti-join-match the target.
    any_null = functools.reduce(
        operator.or_, [F.col(k).isNull() for k in keys]
    )
    stats = (
        updates.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.max("c").alias("max_c"),
            F.sum(F.when(any_null, 1).otherwise(0)).alias("null_key_groups"),
        )
        .first()
    )
    if stats["null_key_groups"]:
        raise ValueError(
            f"updates batch has rows with NULL in key columns {keys}; "
            "MERGE keys must be non-null (a NULL key can never match a "
            "target row)"
        )
    if (stats["max_c"] or 0) > 1:
        raise ValueError(
            f"updates batch has duplicate key rows on {keys}; MERGE needs "
            "one row per key — pre-aggregate with a deterministic "
            "last-write-wins first"
        )
    target = spark.read.parquet(target_path)
    merged = target.join(
        F.broadcast(updates.select(*keys).distinct()), keys, "left_anti"
    ).unionByName(updates)
    return staged_overwrite(
        merged, target_path, target_path.rstrip("/") + "__merge_tmp"
    )


def lake_health_report(spark, lake_dir: str) -> "DataFrame":
    """Per-table lake health from FS METADATA only (no data read) — the
    maintenance dashboard feeding ``compact_parquet_dir``: for every
    first-level table directory under ``lake_dir``, file counts, byte
    totals, the small-file count (< 1/4 of the 128 MiB target — the
    fragmentation signal), and the Hive-partition directory count.

    Same Hadoop-FS recursive listing as compaction, so it works on any
    FileSystem implementation the session can reach (local, HDFS, S3A);
    cost is one driver-side metadata sweep — the operation every lake
    catalog performs, never proportional to data bytes.
    """
    import os

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(lake_dir)
    fs = root.getFileSystem(conf)
    rows = []
    for st in fs.listStatus(root):
        if not st.isDirectory():
            continue
        table = st.getPath().getName()
        n_files = total = small = biggest = 0
        partitions = set()
        it = fs.listFiles(st.getPath(), True)
        while it.hasNext():
            f = it.next()
            name = f.getPath().getName()
            if not name.endswith(".parquet"):
                continue
            n_files += 1
            sz = f.getLen()
            total += sz
            biggest = max(biggest, sz)
            if sz < 128 * 1024 * 1024 // 4:
                small += 1
            parent = f.getPath().getParent().getName()
            if "=" in parent:
                partitions.add(parent)
        rows.append(
            (table, n_files, total, small, biggest, len(partitions))
        )
    return spark.createDataFrame(
        sorted(rows),
        "table string, n_files long, total_bytes long, n_small_files long, "
        "max_file_bytes long, n_partitions long",
    )


def export_training_shards(
    df: "DataFrame",
    path: str,
    key_col: str,
    n_shards: int = 16,
) -> dict:
    """Training-data export: write ``df`` as ``n_shards`` hash-assigned
    parquet shard directories plus a ``manifest.json`` with per-shard
    row counts and an order-insensitive content checksum (xor of the
    key's md5 head) — the artifact a trainer's data loader validates
    before streaming shards independently.

    Shard assignment is the engine's md5-bucket idiom (stable across
    reruns, partitionings, and engines — NOT hash(), which is
    seed/implementation-defined), so a re-export of identical data is
    byte-for-byte re-verifiable against the old manifest.
    """
    import json as _json
    from pathlib import Path as _Path

    from pyspark.sql import functions as F

    from ..functions.sampling import hash_bucket

    sharded = df.withColumn("__shard", hash_bucket(F.col(key_col), n_shards))
    sharded.write.mode("overwrite").partitionBy("__shard").parquet(path)
    spark = df.sparkSession
    stats = (
        spark.read.parquet(path)
        .groupBy("__shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.expr(
                f"bit_xor(CAST(conv(substring(md5(CAST({key_col} AS STRING)), 1, 15), 16, 10) AS BIGINT))"
            ).alias("checksum"),
        )
        .collect()
    )
    manifest = {
        "n_shards": n_shards,
        "key_col": key_col,
        "shards": {
            int(r["__shard"]): {"n_rows": r["n_rows"], "checksum": int(r["checksum"])}
            for r in stats
        },
        "total_rows": int(sum(r["n_rows"] for r in stats)),
    }
    (_Path(path) / "manifest.json").write_text(_json.dumps(manifest, indent=2))
    return manifest
