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

State layout (the 100 TB posture): both state relations are HASH-
PARTITIONED — ``items`` by ``order_id`` into ``bucket=K`` dirs, ``counts``
by ``(product_a, product_b)`` — and each version carries a MANIFEST
mapping bucket → the parquet dir that last wrote it. A micro-batch only
reads and rewrites the buckets its delta touches; untouched buckets are
inherited by manifest reference from earlier versions, so per-batch I/O is
O(Δ · fanout/n_buckets), not O(state). (Items partitioned by order_id
alone keeps BOTH state joins bucket-prunable: the dedup anti-join and the
cross-batch join each only involve state rows sharing an order_id with the
batch, and those all live in the batch's order buckets.) This is exactly
the file-pruning discipline a lake format's MERGE gives; the manifest is
the no-txn-log stand-in.

Durability & replay-idempotency (foreachBatch is at-least-once): batch
``b`` writes brand-new ``v{b}`` bucket dirs + manifest, writes a
``_COMMITTED`` marker, then flips the ``_LATEST`` pointer (one tiny file:
the atomic commit point). A replayed batch whose id is already committed
is skipped; a crash before the pointer flip leaves the previous version
live and the replay re-derives ``v{b}`` from it — never a double-count,
never a half-written view. The markers also make pointer LOSS detectable:
``_latest_version`` treats a missing ``_LATEST`` as "empty state" ONLY
when no ``_COMMITTED`` marker exists; committed versions with no pointer
raise instead of silently replaying from empty (which would undercount).
Garbage collection runs after each commit and deletes only bucket dirs
referenced by neither the new nor the previous manifest (the previous
version stays intact as the crash-recovery point).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F

_ITEMS_SCHEMA = "order_id long, product_id long"
_COUNTS_SCHEMA = "product_a long, product_b long, n_orders long"
N_BUCKETS = 16


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf), p, jvm


def _latest_version(spark: SparkSession, state_dir: str) -> int:
    """Committed batch id, or -1 before the first commit. Distinguishes
    never-initialized from pointer-lost: a missing ``_LATEST`` with
    committed version dirs present is CORRUPTION (replaying from empty
    would silently undercount) and raises; only a state dir with no
    ``_COMMITTED`` markers at all means genuinely empty."""
    fs, p, jvm = _fs(spark, f"{state_dir}/_LATEST")
    if not fs.exists(p):
        markers = fs.globStatus(
            jvm.org.apache.hadoop.fs.Path(f"{state_dir}/v*/_COMMITTED")
        )
        if markers is not None and len(markers) > 0:
            raise RuntimeError(
                f"IVM state at {state_dir} has committed versions but no "
                "_LATEST pointer — the pointer was lost (crash between "
                "delete and rename, or manual tampering). Refusing to "
                "treat maintained state as empty; restore _LATEST to the "
                "highest committed version to recover."
            )
        return -1
    stream = fs.open(p)
    try:
        data = bytes(stream.readAllBytes())
    finally:
        stream.close()
    return int(data.decode().strip())


def _write_small_file(spark: SparkSession, path: str, data: bytes) -> None:
    fs, p, jvm = _fs(spark, path)
    out = fs.create(p, True)
    try:
        out.write(data)
    finally:
        out.close()


def _commit_version(
    spark: SparkSession, state_dir: str, bid: int, manifest_bytes: bytes
) -> None:
    """Marker first, pointer flip last. The delete+rename pair is not
    atomic on every FS, but a crash in the gap now leaves the _COMMITTED
    marker behind and ``_latest_version`` raises instead of silently
    rebuilding from empty.

    Concurrent-writer guard (BEST-EFFORT detection, not prevention — there
    is no lock service here): the marker is created with overwrite=False —
    an atomic create-if-absent. If another attempt (speculative retry, a
    second maintainer) already committed this version, the create fails;
    we then require the on-disk manifest to be JSON-identical to ours. A
    mismatch means two writers derived DIFFERENT state for the same batch
    id (e.g. different n_buckets, or different base versions) — that
    raises rather than letting the last pointer flip silently pick a
    winner. Two writers racing BEFORE either commits can still interleave
    data writes; the manifest create-if-absent in ``_publish_version`` plus
    the ``_COMMITTED`` pre-check in ``apply_cooccurrence_delta`` guarantee
    the loser raises loudly — the pointer never flips over divergent state
    undetected, but a detected divergence requires deleting ``v{bid}`` and
    re-running the batch."""
    fs0, marker, jvm0 = _fs(spark, f"{state_dir}/v{bid}/_COMMITTED")
    try:
        out = fs0.create(marker, False)
        try:
            out.write(b"1")
        finally:
            out.close()
    except Exception:
        if not fs0.exists(marker):
            raise  # real I/O failure, not a lost race
        mf = jvm0.org.apache.hadoop.fs.Path(f"{state_dir}/v{bid}/manifest.json")
        stream = fs0.open(mf)
        try:
            existing = bytes(stream.readAllBytes())
        finally:
            stream.close()
        if json.loads(existing.decode()) != json.loads(manifest_bytes.decode()):
            raise RuntimeError(
                f"IVM version v{bid} at {state_dir} was committed by a "
                "concurrent writer with a DIFFERENT manifest — two "
                "maintainers produced divergent state for the same batch "
                "id. Refusing to flip the pointer over it."
            )
        # same manifest → the other writer did identical work; the pointer
        # flip below is idempotent, fall through so a crash after ITS
        # marker but before ITS flip still completes the commit
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


def _publish_version(
    spark: SparkSession, state_dir: str, bid: int, payload: bytes
) -> None:
    """Write ``v{bid}/manifest.json`` with create-if-absent, then commit.

    The create-if-absent is the divergence tripwire for writers racing
    before either has committed: the loser's create fails, and if the
    winner's manifest differs this raises instead of publishing —
    complementing the post-marker compare in :func:`_commit_version`."""
    fs, mf, jvm = _fs(spark, f"{state_dir}/v{bid}/manifest.json")
    try:
        out = fs.create(mf, False)
        try:
            out.write(payload)
        finally:
            out.close()
    except Exception:
        if not fs.exists(mf):
            raise  # real I/O failure, not a lost race
        stream = fs.open(mf)
        try:
            existing = bytes(stream.readAllBytes())
        finally:
            stream.close()
        if json.loads(existing.decode()) != json.loads(payload.decode()):
            raise RuntimeError(
                f"IVM version v{bid} at {state_dir} already has a manifest "
                "from a concurrent writer that DIVERGES from this run's — "
                "two maintainers derived different state for the same batch "
                "id. Refusing to publish; delete the uncommitted v{bid} dir "
                "and re-run the batch."
            )
    _commit_version(spark, state_dir, bid, payload)


def _committed_manifest_bytes(
    spark: SparkSession, state_dir: str, bid: int
) -> bytes | None:
    """The manifest bytes of an already-committed (marker present) version
    ``bid``, or None when no ``_COMMITTED`` marker exists."""
    fs, marker, jvm = _fs(spark, f"{state_dir}/v{bid}/_COMMITTED")
    if not fs.exists(marker):
        return None
    mf = jvm.org.apache.hadoop.fs.Path(f"{state_dir}/v{bid}/manifest.json")
    stream = fs.open(mf)
    try:
        return bytes(stream.readAllBytes())
    finally:
        stream.close()


def _read_manifest(spark: SparkSession, state_dir: str, version: int) -> dict:
    """Manifest of a version: {"items": {bucket: relpath}, "counts": {...}}
    with paths relative to ``state_dir`` (state dirs are relocatable)."""
    if version < 0:
        return {"items": {}, "counts": {}, "n_buckets": None}
    fs, p, jvm = _fs(spark, f"{state_dir}/v{version}/manifest.json")
    stream = fs.open(p)
    try:
        return json.loads(bytes(stream.readAllBytes()).decode())
    finally:
        stream.close()


def _read_buckets(
    spark: SparkSession,
    state_dir: str,
    manifest_part: dict,
    schema: str,
    buckets: list[int] | None = None,
) -> DataFrame:
    """Union-read the parquet dirs of the selected buckets (all buckets
    when ``buckets`` is None). The bucket id is directory-encoded, not a
    data column, so reads pin the data schema explicitly."""
    keys = (
        sorted(manifest_part)
        if buckets is None
        else [str(b) for b in sorted(buckets) if str(b) in manifest_part]
    )
    paths = [f"{state_dir}/{manifest_part[k]}" for k in keys]
    if not paths:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*paths)


def _touched(df: DataFrame) -> list[int]:
    """Distinct bucket ids in a delta frame — a ≤N_BUCKETS-row collect
    (bucket metadata, not data)."""
    return sorted(r[0] for r in df.select("bucket").distinct().collect())


# -- in-memory state cache (replay-speed optimization, never a
# correctness dependency) -----------------------------------------------
#
# Each micro-batch's jobs scan the accumulated state several times (the
# dedup anti-join, the cross-batch pair join, and the items rewrite all
# consume it); without a cache every scan re-reads the state parquet.
# The cache holds each part's FULL state for the committed version as
# one persisted (memory-and-disk) DataFrame whose lineage is a flat
# multi-path parquet scan of the manifest's bucket dirs — nothing ever
# references a foreachBatch frame past its batch, and lineage never
# grows. The bucket id is recomputed (same pmod(hash) that assigned the
# dirs) so pruned requests filter in memory; a commit simply DROPS the
# cache and the next batch rebuilds from the new manifest — one
# materializing scan per batch instead of three-plus. A version mismatch
# (external writer, fresh process) behaves the same way, so durability
# and replay semantics are untouched. (At lake scale the win shifts
# from I/O to scan reuse; the parquet bucket pruning path below remains
# the source of truth whenever the cache is cold.)
_MEM_STATE: dict[str, dict] = {}


def _mem_drop(state_dir: str) -> None:
    cache = _MEM_STATE.pop(state_dir, None)
    if cache is None:
        return
    cache["items"].unpersist(False)
    cache["counts"].unpersist(False)


def _mem_ensure(
    spark: SparkSession,
    state_dir: str,
    version: int,
    manifest: dict,
    n_buckets: int,
) -> dict:
    cache = _MEM_STATE.get(state_dir)
    if cache is not None and cache["version"] == version:
        return cache
    _mem_drop(state_dir)
    from pyspark import StorageLevel

    items = _read_buckets(
        spark, state_dir, manifest["items"], _ITEMS_SCHEMA
    ).withColumn("bucket", F.pmod(F.hash("order_id"), F.lit(n_buckets)))
    counts = _read_buckets(
        spark, state_dir, manifest["counts"], _COUNTS_SCHEMA
    ).withColumn(
        "bucket", F.pmod(F.hash("product_a", "product_b"), F.lit(n_buckets))
    )
    cache = {
        "version": version,
        "items": items.persist(StorageLevel.MEMORY_AND_DISK),
        "counts": counts.persist(StorageLevel.MEMORY_AND_DISK),
    }
    _MEM_STATE[state_dir] = cache
    return cache


def _mem_state_part(
    spark: SparkSession,
    state_dir: str,
    version: int,
    manifest: dict,
    part: str,
    schema: str,
    buckets: list[int] | None,
    n_buckets: int,
) -> DataFrame:
    """State rows of ``part`` restricted to ``buckets``, served from the
    persisted full-state cache (built lazily from ``manifest`` on miss)."""
    cache = _mem_ensure(spark, state_dir, version, manifest, n_buckets)
    df = cache[part]
    if buckets is not None:
        df = df.filter(F.col("bucket").isin(buckets))
    return df.drop("bucket")


def apply_cooccurrence_delta(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    state_dir: str,
    n_buckets: int = N_BUCKETS,
) -> None:
    """Fold one micro-batch of (order_id, product_id) into the maintained
    state as version ``batch_id``; no-op if that version is already
    committed (at-least-once replay). Only state buckets the batch touches
    are read and rewritten; the rest are inherited via the manifest."""
    latest = _latest_version(spark, state_dir)
    if batch_id <= latest:
        return  # replayed batch — already committed
    committed = _committed_manifest_bytes(spark, state_dir, batch_id)
    if committed is not None:
        # another writer fully committed this version but crashed between
        # its marker and its pointer flip — complete ITS commit from the
        # on-disk manifest instead of clobbering its data dirs with a
        # re-derivation (the guard ADVICE flagged: never overwrite a
        # committed version's buckets)
        _commit_version(spark, state_dir, batch_id, committed)
        return
    manifest = _read_manifest(spark, state_dir, latest)
    state_buckets = manifest.get("n_buckets")
    if state_buckets is not None and state_buckets != n_buckets:
        raise ValueError(
            f"IVM state at {state_dir} was built with n_buckets="
            f"{state_buckets} but this run uses n_buckets={n_buckets}; "
            "bucket assignment would diverge (the dedup anti-join would "
            "prune the WRONG buckets and double-count pairs). Rebuild the "
            "state or pass the original n_buckets."
        )

    item_bucket = F.pmod(F.hash("order_id"), F.lit(n_buckets)).alias("bucket")
    batch_items = (
        batch.select("order_id", "product_id")
        .distinct()
        .withColumn("bucket", item_bucket)
        .persist()
    )
    touched_item_buckets = _touched(batch_items)
    if not touched_item_buckets:
        # empty batch: commit a version inheriting the old manifest so the
        # batch id is durably marked done (replay skip stays correct)
        batch_items.unpersist()
        inherited = dict(manifest)
        # Legacy manifests (pre-n_buckets) carry None here; stamping the
        # current run's n_buckets onto them is a documented backward-compat
        # tradeoff — a legacy state built with a DIFFERENT bucket count
        # cannot be detected after the fact (ADVICE r4, accepted).
        inherited["n_buckets"] = n_buckets
        payload = json.dumps(inherited).encode()
        _publish_version(spark, state_dir, batch_id, payload)
        cache = _MEM_STATE.get(state_dir)
        if cache is not None and cache["version"] == latest:
            cache["version"] = batch_id  # state unchanged, only renumbered
        return

    # state rows sharing an order with the batch all live in the batch's
    # order buckets — both the dedup anti-join and the cross join prune to
    # these buckets (served from the in-memory cache when it matches the
    # committed version)
    state_items = _mem_state_part(
        spark,
        state_dir,
        latest,
        manifest,
        "items",
        _ITEMS_SCHEMA,
        touched_item_buckets,
        n_buckets,
    )
    new_items = batch_items.drop("bucket").join(
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
    pair_bucket = F.pmod(F.hash("product_a", "product_b"), F.lit(n_buckets)).alias(
        "bucket"
    )
    delta = (
        cross.unionByName(within)
        .groupBy("product_a", "product_b")
        .agg(F.count(F.lit(1)).alias("dn"))
        .withColumn("bucket", pair_bucket)
        .persist()
    )
    touched_count_buckets = _touched(delta)

    new_manifest = {
        "items": dict(manifest["items"]),
        "counts": dict(manifest["counts"]),
        "n_buckets": n_buckets,
    }
    if touched_count_buckets:
        counts = _mem_state_part(
            spark,
            state_dir,
            latest,
            manifest,
            "counts",
            _COUNTS_SCHEMA,
            touched_count_buckets,
            n_buckets,
        )
        merged = (
            counts.join(delta.drop("bucket"), ["product_a", "product_b"], "full_outer")
            .select(
                "product_a",
                "product_b",
                (
                    F.coalesce(F.col("n_orders"), F.lit(0))
                    + F.coalesce(F.col("dn"), F.lit(0))
                ).cast("long").alias("n_orders"),
            )
            .withColumn("bucket", pair_bucket)
        )
        # new version dirs only for touched buckets, never touching live data
        merged.repartition(n_buckets, "bucket").write.mode("overwrite").partitionBy(
            "bucket"
        ).parquet(f"{state_dir}/v{batch_id}/counts")
        for k in touched_count_buckets:
            new_manifest["counts"][str(k)] = f"v{batch_id}/counts/bucket={k}"

    updated_items = state_items.unionByName(new_items).withColumn(
        "bucket", item_bucket
    )
    updated_items.repartition(n_buckets, "bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(f"{state_dir}/v{batch_id}/items")
    for k in touched_item_buckets:
        new_manifest["items"][str(k)] = f"v{batch_id}/items/bucket={k}"

    payload = json.dumps(new_manifest).encode()
    _publish_version(spark, state_dir, batch_id, payload)
    # post-commit: the committed state changed — drop the cache; the next
    # batch (or the view read) rebuilds it from the new manifest with one
    # materializing scan.
    _mem_drop(state_dir)
    batch_items.unpersist()
    new_items.unpersist()
    delta.unpersist()
    _gc(
        spark,
        state_dir,
        keep_manifests=[new_manifest, manifest],
        upto=latest,
        keep_versions={batch_id, latest},
    )


def _gc(
    spark: SparkSession,
    state_dir: str,
    keep_manifests: list[dict],
    upto: int,
    keep_versions: set[int],
) -> None:
    """Delete bucket dirs in versions ≤ ``upto`` that no kept manifest
    references (current + previous — the previous version stays whole as
    the recovery point via its manifest's references). Versions in
    ``keep_versions`` are never deleted even when they hold no bucket dirs
    (a manifest-only version from an empty micro-batch IS the recovery
    point when it is the previous version — deleting it would destroy a
    committed manifest).

    Scan cost is O(versions since the low-water mark), not O(all versions):
    ``_GC_FLOOR`` records the lowest version that may still exist on disk
    and the scan starts there. The floor file is written AFTER the sweep
    completes, so a crash mid-GC just means the next sweep rescans the
    same range — advisory-only, losing it is a full rescan, never
    corruption."""
    if upto < 0:
        return
    referenced = {
        f"{state_dir}/{rel}"
        for m in keep_manifests
        for part in ("items", "counts")
        for rel in m[part].values()
    }
    fs, root, jvm = _fs(spark, state_dir)
    mkpath = jvm.org.apache.hadoop.fs.Path
    floor_path = mkpath(f"{state_dir}/_GC_FLOOR")
    start = 0
    if fs.exists(floor_path):
        stream = fs.open(floor_path)
        try:
            start = int(bytes(stream.readAllBytes()).decode().strip())
        finally:
            stream.close()
    surviving: list[int] = []
    for v in range(start, upto + 1):
        vdir = f"{state_dir}/v{v}"
        if not fs.exists(mkpath(vdir)):
            continue
        if v in keep_versions:
            surviving.append(v)
            continue
        kept_any = False
        for part in ("items", "counts"):
            pdir = mkpath(f"{vdir}/{part}")
            if not fs.exists(pdir):
                continue
            for st in fs.listStatus(pdir):
                name = st.getPath().getName()
                if not name.startswith("bucket="):
                    continue
                if f"{vdir}/{part}/{name}" in referenced:
                    kept_any = True
                else:
                    fs.delete(st.getPath(), True)
        if kept_any:
            surviving.append(v)
        else:
            fs.delete(mkpath(vdir), True)
    new_floor = min(surviving) if surviving else upto + 1
    _write_small_file(spark, f"{state_dir}/_GC_FLOOR", str(new_floor).encode())


def run_incremental_cooccurrence(
    spark: SparkSession, stream_dir: str, state_dir: str, schema
) -> None:
    """Drive the IVM from a file stream of lineitem-shaped parquet,
    one file per micro-batch (availableNow → runs to completion).

    Shuffle width is pinned to N_BUCKETS for the run: every state join
    and state write moves ONE micro-batch's delta plus its pruned state
    buckets — sizing those shuffles for the whole-corpus width just buys
    scheduler overhead per batch (the dominant replay cost; restore on
    exit)."""
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(N_BUCKETS))
    try:
        _run_incremental_cooccurrence(spark, stream_dir, state_dir, schema)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def _run_incremental_cooccurrence(
    spark: SparkSession, stream_dir: str, state_dir: str, schema
) -> None:
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
    manifest = _read_manifest(spark, state_dir, version)
    n_buckets = manifest.get("n_buckets") or N_BUCKETS
    return _mem_state_part(
        spark, state_dir, version, manifest, "counts", _COUNTS_SCHEMA, None,
        n_buckets,
    )


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
