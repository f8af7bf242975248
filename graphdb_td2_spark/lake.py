"""Lake layout — bucketed tables materialized once per session/corpus and
used as the DEFAULT execution path for the hot self-join families.

The heavy registry queries all pivot on a self-join whose key is stable
(basket adjacency on ``order_id``, LSH candidates on ``(band, bucket)``).
Re-deriving those relations from raw parquet per query means every join
re-shuffles the fact table; at 100 TB the right discipline is the one a
production deployment uses: land the derived relation ONCE as a BUCKETED
table and let every subsequent join read it exchange-free (Spark elides
the shuffle when both sides report the same hash bucketing; writing with
``repartition(n, keys)`` first gives one file per bucket so the sorted
order is also usable).

Freshness: table names carry a corpus digest, but on-disk tables from an
earlier process are NEVER trusted — the first use inside a session
rebuilds (mode=overwrite). Amortization is within-session (the API
server, a 188-query verification run, a bench loop), which is where the
repeated joins actually happen; the rebuild itself is the same single
shuffle the un-materialized query would have paid once anyway.

Reference parity note: the reference keeps its adjacency inside Neo4j
(the graph IS the materialized adjacency, ``app/etl.py`` builds it once);
this module is that same build-once discipline expressed as Spark
bucketed tables.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, functions as F

N_LAKE_BUCKETS = 32

# (applicationId, sf_dir, what) -> table name, recorded only after this
# session built the table
_LAKE_CACHE: dict[tuple[str, str, str], str] = {}


def _table_name(sf_dir: str, what: str) -> str:
    digest = hashlib.md5(sf_dir.rstrip("/").encode()).hexdigest()[:8]
    return f"lake_{what}_{digest}"


def _ensure(
    spark: SparkSession,
    sf_dir: str,
    what: str,
    build,
    bucket_by: list[str],
    sort_by: list[str],
    n_buckets: int = N_LAKE_BUCKETS,
) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"), what)
    name = _LAKE_CACHE.get(key)
    if name is None:
        name = _table_name(sf_dir, what)
        # a previous process may have left the table (or just its
        # warehouse dir, if the catalog was in-memory) behind — clear
        # both, stale lake data is never trusted across processes
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        loc = jvm.org.apache.hadoop.fs.Path(f"{warehouse}/{name}")
        fs = loc.getFileSystem(conf)
        if fs.exists(loc):
            fs.delete(loc, True)
        df = build()
        # one task per bucket -> one file per bucket: the scan can then
        # satisfy both the join's distribution AND its sort requirement
        (
            df.repartition(n_buckets, *[F.col(c) for c in bucket_by])
            .write.mode("overwrite")
            .bucketBy(n_buckets, *bucket_by)
            .sortBy(*sort_by)
            .format("parquet")
            .saveAsTable(name)
        )
        _LAKE_CACHE[key] = name
    return spark.table(name)


def items_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduplicated basket adjacency ``(order_id, product_id)``,
    bucketed+sorted by ``order_id`` — the CONTAINS edge list as a lake
    artifact. Self-joins on ``order_id`` read it exchange-free."""
    from .io import read_table

    def build():
        return (
            read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
            .select(
                F.col("l_orderkey").alias("order_id"),
                F.col("l_partkey").alias("product_id"),
            )
            .distinct()
        )

    return _ensure(
        spark,
        sf_dir,
        "items",
        build,
        bucket_by=["order_id"],
        sort_by=["order_id", "product_id"],
    )


def lsh_buckets_bucketed(
    spark: SparkSession,
    sf_dir: str,
    n_hashes: int,
    n_bands: int,
    bucket_cap: int,
) -> DataFrame:
    """The capped LSH candidate table ``(doc_id, band, bucket)``, bucketed
    by ``(band, bucket)`` — the signature artifact a dedup pipeline lands
    next to the shingle table. The banded self-join reads it
    exchange-free."""
    from .dedup.minhash import cached_capped_buckets

    def build():
        return cached_capped_buckets(
            spark,
            sf_dir,
            n_hashes=n_hashes,
            n_bands=n_bands,
            bucket_cap=bucket_cap,
        )

    return _ensure(
        spark,
        sf_dir,
        f"lsh{n_hashes}x{n_bands}c{bucket_cap}",
        build,
        bucket_by=["band", "bucket"],
        sort_by=["band", "bucket", "doc_id"],
    )


def build_lake(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """Materialize every lake artifact for a corpus; returns
    {artifact: table name}. Queries call the per-artifact accessors lazily,
    so this explicit step is optional — it exists for ETL-style pipelines
    that want the build cost paid up front."""
    from .dedup.minhash import BUCKET_CAP, N_BANDS, N_HASHES

    items_bucketed(spark, sf_dir)
    lsh_buckets_bucketed(spark, sf_dir, N_HASHES, N_BANDS, BUCKET_CAP)
    app = spark.sparkContext.applicationId
    sf = sf_dir.rstrip("/")
    return {
        what: name
        for (a, s, what), name in _LAKE_CACHE.items()
        if a == app and s == sf
    }
