"""Relational-extract tier — the literal Spark mapping of the reference's
source phase (SURVEY.md §2 rows A1/A7 made runnable, not just documented).

The reference's entire source tier is one Postgres connection
(``app/etl.py:20-30``) gated by a retry loop (``wait_for_postgres``,
``app/etl.py:40-54``) and drained through six projected SELECTs
(``app/etl.py:141-164``). Here:

- :func:`wait_for_jdbc` is the readiness gate (A7): probe the database
  through the same JDBC path the extract uses, with backoff, until it
  answers or the timeout trips — the exact ``SELECT 1``-until-ready loop of
  the reference, minus the psycopg2 single connection.
- :func:`extract_graph_tables` issues the six projections. Each is a
  ``dbtable`` scan plus an explicit column ``select`` — Spark's JDBC source
  pushes the projection into the generated SQL, so the database sees the
  same narrow SELECTs the reference writes by hand (``app/etl.py:141-164``),
  while wide tables can additionally split into bound-range partitions
  (``partitionColumn``) instead of arriving through one cursor on one heap.
- Per-table fault tolerance mirrors ``safe_fetch`` (``app/etl.py:132-139``):
  a failing extract logs and yields an EMPTY typed frame, so one broken
  table degrades the graph instead of killing the ETL.

Scale notes: a JDBC source has no parquet-style row-group statistics — the
parallelism is exactly the bound-range split, so always pass
``partition_specs`` for the fact tables in production. The extracted frames
feed :func:`graphdb_td2_spark.graph.build.build_graph` unchanged; the e2e
equivalence (JDBC path ≡ parquet path) is pinned by ``tests/test_jdbc.py``.
"""

from __future__ import annotations

import logging
import time

from pyspark.sql import DataFrame, SparkSession

from ..schemas import CORPUS
from .formats import read_jdbc, write_jdbc

log = logging.getLogger("graphdb_td2_spark")

# The six reference SELECTs (app/etl.py:141-164) translated to the corpus
# data model (the FIXTURES.md mapping used by graph/build.py): table →
# projected columns. ``categories`` needs no extract of its own — the brand
# dimension is derived from ``part`` (graph/build.py E2), so the reference's
# sixth SELECT collapses into the ``part`` projection here.
GRAPH_EXTRACT_PROJECTIONS: dict[str, list[str]] = {
    "customer": ["c_custkey", "c_name"],  # SELECT id, name FROM customers
    "part": ["p_partkey", "p_name", "p_brand"],  # products + categories
    "orders": ["o_orderkey", "o_custkey", "o_orderdate"],  # id, customer_id, ts
    "lineitem": ["l_orderkey", "l_partkey", "l_quantity", "l_linenumber"],
    "events": ["user_id", "event_type", "props"],  # customer/product/type
}


def wait_for_jdbc(
    spark: SparkSession,
    url: str,
    timeout_seconds: float = 120.0,
    backoff_seconds: float = 2.0,
    probe_query: str = "SELECT 1 AS ok",
    **properties: str,
) -> None:
    """Readiness gate (A7): retry a trivial probe through the JDBC source
    until the database answers (``wait_for_postgres``, ``app/etl.py:40-54``).

    ``probe_query`` is dialect-specific: Postgres/MySQL accept ``SELECT 1 AS
    ok``; Derby/DB2 need ``SELECT 1 AS ok FROM SYSIBM.SYSDUMMY1`` (the alias
    matters — Spark re-selects the resolved column by name). Raises
    ``RuntimeError`` after ``timeout_seconds``, like the reference."""
    start = time.monotonic()
    while True:
        try:
            reader = (
                spark.read.format("jdbc")
                .option("url", url)
                .option("query", probe_query)
            )
            for k, v in properties.items():
                reader = reader.option(k, v)
            reader.load().collect()
            log.info("JDBC source at %s is available", url)
            return
        except Exception as exc:
            if time.monotonic() - start > timeout_seconds:
                raise RuntimeError(
                    f"Timed out waiting for JDBC source {url}: {exc}"
                ) from exc
            log.info("Waiting for JDBC source %s... (%s)", url, exc)
            time.sleep(backoff_seconds)


def extract_graph_tables(
    spark: SparkSession,
    url: str,
    partition_specs: dict[str, dict] | None = None,
    safe: bool = True,
    wait: bool = False,
    probe_query: str = "SELECT 1 AS ok",
    **properties: str,
) -> dict[str, DataFrame]:
    """The six-projection extract (A1 literal): every table
    :func:`graphdb_td2_spark.graph.build.build_graph` consumes, read through
    JDBC with the reference's column lists pushed into the database.

    ``partition_specs`` maps table → kwargs for :func:`read_jdbc`
    (``partition_column``/``lower_bound``/``upper_bound``/``num_partitions``)
    so fact tables split into parallel bound-range reads. ``safe=True``
    applies the ``safe_fetch`` contract per table: empty typed frame +
    warning instead of an error."""
    if wait:
        wait_for_jdbc(spark, url, probe_query=probe_query, **properties)
    specs = partition_specs or {}
    out: dict[str, DataFrame] = {}
    for table, columns in GRAPH_EXTRACT_PROJECTIONS.items():
        try:
            df = read_jdbc(spark, url, table, **specs.get(table, {}), **properties)
            df = df.select(*columns)
            df.schema  # force resolution now — missing tables fail HERE
        except Exception as exc:
            if not safe:
                raise
            log.warning("could not extract table %s from %s: %s", table, url, exc)
            schema = CORPUS[table]
            df = spark.createDataFrame([], schema).select(*columns)
        out[table] = df
    return out


def load_corpus_to_jdbc(
    tables: dict[str, DataFrame],
    url: str,
    coalesce: int | None = 1,
    **properties: str,
) -> None:
    """Land corpus frames in a relational database (the reverse migration —
    and the harness that makes the extract path testable without a running
    Postgres). ``coalesce`` bounds the writer's connection count; pass None
    to keep the frames' own parallelism against a real server."""
    for name, df in tables.items():
        if coalesce is not None:
            df = df.coalesce(coalesce)
        write_jdbc(df, url, name, **properties)
