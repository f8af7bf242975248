"""read_jdbc/write_jdbc round-trip against the embedded Derby engine that
ships in Spark's jars dir (for its Hive metastore) — making the A1-literal
JDBC path (reference: psycopg2 Postgres extract, ``app/etl.py:20-30``)
actually execute in this container. Embedded Derby is same-JVM, which
matches local[*]; against a real database only the url/driver change."""

from __future__ import annotations

import os

import pyspark
import pytest

from graphdb_td2_spark.sources.formats import read_jdbc, write_jdbc

_JARS = os.path.join(os.path.dirname(pyspark.__file__), "jars")
_HAS_DERBY = os.path.isdir(_JARS) and any(
    j.startswith("derby") for j in os.listdir(_JARS)
)
_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

pytestmark = pytest.mark.skipif(
    not _HAS_DERBY, reason="Derby jars absent from the Spark classpath"
)


def test_jdbc_roundtrip_partitioned(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    rows = [(i, f"name_{i}", i * 10) for i in range(100)]
    df = spark.createDataFrame(rows, "id bigint, name string, score bigint")
    write_jdbc(df.coalesce(1), url, "people", driver=_DRIVER)

    back = read_jdbc(
        spark,
        url,
        "people",
        partition_column="id",
        num_partitions=4,
        lower_bound=0,
        upper_bound=100,
        driver=_DRIVER,
    )
    # the partitioned read really does split into 4 bound ranges
    assert back.rdd.getNumPartitions() == 4
    assert sorted(map(tuple, back.collect())) == sorted(rows)


_DERBY_PROBE = "SELECT 1 AS ok FROM SYSIBM.SYSDUMMY1"


def test_wait_for_jdbc_ready(spark, tmp_path):
    """A7: the readiness gate returns promptly once the database answers
    the probe (reference ``wait_for_postgres``, ``app/etl.py:40-54``)."""
    from graphdb_td2_spark.sources.extract import wait_for_jdbc

    url = f"jdbc:derby:{tmp_path}/ready;create=true"
    wait_for_jdbc(
        spark, url, timeout_seconds=30, probe_query=_DERBY_PROBE, driver=_DRIVER
    )


def test_wait_for_jdbc_times_out_with_backoff(spark, tmp_path):
    """An unreachable database must retry with backoff, then raise — not
    fail on the first probe and not hang forever."""
    import time

    import pytest as _pytest

    from graphdb_td2_spark.sources.extract import wait_for_jdbc

    # create=true absent + no database dir → every connect attempt fails
    url = f"jdbc:derby:{tmp_path}/does_not_exist"
    start = time.monotonic()
    with _pytest.raises(RuntimeError, match="Timed out waiting"):
        wait_for_jdbc(
            spark,
            url,
            timeout_seconds=2,
            backoff_seconds=0.5,
            probe_query=_DERBY_PROBE,
            driver=_DRIVER,
        )
    assert time.monotonic() - start >= 2  # it kept retrying to the deadline


def test_jdbc_extract_builds_identical_graph(spark, sf_dir, tmp_path):
    """The reference's six extract projections (``app/etl.py:141-164``)
    through a real JDBC engine → ``build_graph`` must yield exactly the
    graph the parquet path builds — same vertices per label, same edges per
    rel_type (r4 task #8: the A1-literal path proven end-to-end)."""
    from graphdb_td2_spark.graph.build import build_graph
    from graphdb_td2_spark.io import load_tables
    from graphdb_td2_spark.sources.extract import (
        GRAPH_EXTRACT_PROJECTIONS,
        extract_graph_tables,
        load_corpus_to_jdbc,
    )

    url = f"jdbc:derby:{tmp_path}/shop;create=true"
    corpus = load_tables(spark, sf_dir)
    load_corpus_to_jdbc(
        {name: corpus[name] for name in GRAPH_EXTRACT_PROJECTIONS},
        url,
        driver=_DRIVER,
    )

    extracted = extract_graph_tables(
        spark,
        url,
        partition_specs={
            "lineitem": {
                "partition_column": "l_orderkey",
                "num_partitions": 4,
                "lower_bound": 0,
                "upper_bound": 2_000_000,
            }
        },
        wait=True,
        probe_query=_DERBY_PROBE,
        driver=_DRIVER,
    )
    # the wide-table read really is a parallel bound-range scan
    assert extracted["lineitem"].rdd.getNumPartitions() == 4

    via_jdbc = build_graph(extracted)
    via_parquet = build_graph(corpus)

    from pyspark.sql import functions as F

    def by(df, key):
        return dict(
            (r[key], r["n"])
            for r in df.groupBy(key).agg(F.count(F.lit(1)).alias("n")).collect()
        )

    assert by(via_jdbc.vertices, "label") == by(via_parquet.vertices, "label")
    assert by(via_jdbc.edges, "rel_type") == by(via_parquet.edges, "rel_type")


def test_jdbc_extract_safe_fetch_degrades_to_empty(spark, tmp_path):
    """``safe_fetch`` parity (``app/etl.py:132-139``): a missing table
    yields an EMPTY typed frame and the extract keeps going."""
    from graphdb_td2_spark.sources.extract import extract_graph_tables

    url = f"jdbc:derby:{tmp_path}/partial;create=true"
    # only customer exists; the other five extracts must degrade
    df = spark.createDataFrame([(1, "c1")], "c_custkey long, c_name string")
    write_jdbc(df.coalesce(1), url, "customer", driver=_DRIVER)

    extracted = extract_graph_tables(spark, url, driver=_DRIVER)
    assert [tuple(r) for r in extracted["customer"].collect()] == [(1, "c1")]
    for name in ("part", "orders", "lineitem", "events"):
        assert extracted[name].count() == 0
        assert len(extracted[name].columns) > 0  # typed, projected, empty


def test_jdbc_unpartitioned_read(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/db2;create=true"
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
    write_jdbc(df.coalesce(1), url, "kv", driver=_DRIVER)
    back = read_jdbc(spark, url, "kv", driver=_DRIVER)
    assert back.rdd.getNumPartitions() == 1  # the documented single-task wall
    assert sorted(map(tuple, back.collect())) == [(1, "a"), (2, "b")]
