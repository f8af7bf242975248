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


def test_jdbc_unpartitioned_read(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/db2;create=true"
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
    write_jdbc(df.coalesce(1), url, "kv", driver=_DRIVER)
    back = read_jdbc(spark, url, "kv", driver=_DRIVER)
    assert back.rdd.getNumPartitions() == 1  # the documented single-task wall
    assert sorted(map(tuple, back.collect())) == [(1, "a"), (2, "b")]
