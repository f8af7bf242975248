"""Batch read-boundary timestamp normalization: ``read_table`` must return
the SAME logical TimestampType rows whatever physical encoding a corpus
regeneration ships (the round-5 regression class — TIMESTAMP(NANOS) →
tz-naive micros broke 6 queries silently/loudly). Covers nanos-as-long,
TIMESTAMP_NTZ, tz'd micros, and DATE narrowing."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from graphdb_td2_spark.io import read_table

INSTANTS = [
    dt.datetime(2024, 1, 1, 0, 0, 0),
    dt.datetime(2024, 1, 2, 0, 30, 0),
    dt.datetime(2024, 1, 3, 2, 0, 0),
]


def _write_events(tmp_path, ts_type):
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(INSTANTS, ts_type),
            "user_id": pa.array([10, 10, 11], pa.int64()),
            "event_type": pa.array(["view", "click", "view"]),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(table, tmp_path / "events.parquet")


@pytest.mark.parametrize(
    "ts_type",
    [pa.timestamp("ns"), pa.timestamp("us"), pa.timestamp("us", tz="UTC")],
    ids=["ns", "us_ntz", "us_tz"],
)
def test_read_table_normalizes_ts_encodings(spark, tmp_path, ts_type):
    _write_events(tmp_path, ts_type)
    df = read_table(spark, str(tmp_path), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = {r.event_id: r.ts for r in df.select("event_id", "ts").collect()}
    assert got == {i + 1: INSTANTS[i] for i in range(3)}


def test_read_table_normalizes_date_narrowed_column(spark, tmp_path):
    """A day-granular column regenerated as parquet DATE still reads as
    TimestampType at midnight UTC (DuckDB's date→timestamp promotion)."""
    days = [d.date() for d in INSTANTS]
    table = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_custkey": pa.array([7, 8, 9], pa.int64()),
            "o_orderstatus": pa.array(["O", "F", "O"]),
            "o_totalprice": pa.array([10.0, 20.0, 30.0], pa.float64()),
            "o_orderdate": pa.array(days, pa.date32()),
            "o_orderpriority": pa.array(["1-URGENT", "2-HIGH", "3-MEDIUM"]),
        }
    )
    pq.write_table(table, tmp_path / "orders.parquet")
    df = read_table(spark, str(tmp_path), "orders")
    assert dict(df.dtypes)["o_orderdate"] == "timestamp"
    got = {r.o_orderkey: r.o_orderdate for r in df.collect()}
    assert got == {
        i + 1: dt.datetime.combine(days[i], dt.time()) for i in range(3)
    }


def test_schema_drift_report_on_corpus_and_planted_drift(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from graphdb_td2_spark.sources.parquet import schema_drift_report

    rows = schema_drift_report(spark, "/root/testdata/sf0.001").collect()
    # current corpus: every expected column present, ok or normalized
    assert rows
    assert all(r["status"] in ("ok", "normalized") for r in rows)
    # planted drift: events.ts as NTZ micros (normalized), value as string
    # (type_drift), an extra column (unexpected), props missing
    table = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([__import__("datetime").datetime(2024, 1, 1)], pa.timestamp("us")),
            "user_id": pa.array([1], pa.int64()),
            "event_type": pa.array(["x"]),
            "value": pa.array(["oops"]),
            "extra": pa.array([1], pa.int64()),
        }
    )
    pq.write_table(table, tmp_path / "events.parquet")
    got = {
        (r["column"]): r["status"]
        for r in schema_drift_report(spark, str(tmp_path)).collect()
        if r["table"] == "events"
    }
    assert got["ts"] == "normalized"
    assert got["value"] == "type_drift"
    assert got["extra"] == "unexpected"
    assert got["props"] == "missing"
