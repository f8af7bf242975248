"""Structured Streaming tests (SURVEY.md §2.J [extension]).

Strategy: stream-batch parity. The same rows flow once through the
streaming pipeline (file source split into multiple chunk files,
``availableNow`` trigger, memory sink) and once through the equivalent
batch aggregation; results must match exactly. This is the strongest
check Structured Streaming admits locally — it exercises source
discovery, watermarking, state handling, and sink semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphdb_td2_spark.io import read_table
from graphdb_td2_spark.streaming import (
    events_stream,
    incremental_event_edges,
    stream_event_type_windows,
    stream_session_windows,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def chunked_source(spark, tmp_path_factory):
    """The sf0.001 events split into 3 parquet chunk files — a stream
    arriving in pieces."""
    src = tmp_path_factory.mktemp("events_stream_src")
    events = read_table(spark, SF_DIR, "events").orderBy("event_id")
    n = events.count()
    rows = events.collect()
    third = (n + 2) // 3
    for i in range(3):
        chunk = rows[i * third : (i + 1) * third]
        if chunk:
            spark.createDataFrame(chunk, events.schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(str(src / f"chunk_{i}"))
    return str(src)


def _run_to_memory(stream_df, name, mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_tumbling_windows_match_batch(spark, chunked_source):
    stream = events_stream(spark, chunked_source + "/*", ts_unit="us")
    _run_to_memory(
        stream_event_type_windows(stream), "tumbling_counts", "complete"
    )
    got = {
        (r.window_start, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in spark.sql("SELECT * FROM tumbling_counts").collect()
    }
    batch = (
        spark.read.parquet(chunked_source + "/*")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    )
    want = {(r.w.start, r.event_type): (r.n, round(r.s, 6)) for r in batch}
    assert got == want and len(got) > 0


def test_session_windows_match_batch_sessionizer(spark, chunked_source):
    stream = events_stream(spark, chunked_source + "/*", ts_unit="us")
    _run_to_memory(
        stream_session_windows(stream), "session_counts", "complete"
    )
    got = (
        spark.sql(
            "SELECT user_id, COUNT(*) AS n_sessions, SUM(n_events) AS n_events "
            "FROM session_counts GROUP BY user_id"
        )
        .collect()
    )
    got_map = {r.user_id: (r.n_sessions, r.n_events) for r in got}

    # batch twin: lag-based sessionizer over the same rows
    ev = spark.read.parquet(chunked_source + "/*")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    gap = micros - F.lag(micros).over(w)
    sess = (
        ev.withColumn(
            "new_session",
            F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
        )
        .groupBy("user_id")
        .agg(F.sum("new_session").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
        .collect()
    )
    want_map = {r.user_id: (r.n_sessions, r.n_events) for r in sess}
    assert got_map == want_map and len(got_map) > 0


def test_incremental_event_edges_idempotent(spark, chunked_source, tmp_path):
    sink = str(tmp_path / "edges_sink")
    ck1 = str(tmp_path / "ck1")
    stream = events_stream(
        spark, chunked_source + "/*", ts_unit="us", max_files_per_trigger=1
    )
    q = incremental_event_edges(spark, stream, sink, ck1)
    q.awaitTermination(120)
    edges1 = spark.read.parquet(sink)
    n1 = edges1.count()
    assert n1 == edges1.dropDuplicates(["user_id", "product_key", "rel_type"]).count()
    assert n1 > 0

    # replay the same stream from a fresh checkpoint: the anti-join MERGE
    # must add nothing (cross-run idempotency, the reference's MERGE parity)
    q2 = incremental_event_edges(
        spark,
        events_stream(spark, chunked_source + "/*", ts_unit="us"),
        sink,
        str(tmp_path / "ck2"),
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(sink).count() == n1

    # batch twin: distinct resolvable (user, product, rel) triples
    ev = spark.read.parquet(chunked_source + "/*")
    want = (
        ev.select(
            "user_id",
            F.get_json_object("props", "$.k").cast("long").alias("product_key"),
            F.lower("event_type").alias("et"),
        )
        .filter(F.col("et").isin("view", "click", "add_to_cart") & F.col("product_key").isNotNull())
        .dropDuplicates(["user_id", "product_key", "et"])
        .count()
    )
    assert n1 == want


def test_corpus_stream_source_any_encoding(spark):
    """The driver corpus events file streams with correct timestamp
    handling WHATEVER its physical encoding (the corpus has shipped as
    both TIMESTAMP(NANOS) and tz-naive timestamp[us] across driver
    versions): count and min/max ts match the batch reader."""
    stream = events_stream(spark, SF_DIR, file_glob="events.parquet")
    _run_to_memory(
        stream.groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ts").alias("lo"),
            F.max("ts").alias("hi"),
        ),
        "corpus_agg",
        "complete",
    )
    got = spark.sql("SELECT * FROM corpus_agg").collect()[0]
    want = (
        read_table(spark, SF_DIR, "events")
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n"), F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .collect()[0]
    )
    assert (got.n, got.lo, got.hi) == (want.n, want.lo, want.hi)


def test_stream_source_directory_shaped_table(spark, tmp_path):
    """``file_glob`` naming a DIRECTORY (the standard lake layout:
    events.parquet/ holding part files) must stream its contents —
    pathGlobFilter alone would match no leaf file and yield a silently
    empty stream."""
    events = read_table(spark, SF_DIR, "events")
    events.limit(100).repartition(3).write.parquet(str(tmp_path / "events.parquet"))
    stream = events_stream(spark, str(tmp_path), file_glob="events.parquet")
    assert dict(stream.dtypes)["ts"] == "timestamp"
    _run_to_memory(
        stream.groupBy().agg(F.count(F.lit(1)).alias("n")), "dir_shaped", "complete"
    )
    assert spark.sql("SELECT n FROM dir_shaped").collect()[0].n == 100


@pytest.mark.parametrize("unit", ["ns", "us_ntz", "us_tz"])
def test_stream_auto_detects_ts_encoding(spark, tmp_path, unit):
    """``events_stream`` auto-detects the physical ``ts`` encoding from
    the parquet footer: identical logical rows written as nanos, tz-naive
    micros, and tz'd micros all stream to the same UTC instants."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    instants = [
        dt.datetime(2024, 1, 1, 0, 0, 0),
        dt.datetime(2024, 1, 1, 0, 30, 0),
        dt.datetime(2024, 1, 1, 2, 0, 0),
    ]
    ts_type = {
        "ns": pa.timestamp("ns"),
        "us_ntz": pa.timestamp("us"),
        "us_tz": pa.timestamp("us", tz="UTC"),
    }[unit]
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(instants, ts_type),
            "user_id": pa.array([10, 10, 11], pa.int64()),
            "event_type": pa.array(["view", "click", "view"]),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    src = tmp_path / f"enc_{unit}"
    src.mkdir()
    pq.write_table(table, src / "events.parquet")

    stream = events_stream(spark, str(src), file_glob="events.parquet")
    assert dict(stream.dtypes)["ts"] == "timestamp"
    _run_to_memory(
        stream.select("event_id", "ts"), f"enc_rows_{unit}", "append"
    )
    got = {
        r.event_id: r.ts
        for r in spark.sql(f"SELECT * FROM enc_rows_{unit}").collect()
    }
    assert got == {i + 1: instants[i] for i in range(3)}


def test_first_seen_stream_matches_batch_distinct(spark, chunked_source):
    """applyInPandasWithState first-seen: across micro-batches, every
    resolvable (user, product, rel) triple is emitted exactly once, and
    the emitted set equals the batch distinct triples."""
    from graphdb_td2_spark.streaming import first_seen_stream

    stream = events_stream(
        spark, chunked_source + "/*", ts_unit="us", max_files_per_trigger=1
    )
    q = (
        first_seen_stream(stream)
        .writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql(
        "SELECT user_id, product_key, rel_type FROM first_seen"
    ).collect()
    triples = [(r.user_id, r.product_key, r.rel_type) for r in got]
    assert len(triples) == len(set(triples)), "a triple was emitted twice"

    ev = spark.read.parquet(chunked_source + "/*")
    want = (
        ev.select(
            "user_id",
            F.get_json_object("props", "$.k").cast("long").alias("product_key"),
            F.lower("event_type").alias("et"),
        )
        .filter(F.col("et").isin("view", "click", "add_to_cart") & F.col("product_key").isNotNull())
        .select("user_id", "product_key", "et")
        .distinct()
        .count()
    )
    assert len(set(triples)) == want and want > 0


def test_watermark_drops_late_rows_in_append_mode(spark, tmp_path):
    """Late-data semantics, pinned explicitly: a row older than the
    watermark arriving in a LATER micro-batch must be excluded from its
    (already finalizable) window, while on-time rows count — the §2.J
    correctness contract that batch-parity tests can't see (batch has no
    notion of lateness).

    Batch separation is guaranteed by running TWO separate ``availableNow``
    queries against the SAME checkpoint dir, writing chunk 2 between runs —
    the file-source offsets and watermark state persist across runs, so the
    second run sees only the new file with the run-1 watermark already at
    10:49. (A single availableNow run coalesces all files into one batch on
    Spark 4.1.2 regardless of maxFilesPerTrigger, so the two-run shape is
    the only reliable way to pin this contract locally.) The sink is the
    parquet FILE sink — the memory sink refuses checkpoint recovery — so
    each run's emissions accumulate in one output dir and we diff between
    runs."""
    from datetime import datetime

    src = tmp_path / "late_src"
    src.mkdir()
    ck = str(tmp_path / "late_ck")
    out_dir = str(tmp_path / "late_out")

    def write_chunk(chunk_name, rows):
        spark.createDataFrame(
            [(1, datetime(2024, 1, 1, h, m)) for h, m in rows],
            "user_id long, ts timestamp",
        ).coalesce(1).write.parquet(str(src / chunk_name))

    def run_once():
        stream = (
            spark.readStream.schema("user_id long, ts timestamp")
            .parquet(str(src) + "/*")
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "10 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r["ws"].strftime("%H:%M"): r["n"]
            for r in spark.read.parquet(out_dir).collect()
        }

    # run 1: two rows in window 10:00-10:10, one at 10:59 (pushes the
    # 10-minute watermark to 10:49 — past the first window's end, so the
    # 10:00 window is finalized and emitted; 10:50 stays open in state)
    write_chunk("c1", [(10, 1), (10, 3), (10, 59)])
    out1 = run_once()
    assert out1 == {"10:00": 2}

    # run 2 (same checkpoint): a LATE row for the first window
    # (10:04 < watermark 10:49) that must be dropped + an 11:30 row that
    # advances the watermark to 11:20, closing the 10:50 window
    write_chunk("c2", [(10, 4), (11, 30)])
    out2 = run_once()
    # the 10:50 window (10:59 row) was finalized by run 2's watermark
    assert out2.get("10:50") == 1
    # the late 10:04 row was DROPPED: the 10:00 window count is unchanged
    # (file-sink output accumulates, so a re-emission would bump it to 3
    # or add a duplicate row — collect() into a dict would then keep 3)
    assert out2["10:00"] == 2
    rows_1000 = (
        spark.read.parquet(out_dir)
        .where(F.date_format("ws", "HH:mm") == "10:00")
        .collect()
    )
    assert len(rows_1000) == 1 and rows_1000[0]["n"] == 2
    # the 11:30 row's window never passed the watermark -> not emitted
    assert "11:30" not in out2


def test_session_window_boundary_gap_merges(spark, tmp_path):
    """Pins the oracle's new-session predicate: a gap of EXACTLY the gap
    duration (30 min) still merges into one session — Spark starts a new
    session only when the gap is STRICTLY greater. The DuckDB oracle for
    streaming_session_windows uses `> 1800000000` to match."""
    import datetime as dt

    t0 = dt.datetime(2025, 1, 1, 0, 0, 0)
    rows = [
        (1, 10, t0, 1.0),
        (2, 10, t0 + dt.timedelta(minutes=30), 1.0),  # exactly the gap
        (3, 20, t0, 1.0),
        (4, 20, t0 + dt.timedelta(minutes=30, seconds=1), 1.0),  # beyond
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    path = str(tmp_path / "ev")
    df.write.parquet(path)
    src = spark.readStream.schema(
        "event_id long, user_id long, ts timestamp, value double"
    ).parquet(path)
    _run_to_memory(stream_session_windows(src), "session_boundary", "complete")
    got = {
        r.user_id: r.n_sessions
        for r in spark.sql(
            "SELECT user_id, COUNT(*) AS n_sessions FROM session_boundary "
            "GROUP BY user_id"
        ).collect()
    }
    assert got == {10: 1, 20: 2}


def test_streaming_daily_actives_equals_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    from graphdb_td2_spark.io import read_table
    from graphdb_td2_spark.streaming.core import streaming_daily_actives

    got = {
        r["day"]: r["active_users"]
        for r in streaming_daily_actives(spark, sf_dir).collect()
    }
    want = {
        r["day"]: r["n"]
        for r in read_table(spark, sf_dir, "events", ["ts", "user_id"])
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want
