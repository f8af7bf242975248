"""Session-depth conversion (operators/conversion.py): consistency with
sessionize and a hand-built fixture."""

from __future__ import annotations

import datetime as dt

from graphdb_td2_spark.operators.conversion import session_conversion_stats
from graphdb_td2_spark.operators.windows import sessionize

EV = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def test_fixture_buckets_and_rates(spark, tmp_path):
    t0 = dt.datetime(2024, 2, 1, 8, 0, 0)

    def e(i, mins, uid, typ):
        return (i, t0 + dt.timedelta(minutes=mins), uid, typ, 0.0, "{}")

    rows = [
        # user 1, session A (3 events incl. purchase) → bucket 1, converting
        e(1, 0, 1, "view"),
        e(2, 5, 1, "click"),
        e(3, 10, 1, "purchase"),
        # user 1, session B after a 2h gap (1 event) → bucket 0, not
        e(4, 130, 1, "view"),
        # user 2, one 8-event session, no purchase → bucket 3, not
        *[e(5 + i, i * 2, 2, "click") for i in range(8)],
    ]
    df = spark.createDataFrame(rows, EV)
    d = tmp_path / "fx"
    df.write.parquet(str(d / "events.parquet"))
    got = {
        r["depth_bucket"]: (r["n_sessions"], r["n_converting"], r["conversion_rate"])
        for r in session_conversion_stats(spark, str(d)).collect()
    }
    assert got == {0: (1, 0, 0.0), 1: (1, 1, 1.0), 3: (1, 0, 0.0)}


def test_session_totals_match_sessionize(spark, sf_dir):
    conv = session_conversion_stats(spark, sf_dir).collect()
    sess = sessionize(spark, sf_dir).collect()
    assert sum(r["n_sessions"] for r in conv) == sum(r["n_sessions"] for r in sess)


def test_bounce_rates_consistent_with_sessionize(spark, sf_dir):
    from pyspark.sql import functions as F

    from graphdb_td2_spark.operators.conversion import channel_bounce_rates
    from graphdb_td2_spark.operators.windows import sessionize

    rows = channel_bounce_rates(spark, sf_dir).collect()
    assert rows
    total_sessions = sum(r["n_sessions"] for r in rows)
    want = (
        sessionize(spark, sf_dir)
        .agg(F.sum("n_sessions").alias("s"))
        .collect()[0]["s"]
    )
    assert total_sessions == want
    for r in rows:
        assert 0.0 <= r["bounce_rate"] <= 1.0
