"""Last-touch attribution (operators/attribution.py): hand-computed
fixture covering window cutoff, carry-over, purchase-skipping, and
'none'."""

from __future__ import annotations

import datetime as dt

from graphdb_td2_spark.operators.attribution import last_touch_attribution

EV = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def test_hand_computed_attribution(spark, tmp_path):
    t0 = dt.datetime(2024, 3, 1, 9, 0, 0)

    def e(i, mins, uid, typ):
        return (i, t0 + dt.timedelta(minutes=mins), uid, typ, 0.0, "{}")

    rows = [
        # user 1: click at 0, purchase at 30 → click
        e(1, 0, 1, "click"),
        e(2, 30, 1, "purchase"),
        # user 1: view at 40, purchase at 120 → view (80 min > ... no!
        # 120-40=80 min > 60 → none)
        e(3, 40, 1, "view"),
        e(4, 120, 1, "purchase"),
        # user 2: purchase then purchase — an earlier purchase is never a
        # touch; view at 5 carries past the first purchase (25 min) → view
        e(5, 5, 2, "view"),
        e(6, 10, 2, "purchase"),
        e(7, 30, 2, "purchase"),
        # user 3: purchase with no prior events → none
        e(8, 0, 3, "purchase"),
        # user 3: boundary — touch exactly 60 min before counts (>=)
        e(9, 10, 3, "signup"),
        e(10, 70, 3, "purchase"),
    ]
    df = spark.createDataFrame(rows, EV)
    d = tmp_path / "fx"
    df.repartition(3).write.parquet(str(d / "events.parquet"))
    got = {
        r["attributed_type"]: r["n_purchases"]
        for r in last_touch_attribution(spark, str(d)).collect()
    }
    assert got == {"click": 1, "none": 2, "view": 2, "signup": 1}


def test_corpus_totals(spark, sf_dir):
    from graphdb_td2_spark.io import read_table
    from pyspark.sql import functions as F

    rows = last_touch_attribution(spark, sf_dir).collect()
    n_purchases = (
        read_table(spark, sf_dir, "events", ["event_type"])
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert sum(r["n_purchases"] for r in rows) == n_purchases
    assert all(r["attributed_type"] != "purchase" for r in rows)
