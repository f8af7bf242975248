"""Fixed-point Gram matrix (similarity/gram.py) and interpolated daily
gapfill (operators/timeseries.py): implementation twins + hand fixtures."""

from __future__ import annotations

import datetime as dt

from graphdb_td2_spark.operators.timeseries import interpolated_daily_value
from graphdb_td2_spark.similarity.gram import gram_exploded, gram_fixed_point

EV = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def test_gram_mapinpandas_equals_exploded(spark, sf_dir):
    fast = gram_fixed_point(spark, sf_dir).collect()
    slow = gram_exploded(spark, sf_dir).collect()
    assert [tuple(r) for r in fast] == [tuple(r) for r in slow]
    d = max(r["j"] for r in fast) + 1
    assert len(fast) == d * (d + 1) // 2
    # diagonal entries are sums of squares → non-negative
    assert all(r["gram_fp"] >= 0 for r in fast if r["i"] == r["j"])


def test_gram_hand_computed(spark, tmp_path):
    d = tmp_path / "fx"
    rows = [(1, [1.0, 2.0], 0), (2, [3.0, -1.0], 0)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(d / "embeddings.parquet"))
    out = {(r["i"], r["j"]): r["gram_fp"] for r in gram_fixed_point(spark, str(d)).collect()}
    s = 1_000_000
    assert out[(0, 0)] == (1 * 1 + 3 * 3) * s * s
    assert out[(0, 1)] == (1 * 2 + 3 * -1) * s * s
    assert out[(1, 1)] == (2 * 2 + 1 * 1) * s * s


def test_interpolation_hand_computed(spark, tmp_path):
    day = lambda n: dt.datetime(2024, 1, n)  # noqa: E731
    # day1 sum=10.00, day4 sum=40.00 → day2 = 20.00, day3 = 30.00
    rows = [
        (1, day(1), 1, "a", 10.0, "{}"),
        (2, day(4), 1, "a", 40.0, "{}"),
    ]
    d = tmp_path / "fx"
    spark.createDataFrame(rows, EV).write.parquet(str(d / "events.parquet"))
    out = {
        r["day"].day: (r["n_events"], r["value_cents"], r["interpolated"])
        for r in interpolated_daily_value(spark, str(d)).collect()
    }
    assert out[1] == (1, 1000, False)
    assert out[2] == (0, 2000, True)
    assert out[3] == (0, 3000, True)
    assert out[4] == (1, 4000, False)


def test_interpolation_corpus_dense_and_observed_exact(spark, sf_dir):
    rows = interpolated_daily_value(spark, sf_dir).collect()
    assert rows
    days = [r["day"] for r in rows]
    assert all((b - a) == dt.timedelta(days=1) for a, b in zip(days, days[1:]))
    for r in rows:
        assert r["interpolated"] == (r["n_events"] == 0)


def test_distributed_prefix_sum_equals_global_window(spark, sf_dir):
    """The two-phase month-partitioned prefix sum must be bit-equal to
    the naive single-partition global window, and its plan must contain
    NO unpartitioned window over the fact rows."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from graphdb_td2_spark.io import read_table
    from graphdb_td2_spark.operators.timeseries import running_revenue_distributed

    fast = running_revenue_distributed(spark, sf_dir)
    orders = read_table(spark, sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    daily = (
        orders.select(
            F.date_trunc("day", "o_orderdate").alias("day"),
            F.col("o_totalprice").cast("decimal(14,2)").alias("p"),
        )
        .groupBy("day")
        .agg((F.sum("p") * 100).cast("long").alias("cents"))
    )
    naive = daily.select(
        "day",
        "cents",
        F.sum("cents")
        .over(Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("running_cents"),
    ).orderBy("day")
    assert [tuple(r) for r in fast.collect()] == [tuple(r) for r in naive.collect()]


def test_label_centroid_distances_shape(spark, sf_dir):
    from graphdb_td2_spark.similarity.gram import label_centroid_distances

    rows = label_centroid_distances(spark, sf_dir).collect()
    labels = set()
    for r in rows:
        assert r["label_a"] < r["label_b"]
        assert r["sq_dist_fp"] >= 0
        labels.update((r["label_a"], r["label_b"]))
    k = len(labels)
    assert len(rows) == k * (k - 1) // 2


def test_channel_cohort_week0_is_full(spark, sf_dir):
    from graphdb_td2_spark.operators.windows import channel_cohort_retention

    rows = channel_cohort_retention(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["week_offset"] == 0:
            assert r["retention"] == 1.0
        assert 0 < r["retention"] <= 1.0 or r["week_offset"] > 0


def test_smoothed_daily_revenue_kernel(spark, sf_dir):
    from graphdb_td2_spark.operators.timeseries import smoothed_daily_revenue

    rows = smoothed_daily_revenue(spark, sf_dir).collect()
    assert rows
    # day 1 has only its own tap → smoothed == raw
    assert rows[0]["smoothed_cents"] == rows[0]["cents"]
    # smoothing stays within the window's min/max envelope
    for i, r in enumerate(rows):
        window = [x["cents"] for x in rows[max(0, i - 7): i + 1]]
        assert min(window) <= r["smoothed_cents"] <= max(window)


def test_weekly_movers_shape(spark, sf_dir):
    from graphdb_td2_spark.recs.trending import weekly_product_movers

    rows = weekly_product_movers(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    growths = [abs(r["growth"]) for r in rows]
    assert growths == sorted(growths, reverse=True)
    for r in rows:
        assert r["growth"] == r["last_week_items"] - r["prev_week_items"]


def test_embedding_quality_clean_corpus(spark, sf_dir):
    from graphdb_td2_spark.similarity.gram import embedding_quality_report

    (r,) = embedding_quality_report(spark, sf_dir).collect()
    assert r["n_vecs"] > 0 and r["n_dims"] > 0
    assert r["n_dim_mismatch"] == 0 and r["n_null_vec"] == 0
    assert 0 <= r["n_zero_norm"] <= r["n_vecs"]
    assert 0 < r["p50_sqnorm_fp"] <= r["max_sqnorm_fp"]
