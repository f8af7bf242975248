"""Robust anomaly detection over the event stream — median/MAD
(median absolute deviation) outlier flagging per event type, the
standard-deviation-free robust statistic a monitoring pipeline uses
(mean/σ break down exactly when outliers are present).

Cross-engine exactness: both median passes are the exact linear-
interpolation ``percentile`` (IEEE-identical to DuckDB ``quantile_cont``
— the parity ``value_percentiles`` already pins); the threshold
``med + K·MAD`` is two IEEE ops on those identical doubles, so the
outlier count is bit-stable.

Scale notes: two grouped percentile passes over a 2-column projection
(medians are per-type scalars; the second pass re-aggregates deviations
against the broadcast medians) and one narrow flag count. At 100 TB the
exact percentile becomes the GK-sketch variant in
``functions/sketches.py`` — same plan shape, bounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import read_table

MAD_K = 3  # flag |v - median| > K · MAD


def event_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(event_type, med, mad, n_events, n_outliers)``
    — per-type robust center/spread and the count of values beyond
    ``med ± 3·MAD``, ordered by event_type."""
    from .percentiles import percentile_numerators

    events = read_table(spark, sf_dir, "events", ["event_type", "value"])
    # exact half-cent algebra: med = mednum/200 (2-dp values through exact
    # cents; the den-2 interpolation numerator is an exact INTEGER in
    # half-cents), dev = |2c − mednum|/200, mad = madnum/400, and the
    # outlier test dev > K·mad is the integer test 2·devx > K·madnum —
    # no float enters until the two output divisions
    q = events.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    med = percentile_numerators(
        q.select("event_type", F.col("c").alias("cents")),
        ["event_type"],
        "cents",
        [(1, 2, "mednum")],
    ).select("event_type", "mednum")
    with_dev = q.join(F.broadcast(med), "event_type").select(
        "event_type",
        "mednum",
        F.abs(F.col("c") * 2 - F.col("mednum")).alias("devx"),
    )
    mad = percentile_numerators(
        with_dev.select("event_type", F.col("devx").alias("d")),
        ["event_type"],
        "d",
        [(1, 2, "madnum")],
    ).select("event_type", "madnum")
    return (
        with_dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            (F.first("mednum").cast("double") / F.lit(200.0)).alias("med"),
            (F.first("madnum").cast("double") / F.lit(400.0)).alias("mad"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(
                (F.col("devx") * 2 > F.lit(MAD_K) * F.col("madnum")).cast("long")
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


def dow_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(dow, n_days, med_cents, mad_cents, n_outliers)``
    — seasonally-adjusted daily-revenue outliers: daily event-value
    totals (exact cents) compared against their DAY-OF-WEEK median/MAD,
    so weekday/weekend seasonality doesn't masquerade as anomaly.
    Ordered by dow (1=Sunday … 7=Saturday, Spark convention).

    Determinism: daily sums are exact DECIMAL→BIGINT cents; both median
    passes are the parity-pinned exact percentile; the 3·MAD threshold
    is two IEEE ops on those doubles. Scale: the heavy pass is the daily
    rollup (one partial-agged hash agg); everything after ranges over
    the bounded day axis.
    """
    events = read_table(spark, sf_dir, "events", ["ts", "value"])
    daily = (
        events.select(
            F.date_trunc("day", "ts").alias("day"),
            F.col("value").cast("decimal(14,2)").alias("v"),
        )
        .groupBy("day")
        .agg((F.sum("v") * 100).cast("long").alias("cents"))
        .select(F.dayofweek("day").alias("dow"), "cents")
    )
    from .percentiles import percentile_numerators

    # exact half-cent algebra (see event_value_anomalies): med_cents =
    # mednum/2, dev = devx/2 (half-cents), mad_cents = madnum/4, and the
    # outlier test is the integer comparison 2·devx > K·madnum
    med = percentile_numerators(
        daily, ["dow"], "cents", [(1, 2, "mednum")]
    ).select("dow", "mednum")
    dev = daily.join(F.broadcast(med), "dow").select(
        "dow",
        "mednum",
        F.abs(F.col("cents") * 2 - F.col("mednum")).alias("devx"),
    )
    mad = percentile_numerators(
        dev.select("dow", F.col("devx").alias("d")), ["dow"], "d",
        [(1, 2, "madnum")],
    ).select("dow", "madnum")
    return (
        dev.join(F.broadcast(mad), "dow")
        .groupBy("dow")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            (F.first("mednum").cast("double") / F.lit(2.0)).alias("med_cents"),
            (F.first("madnum").cast("double") / F.lit(4.0)).alias("mad_cents"),
            F.sum(
                (F.col("devx") * 2 > F.lit(MAD_K) * F.col("madnum")).cast("long")
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .orderBy("dow")
    )


def winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(event_type, n_events, p01, p99, n_clipped,
    mean_raw, mean_winsorized)`` — per-type winsorization audit: clip
    values to [p1, p99] and compare means — the robust-preprocessing
    step a feature pipeline applies before standardization. Ordered by
    event_type.

    Determinism: exact-interpolation percentiles (parity-pinned);
    means are exact DECIMAL sums divided once (clipped values are
    min/max against the percentile doubles — the same IEEE ops in both
    engines). Scale: two grouped passes (percentiles, then clip+agg
    against the broadcast bounds).
    """
    from .percentiles import percentile_numerators

    events = read_table(spark, sf_dir, "events", ["event_type", "value"])
    q = events.select(
        "event_type",
        "value",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    # engine-exact bounds: integer percentile numerators over the cents
    # histogram (operators/percentiles.py); p01 = p01n/10000 exactly, and
    # the clip test value < p01 becomes the INTEGER test 100·c < p01n
    bounds = percentile_numerators(
        q.select("event_type", F.col("c").alias("cents")),
        ["event_type"],
        "cents",
        [(1, 100, "p01n"), (99, 100, "p99n")],
    ).select("event_type", "p01n", "p99n")
    # A direct Σ(clipped doubles) would be summation-order-dependent; the
    # winsorized mean decomposes exactly instead: the in-range mass is an
    # exact DECIMAL sum (≤2-dp values), the clipped tails contribute
    # count·bound — a fixed expression over deterministic scalars.
    tagged = q.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "value",
        (F.col("p01n").cast("double") / F.lit(10000.0)).alias("p01"),
        (F.col("p99n").cast("double") / F.lit(10000.0)).alias("p99"),
        (F.col("c") * 100 < F.col("p01n")).alias("lo"),
        (F.col("c") * 100 > F.col("p99n")).alias("hi"),
    )
    n = F.count(F.lit(1))
    agg = tagged.groupBy("event_type").agg(
        n.cast("long").alias("n_events"),
        F.first("p01").alias("p01"),
        F.first("p99").alias("p99"),
        F.sum(F.col("lo").cast("long")).cast("long").alias("n_lo"),
        F.sum(F.col("hi").cast("long")).cast("long").alias("n_hi"),
        F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("sum_all"),
        F.sum(
            F.when(
                ~F.col("lo") & ~F.col("hi"), F.col("value").cast("decimal(14,2)")
            ).otherwise(F.lit(0).cast("decimal(14,2)"))
        )
        .cast("double")
        .alias("sum_mid"),
    )
    nd = F.col("n_events").cast("double")
    return agg.select(
        "event_type",
        "n_events",
        "p01",
        "p99",
        (F.col("n_lo") + F.col("n_hi")).cast("long").alias("n_clipped"),
        (F.col("sum_all") / nd).alias("mean_raw"),
        (
            (
                F.col("sum_mid")
                + F.col("n_lo").cast("double") * F.col("p01")
                + F.col("n_hi").cast("double") * F.col("p99")
            )
            / nd
        ).alias("mean_winsorized"),
    ).orderBy("event_type")
