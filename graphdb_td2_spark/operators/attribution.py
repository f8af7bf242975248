"""Last-touch conversion attribution — for every purchase, which event
type (view, click, …) the user did last within the attribution window.
The standard marketing/causal rollup over event streams, and the
window-family pattern the existing funnel/deltas operators don't cover:
a *conditional carry-forward* (``last(..., ignorenulls=True)`` over an
unbounded-preceding frame) instead of fixed-offset lag.

Determinism: the per-user order is ``(ts, event_id)``; the carried
struct leads with ``ts`` so "latest" is unambiguous; the window cutoff
is exact interval arithmetic on timestamps (UTC session).

Scale notes: one shuffle on user_id — the same partitioning every
window-family operator shares (sessionize, deltas, funnel), so on a
pre-bucketed events lake they all pipeline over one exchange. The
attribution rollup output is |event_type|-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..io import read_table

ATTRIBUTION_WINDOW = "1 hour"
CONVERSION = "purchase"


def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(attributed_type, n_purchases)`` — purchases
    credited to the user's latest non-purchase event within 1 hour
    before the purchase ('none' when there is no such touch), ordered by
    attributed_type."""
    ev = read_table(
        spark, sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]
    )
    seq = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(
            F.col("event_type") != CONVERSION,
            F.struct(F.col("ts").alias("t_ts"), F.col("event_type").alias("t_type")),
        ),
        ignorenulls=True,
    ).over(seq)
    return (
        ev.withColumn("touch", touch)
        .filter(F.col("event_type") == CONVERSION)
        .select(
            F.when(
                F.col("touch").isNotNull()
                & (
                    F.col("touch.t_ts")
                    >= F.col("ts") - F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}")
                ),
                F.col("touch.t_type"),
            )
            .otherwise(F.lit("none"))
            .alias("attributed_type")
        )
        .groupBy("attributed_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_purchases"))
        .orderBy("attributed_type")
    )


def ushape_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(event_type, credit_bp, n_touches)`` — U-shaped
    (position-based) multi-touch attribution: every purchase distributes
    10,000 basis points over its non-purchase touches within the 1-hour
    window — 40% to the first touch, 40% to the last, 20% split over the
    middles — summed per touch type, ordered by event_type.

    Exact-integer credit split: middles get ``2000 DIV m`` bp each and
    the integer-division remainder rides on the LAST touch, so every
    attributed purchase contributes exactly 10,000 bp (2 touches →
    5000/5000, 1 touch → 10000). Purchases with no in-window touch are
    excluded (the last-touch rollup above already counts them as
    'none').

    Scale notes: the (purchase × touch) pair generation is an equi-join
    on user_id with a time-band predicate — the same banded shape as
    ``event_burst_pairs``, pair count bounded by per-user activity per
    window; ranking first/last touches is one window partitioned by
    purchase. Output is |event_type|-bounded.
    """
    ev = read_table(
        spark, sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]
    )
    purchases = ev.filter(F.col("event_type") == CONVERSION).select(
        F.col("user_id").alias("u"),
        F.col("ts").alias("pts"),
        F.col("event_id").alias("pid"),
    )
    touches = ev.filter(F.col("event_type") != CONVERSION)
    pairs = touches.join(
        purchases,
        (F.col("user_id") == F.col("u"))
        & (F.col("ts") < F.col("pts"))
        & (F.col("ts") >= F.col("pts") - F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}")),
    )
    w = Window.partitionBy("pid").orderBy(F.asc("ts"), F.asc("event_id"))
    ranked = pairs.select(
        "pid",
        "event_type",
        F.row_number().over(w).alias("pos"),
        F.count(F.lit(1)).over(Window.partitionBy("pid")).alias("k"),
    )
    mid_share = F.expr("2000 DIV (k - 2)")
    credit = (
        F.when(F.col("k") == 1, F.lit(10000))
        .when(F.col("k") == 2, F.lit(5000))
        .when(F.col("pos") == 1, F.lit(4000))
        .when(
            F.col("pos") == F.col("k"),
            F.lit(4000) + F.lit(2000) - (F.col("k") - 2) * mid_share,
        )
        .otherwise(mid_share)
    )
    return (
        ranked.select("event_type", credit.cast("long").alias("credit"))
        .groupBy("event_type")
        .agg(
            F.sum("credit").cast("long").alias("credit_bp"),
            F.count(F.lit(1)).cast("long").alias("n_touches"),
        )
        .orderBy("event_type")
    )


def conversion_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(first_touch_type, n_purchases, p50_latency_s,
    p90_latency_s)`` — time-to-convert distribution: for every purchase
    with at least one in-window touch, latency from the FIRST touch to
    the purchase, quantiled per first-touch type. Ordered by type.

    Determinism: the first touch is the ``min_by`` over the total
    (ts, event_id) order; latencies are exact integer seconds
    (microsecond difference DIV 1e6 — micros are non-negative so DIV's
    truncation matches DuckDB's ``//``); quantiles are the exact
    linear-interpolation percentile already parity-pinned by
    ``value_percentiles``.

    Scale notes: the pair join is the same banded user/time shape as
    ``ushape_attribution``; per-purchase reduction is a map-side-partial
    ``min_by`` hash agg (no window); output is |event_type|-bounded.
    """
    ev = read_table(
        spark, sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]
    )
    purchases = ev.filter(F.col("event_type") == CONVERSION).select(
        F.col("user_id").alias("u"),
        F.col("ts").alias("pts"),
        F.col("event_id").alias("pid"),
    )
    touches = ev.filter(F.col("event_type") != CONVERSION)
    pairs = touches.join(
        purchases,
        (F.col("user_id") == F.col("u"))
        & (F.col("ts") < F.col("pts"))
        & (F.col("ts") >= F.col("pts") - F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}")),
    )
    first = pairs.groupBy("pid").agg(
        F.min_by(
            F.struct(F.col("event_type"), F.col("ts")),
            F.struct(F.col("ts"), F.col("event_id")),
        ).alias("ft"),
        F.first("pts").alias("pts"),
    )
    lat = first.select(
        F.col("ft.event_type").alias("first_touch_type"),
        F.expr("(unix_micros(pts) - unix_micros(ft.ts)) DIV 1000000").alias(
            "latency_s"
        ),
    )
    from .percentiles import as_value, percentile_numerators

    pf = percentile_numerators(
        lat, ["first_touch_type"], "latency_s",
        [(1, 2, "p50n"), (9, 10, "p90n")],
    )
    return pf.select(
        "first_touch_type",
        F.col("n").alias("n_purchases"),
        as_value(F.col("p50n"), 2).alias("p50_latency_s"),
        as_value(F.col("p90n"), 10).alias("p90_latency_s"),
    ).orderBy("first_touch_type")
