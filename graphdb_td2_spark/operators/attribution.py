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
