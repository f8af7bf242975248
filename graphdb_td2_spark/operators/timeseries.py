"""Hypertable-style time-series rollup with gap filling [extension].

A continuous-aggregate / ``time_bucket_gapfill`` pattern: bucket events
into fixed intervals, then densify against the full bucket axis so empty
buckets appear explicitly (count 0, null sum) — the shape a downstream
dashboard or forecasting job expects.

Shape: the bucket axis is generated from the corpus time bounds with
``sequence``/``explode`` (a few thousand rows per year at hourly grain —
driver-side-free, broadcast-sized at any corpus scale, since the axis
grows with the TIME RANGE, not the row count), cross-joined with the
observed dimension values, then left-joined to the rolled-up facts.
The rollup itself is one partial-aggregated hash agg over the fact scan.
Money sums go through DECIMAL(12,2) (cross-engine exact; see
``operators/relational.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import read_table


def gapfill_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    dim_col: str = "event_type",
    value_col: str = "value",
    grain: str = "hour",
    step: str = "INTERVAL 1 HOUR",
) -> DataFrame:
    """Dense (bucket × dim) rollup of ``events``: every bucket in
    [min, max] appears for every observed dim value; gaps carry
    ``n_events = 0`` and a null sum."""
    bucket = F.date_trunc(grain, F.col(ts_col))
    roll = (
        events.select(
            bucket.alias("bucket_start"),
            F.col(dim_col).alias("dim"),
            F.col(value_col).cast("decimal(12,2)").alias("v"),
        )
        .groupBy("bucket_start", "dim")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("v").alias("sum_v"))
    )
    axis = (
        events.agg(
            F.date_trunc(grain, F.min(ts_col)).alias("lo"),
            F.date_trunc(grain, F.max(ts_col)).alias("hi"),
        )
        .select(
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr(step))
            ).alias("bucket_start")
        )
    )
    dims = events.select(F.col(dim_col).alias("dim")).distinct()
    return (
        axis.crossJoin(dims)
        .join(roll, ["bucket_start", "dim"], "left")
        .select(
            "bucket_start",
            F.col("dim").alias(dim_col),
            F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
            F.col("sum_v").cast("double").alias("sum_value"),
        )
        .orderBy("bucket_start", dim_col)
    )


def hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry: gap-filled hourly rollup of ``events`` per
    event type."""
    events = read_table(spark, sf_dir, "events", ["ts", "event_type", "value"])
    return gapfill_rollup(events)
