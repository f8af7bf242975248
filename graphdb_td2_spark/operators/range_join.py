"""Banded time-range join [extension].

The reference has only id-equality joins (SURVEY.md §2.C: "no
theta/range/as-of/interval joins exist"); this adds the interval/range
class the as-of join (``operators/asof.py``) started.

A naive range join ``a ⋈ b ON key ∧ (0 ≤ b.ts − a.ts ≤ gap)`` plans as a
broadcast-nested-loop (quadratic per key) — unusable at corpus scale. The
scalable shape is *banding*: quantize ``ts`` into ``gap``-width bins; a
qualifying pair's bins differ by at most 1, so an **equi**-join on
``(key, bin)`` with the probe side exploded to ``{bin, bin−1}`` finds
every candidate, and the exact inequality runs as a cheap post-filter.
Cost: one shuffle on uniform keys (2× probe duplication), no nested loop
— the same banding trick the shingle DF-cap family uses, applied to time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..io import read_table

DEFAULT_GAP_SECONDS = 300


def banded_range_self_pairs(
    df: DataFrame,
    key: str,
    ts: str,
    id_col: str,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
) -> DataFrame:
    """Ordered pairs of rows with equal ``key`` whose timestamps are within
    ``gap_seconds`` (pair order: lexicographic ``(ts, id_col)``, so equal
    timestamps pair exactly once). Returns one row per pair:
    ``(key, id_a, id_b, gap_us)`` with integer-microsecond gaps.
    """
    gap_us = gap_seconds * 1_000_000
    binned = df.select(
        F.col(key).alias("k"),
        F.col(id_col).alias("rid"),
        F.unix_micros(F.col(ts)).alias("us"),
    ).withColumn("bin", F.floor(F.col("us") / F.lit(gap_us)))

    left = binned.select(
        F.col("k"),
        F.col("rid").alias("id_a"),
        F.col("us").alias("us_a"),
        F.col("bin"),
    )
    # Probe side explodes to its own bin and the previous one: any pair
    # with 0 ≤ us_b − us_a ≤ gap has bin_b ∈ {bin_a, bin_a + 1}.
    right = binned.select(
        F.col("k"),
        F.col("rid").alias("id_b"),
        F.col("us").alias("us_b"),
        F.explode(F.array(F.col("bin"), F.col("bin") - 1)).alias("bin"),
    )
    ordered: Column = (F.col("us_a") < F.col("us_b")) | (
        (F.col("us_a") == F.col("us_b")) & (F.col("id_a") < F.col("id_b"))
    )
    return (
        left.join(right, ["k", "bin"])
        .filter(ordered & (F.col("us_b") - F.col("us_a") <= F.lit(gap_us)))
        .select(
            F.col("k").alias(key),
            "id_a",
            "id_b",
            (F.col("us_b") - F.col("us_a")).alias("gap_us"),
        )
    )


def event_burst_pairs(
    spark: SparkSession, sf_dir: str, gap_seconds: int = DEFAULT_GAP_SECONDS
) -> DataFrame:
    """Per-user event-burst summary: pairs of a user's events ≤ 5 minutes
    apart (banded range self-join), aggregated to pair count and mean gap.
    The mean divides two exact integers (Σ gap_µs, n) — engine-portable."""
    events = read_table(spark, sf_dir, "events", ["user_id", "ts", "event_id"])
    pairs = banded_range_self_pairs(
        events, key="user_id", ts="ts", id_col="event_id", gap_seconds=gap_seconds
    )
    return (
        pairs.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("gap_us").alias("sum_gap_us"),
        )
        .select(
            "user_id",
            "n_pairs",
            (F.col("sum_gap_us").cast("double") / F.lit(1_000_000.0) / F.col("n_pairs").cast("double")).alias("avg_gap_secs"),
        )
        .orderBy("user_id")
    )
