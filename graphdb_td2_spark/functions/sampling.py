"""Deterministic hash sampling [extension] — the data-selection primitive
of a training-data pipeline (down-sample a corpus reproducibly, split
train/eval, A/B a pipeline change on the same 5%).

``df.sample()`` is seed-dependent per partitioning and not reproducible
across engines; hashing a stable key is: a row is kept iff
``md5(key) mod D < rate·D``. Same rows selected on every engine, every
run, any partitioning — and the predicate is a narrow per-row expression
(no shuffle, no coordination), so it scales embarrassingly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..io import read_table

DENOM = 10_000


def hash_sample_flag(key: Column, rate: float, denom: int = DENOM) -> Column:
    """Boolean keep-flag: md5-uniform bucket of ``key`` below rate·denom.
    Exact integer math on the first 8 md5 hex digits (engine-portable)."""
    bucket = (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
        % denom
    )
    return bucket < int(rate * denom)


def hash_sample(df: DataFrame, key: str, rate: float) -> DataFrame:
    """The rows of ``df`` whose ``key`` hashes into the sample."""
    return df.filter(hash_sample_flag(F.col(key), rate))


def sampled_event_stats(
    spark: SparkSession, sf_dir: str, rate: float = 0.05
) -> DataFrame:
    """Per-type counts over a deterministic 5% sample of ``events`` vs the
    full population — the sanity check a sampling pipeline ships with
    (sample_share exposes bias; md5-uniformity keeps it near ``rate``)."""
    events = read_table(spark, sf_dir, "events", ["event_id", "event_type"])
    flagged = events.withColumn(
        "in_sample", hash_sample_flag(F.col("event_id"), rate)
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("in_sample").cast("long")).alias("n_sampled"),
        )
        .withColumn(
            "sample_share",
            F.col("n_sampled").cast("double") / F.col("n_total").cast("double"),
        )
        .orderBy("event_type")
    )
