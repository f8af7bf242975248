"""Sketch aggregates [extension] — the sublinear-memory summaries a
100 TB pipeline uses where exact answers need an unbounded hash table:
HyperLogLog++ distinct counts (``approx_count_distinct``) and quantile
summaries (``approx_percentile``), both JVM-side partial aggregates that
merge associatively across partitions (one narrow shuffle of sketch
state, never of rows).

Sketches are engine-specific by nature (HLL register layouts and
quantile-summary compaction differ across implementations), so these are
deliberately NOT in the cross-engine oracle contract: correctness is
verified by error-bound units against the exact aggregates
(``tests/test_sketches.py``), which is how sketch implementations are
actually validated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import read_table

# approx_count_distinct's maximum relative standard deviation argument;
# the unit asserts a 5-sigma-ish envelope on the corpus.
DEFAULT_RSD = 0.05
QUANTILE_ACCURACY = 10_000  # approx_percentile accuracy knob (1/eps)


def approx_distinct_users(
    spark: SparkSession, sf_dir: str, rsd: float = DEFAULT_RSD
) -> DataFrame:
    """Per event type: exact distinct users next to the HLL++ estimate and
    its realized relative error — the audit row a sketch rollout ships
    with. At scale the exact column is the one you drop; here it is the
    measuring stick."""
    events = read_table(spark, sf_dir, "events", ["user_id", "event_type"])
    return (
        events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_exact"),
            F.approx_count_distinct("user_id", rsd=rsd).alias("n_approx"),
        )
        .select(
            "event_type",
            "n_exact",
            "n_approx",
            (
                F.abs(F.col("n_approx") - F.col("n_exact")).cast("double")
                / F.col("n_exact").cast("double")
            ).alias("rel_error"),
        )
        .orderBy("event_type")
    )


def approx_value_quantiles(
    spark: SparkSession, sf_dir: str, accuracy: int = QUANTILE_ACCURACY
) -> DataFrame:
    """Per event type: approximate p50/p95/p99 of ``value`` via the
    Greenwald-Khanna-style summary behind ``approx_percentile`` (rank
    error <= n/accuracy), next to the exact percentiles."""
    events = read_table(spark, sf_dir, "events", ["event_type", "value"])
    return (
        events.groupBy("event_type")
        .agg(
            F.expr(
                f"approx_percentile(value, array(0.5, 0.95, 0.99), {accuracy})"
            ).alias("approx"),
            F.expr("percentile(value, array(0.5, 0.95, 0.99))").alias("exact"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            F.col("approx")[0].alias("p50_approx"),
            F.col("exact")[0].alias("p50_exact"),
            F.col("approx")[1].alias("p95_approx"),
            F.col("exact")[1].alias("p95_exact"),
            F.col("approx")[2].alias("p99_approx"),
            F.col("exact")[2].alias("p99_exact"),
            "n_events",
        )
        .orderBy("event_type")
    )
