"""First-order Markov transition matrix over the event stream — the
"what happens after X" profile (next-event prediction prior, funnel
diagnostics, session-model fitting) computed corpus-wide in one pass.

Reference parity: the reference's event tables model the same
user-ordered action sequences its recommendation tier consumes
(``app/etl.py`` NEXT-style edges); this is the aggregate view of those
sequences.

Plan shape: one scan → per-user ``lag`` window (shuffle on user_id —
the same partitioning ``sessionize``/``user_event_deltas`` use) →
(prev, next) hash aggregate with map-side partials. The row-count
ceiling is |event_type|², corpus-size-independent, so the output and
the per-``prev`` normalizing window are both tiny. Probability is a
single IEEE division of two exact longs (cross-engine deterministic).

Determinism: the per-user order is ``(ts, event_id)`` — event_id breaks
equal-timestamp ties, so ``lag`` sees one canonical sequence under any
partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..io import read_table


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(prev_type, next_type, n_trans, n_from, p)`` —
    observed next-event transition counts and conditional probability,
    ordered by (prev_type, next_type)."""
    ev = read_table(spark, sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    seq = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(seq))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_trans"))
    )
    norm = Window.partitionBy("prev_type")
    return (
        pairs.withColumn("n_from", F.sum("n_trans").over(norm).cast("long"))
        .withColumn(
            "p", F.col("n_trans").cast("double") / F.col("n_from").cast("double")
        )
        .select("prev_type", "next_type", "n_trans", "n_from", "p")
        .orderBy("prev_type", "next_type")
    )
