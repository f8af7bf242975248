"""JSON extraction over ``events.props`` (SURVEY.md §2.H note: the corpus
adds a JSON column the reference never had; ``get_json_object`` /
``from_json`` are the exposed surface).

Determinism: extracted values are integers; value sums use the exact-decimal
trick (≤2-dp doubles → DECIMAL(18,6) → double)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import read_table


def props_k(events: DataFrame) -> DataFrame:
    return events.withColumn("k", F.get_json_object("props", "$.k").cast("long"))


def props_key_histogram(spark: SparkSession, sf_dir: str, bucket: int = 10) -> DataFrame:
    """Histogram of the ``props.k`` JSON key in ``bucket``-wide bins."""
    events = read_table(spark, sf_dir, "events", ["props"])
    return (
        props_k(events)
        .filter(F.col("k").isNotNull())
        .groupBy((F.floor(F.col("k") / bucket) * bucket).alias("k_bucket"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("k_bucket")
    )


def event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type event stats incl. a JSON-extracted dimension: count, exact
    value sum, deterministic average, min/max."""
    events = read_table(spark, sf_dir, "events", ["event_type", "value", "props"])
    return (
        props_k(events)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.sum("k").alias("sum_k"),
        )
        .withColumn("avg_value", F.col("sum_value") / F.col("n_events"))
        .orderBy("event_type")
    )


def props_map_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-free JSON profiling: parse ``props`` as a MAP and explode
    every key — per key, occurrence count and distinct-value cardinality.
    The discovery query run before anyone writes extraction paths
    (`get_json_object` needs to know the keys; this finds them).
    Map-typed columns + explode are the §2.H surface the fixed-path
    queries don't touch. Narrow explode + one partial-agg'd shuffle."""
    events = read_table(spark, sf_dir, "events", ["props"])
    kv = events.select(
        F.explode(F.from_json("props", "map<string,string>")).alias("key", "value")
    )
    return (
        kv.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("value").alias("n_distinct_values"),
        )
        .orderBy("key")
    )


def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(k_bucket, n_events, min_k, max_k)`` — the
    ``props`` JSON profiled through Spark's VARIANT type
    (``parse_json`` → ``variant_get``), the open-schema semi-structured
    path Spark 4 ships for exactly this "JSON column of unknown shape"
    case. Functionally the binary-encoded sibling of
    ``props_key_histogram``; at scale VARIANT's advantage is that the
    parse happens ONCE into a shredded binary value and every
    ``variant_get`` is a cheap path read, where repeated
    ``get_json_object`` calls re-parse the string per extraction.
    Ordered by k_bucket.
    """
    events = read_table(spark, sf_dir, "events", ["props"])
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return (
        events.select(k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy((F.floor(F.col("k") / 10) * 10).cast("long").alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
        )
        .orderBy("k_bucket")
    )
