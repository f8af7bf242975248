"""Exact deduplication: hash-groupBy on a normalized content digest — the
baseline dedup every training-data pipeline runs first.

Normalization: lowercase + whitespace collapse (so trivially-reformatted
copies collapse); digest = md5 (identical hex output in every engine).

Scale notes: one hash aggregate keyed by a 128-bit digest — uniformly
distributed keys, no skew; map-side partial aggregation applies. At 100 TB
this is the cheapest possible full-corpus shuffle (32-byte keys, counts
only)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..io import read_table


def content_digest(text: Column) -> Column:
    return F.md5(F.regexp_replace(F.trim(F.lower(text)), r"\s+", " "))


def exact_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplicate statistics: total docs, distinct digests,
    and the number of redundant copies (total - distinct)."""
    docs = read_table(spark, sf_dir, "documents", ["doc_id", "text", "source"])
    digests = docs.select("source", content_digest(F.col("text")).alias("digest"))
    return (
        digests.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("digest").alias("n_distinct"),
        )
        .withColumn("n_redundant", F.col("n_docs") - F.col("n_distinct"))
        .orderBy("source")
    )


def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (lowest id) per normalized digest."""
    return (
        docs.withColumn("_digest", content_digest(F.col(text_col)))
        .groupBy("_digest")
        .agg(F.min(id_col).alias(id_col))
        .join(docs, id_col)
        .drop("_digest")
    )
