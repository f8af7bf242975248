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


def dedup_token_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: per source — ``(source, n_docs, n_unique_texts,
    tokens_total, tokens_unique, tokens_saved, savings_ratio)`` — the
    dedup ROI accounting a training-data pipeline publishes: how many
    tokens exact dedup removes from each source's contribution to the
    training mix (the number that decides whether a source is worth
    re-crawling vs re-weighting). Dedup scope is per (source, digest):
    each source keeps one representative per normalized text, matching
    ``exact_dedup_stats``'s per-source accounting.

    Tokens = whitespace tokens (``token_stats``'s definition). Copies of
    a digest have identical text, hence identical token counts, so the
    per-digest aggregate carries ``min`` (= the common value) and the
    totals are exact integers; ``savings_ratio`` is the single IEEE
    division, bit-identical in DuckDB.

    Scale notes: one (source, digest)-keyed hash aggregate over the
    corpus scan (uniform 128-bit keys, map-side partial agg) followed by
    a |sources|-bounded rollup — the same minimal shuffle shape as
    ``exact_dedup_stats``, just carrying one extra long.
    """
    from ..functions.text import tokens_col

    docs = read_table(spark, sf_dir, "documents", ["doc_id", "text", "source"])
    t = docs.select(
        "source",
        content_digest(F.col("text")).alias("digest"),
        F.size(tokens_col(F.col("text"))).cast("long").alias("n_tokens"),
    )
    g = t.groupBy("source", "digest").agg(
        F.count(F.lit(1)).cast("long").alias("n_copies"),
        F.min("n_tokens").alias("tok"),
    )
    return (
        g.groupBy("source")
        .agg(
            F.sum("n_copies").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_unique_texts"),
            F.sum(F.col("n_copies") * F.col("tok")).cast("long").alias("tokens_total"),
            F.sum("tok").cast("long").alias("tokens_unique"),
        )
        .withColumn(
            "tokens_saved", F.col("tokens_total") - F.col("tokens_unique")
        )
        .withColumn(
            "savings_ratio",
            F.when(
                F.col("tokens_total") > 0,
                F.col("tokens_saved").cast("double")
                / F.col("tokens_total").cast("double"),
            ),
        )
        .orderBy("source")
    )
