"""Sequence packing for LLM pretraining — concatenate-and-chop statistics.

Pretraining pipelines pack tokenized documents into fixed-length context
windows by concatenating the per-source token stream and chopping it every
``context_len`` tokens (documents crossing a boundary are split). The
packing itself is a streaming write; the *planning* statistics — how many
contexts a corpus yields, how many documents straddle boundaries, what
padding would be wasted under document-aligned packing — are exactly what
a data engineer needs before launching the job, and they are pure window
arithmetic:

- per-source running token total (``sum() over (partition by source order
  by doc_id)``) gives each document its [start, end) token span;
- the span's first/last context ids are integer divisions by
  ``context_len``; a document "crosses" when they differ;
- document-aligned padding waste is ``ceil(n/C)·C − n`` summed.

Everything is exact integer math plus two double divisions at the end, so
the DuckDB oracle reproduces it bit-for-bit. Scale notes: one window
shuffle on (source, doc_id) — the same partitioning a per-source packing
write would need anyway — then a partial-aggregated per-source rollup;
no self-joins, no UDFs, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..io import read_table
from .text import tokens_col

DEFAULT_CONTEXT_LEN = 2048


def _doc_spans(spark: SparkSession, sf_dir: str, c: int):
    """(source, doc_id, n_tokens, start, cum, first_ctx, last_ctx) — each
    document's token span in the per-source concatenated stream and the
    context ids it touches."""
    docs = read_table(spark, sf_dir, "documents", ["doc_id", "source", "text"])
    per_doc = docs.select(
        "doc_id",
        "source",
        F.size(tokens_col(F.col("text"))).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    return (
        per_doc.withColumn("cum", F.sum("n_tokens").over(w))
        .withColumn("start", F.col("cum") - F.col("n_tokens"))
        .withColumn("first_ctx", F.expr(f"start div {c}"))
        .withColumn("last_ctx", F.expr(f"(cum - 1) div {c}"))
    )


def context_assignments(
    spark: SparkSession, sf_dir: str, context_len: int = DEFAULT_CONTEXT_LEN
) -> DataFrame:
    """The packing output itself: one row per (document, context window)
    with the IN-DOCUMENT token range ``[tok_from, tok_to)`` that lands in
    that context — exactly what a splitter needs to emit packed training
    rows. A document spanning k windows yields k rows (explode of its
    context-id range; pure integer arithmetic, exact SQL oracle)."""
    c = int(context_len)
    spans = _doc_spans(spark, sf_dir, c)
    return spans.select(
        "source",
        "doc_id",
        F.explode(F.sequence("first_ctx", "last_ctx")).alias("context_id"),
        "start",
        "cum",
    ).select(
        "source",
        "doc_id",
        "context_id",
        F.greatest(
            F.col("context_id") * c - F.col("start"), F.lit(0).cast("long")
        ).alias("tok_from"),
        (
            F.least((F.col("context_id") + 1) * c, F.col("cum")) - F.col("start")
        ).alias("tok_to"),
    )


def context_packing_stats(
    spark: SparkSession, sf_dir: str, context_len: int = DEFAULT_CONTEXT_LEN
) -> DataFrame:
    """Per-source concatenate-and-chop packing plan over ``documents``."""
    c = int(context_len)
    spans = _doc_spans(spark, sf_dir, c)
    return (
        spans.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("cum").alias("total_tokens"),
            F.expr(f"(max(cum) + {c} - 1) div {c}").alias("n_contexts"),
            F.sum(
                F.when(F.col("last_ctx") > F.col("first_ctx"), 1).otherwise(0)
            ).cast("long").alias("crossing_docs"),
            F.sum(F.expr(f"(n_tokens + {c} - 1) div {c}")).alias(
                "__aligned_contexts"
            ),
        )
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "n_contexts",
            "crossing_docs",
            (
                F.col("crossing_docs").cast("double")
                / F.col("n_docs").cast("double")
            ).alias("crossing_frac"),
            (
                (F.col("__aligned_contexts") * c - F.col("total_tokens")).cast(
                    "double"
                )
                / (F.col("__aligned_contexts") * c).cast("double")
            ).alias("aligned_padding_waste_frac"),
        )
        .orderBy("source")
    )
