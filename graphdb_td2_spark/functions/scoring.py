"""Model-based quality scoring [extension]: a linear classifier applied
corpus-wide as a Spark expression — the "quality classifier" stage of an
LLM data pipeline (fastText-style filtering), distilled to its Spark
shape: per-row feature extraction → dot product with broadcast weights →
threshold keep decision, all inside whole-stage codegen with zero Python.

The heuristic rule-based filter is ``text.quality_filter_stats``; this is
its learned-model counterpart. The weights here are fixed demo constants
(the operator contract is the *inference plan*, not the model fit) —
swapping in trained weights is a constant change.

Cross-engine determinism: features are exact integer counts; ratio
features use integer fixed-point division (``div``/``//`` on positive
longs — identical truncation in both engines); the logit is an integer
dot product. The only double is the final mean (one division).

Scale notes: one narrow projection over the pruned (source, text) scan +
one partial-aggregated per-source rollup — the same single-shuffle shape
as the other text-tier rollups; no joins, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import read_table
from .text import LANG_LEXICONS, tokens_col

STOPWORDS_EN = LANG_LEXICONS["en"]

FP = 1_000_000
# logit_fp = W_TTR·ttr_fp + W_STOP·stop_fp + W_MLEN·mlen_fp  (fp = ×1e6)
W_TTR = 2
W_STOP = 4
W_MLEN = -1
KEEP_THRESHOLD_FP = -3_300_000  # ≈ corpus median → a meaningful split


def quality_logit_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source classifier rollup: docs scored, docs kept, keep rate,
    mean/min/max logit (fixed-point bigints; mean is one division)."""
    docs = read_table(spark, sf_dir, "documents", ["source", "text"])
    toks = tokens_col(F.col("text"))
    feats = docs.select(
        "source",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS_EN)))
        .cast("long")
        .alias("stop_hits"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).alias("sum_len"),
    )
    scored = feats.select(
        "source",
        (
            F.lit(W_TTR) * F.expr(f"(n_distinct * {FP}) div n_tokens")
            + F.lit(W_STOP) * F.expr(f"(stop_hits * {FP}) div n_tokens")
            + F.lit(W_MLEN) * F.expr(f"(sum_len * {FP}) div n_tokens")
        ).alias("logit_fp"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                (F.col("logit_fp") >= F.lit(KEEP_THRESHOLD_FP)).cast("long")
            ).alias("n_kept"),
            F.sum("logit_fp").cast("long").alias("sum_logit_fp"),
            F.min("logit_fp").alias("min_logit_fp"),
            F.max("logit_fp").alias("max_logit_fp"),
        )
        .select(
            "source",
            "n_docs",
            "n_kept",
            (F.col("n_kept").cast("double") / F.col("n_docs").cast("double")).alias(
                "keep_rate"
            ),
            (
                F.col("sum_logit_fp").cast("double") / F.col("n_docs").cast("double")
            ).alias("mean_logit_fp"),
            "min_logit_fp",
            "max_logit_fp",
        )
        .orderBy("source")
    )
