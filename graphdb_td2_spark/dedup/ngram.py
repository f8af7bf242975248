"""n-gram Jaccard near-duplicate pairs with shingle blocking.

Exact Jaccard over all pairs is O(n²); the scalable shape is
*inverted-index blocking*: explode each document's distinct shingles, self-
join on the shingle (only documents sharing ≥1 shingle meet), count shared
shingles per pair, then ``J = |A∩B| / (|A| + |B| − |A∩B|)`` — one double
division, engine-exact.

Scale notes: the shingle self-join is the classic candidate generator; hot
(high document-frequency) shingles quadratically blow up the join, so they
are dropped with a DF cap (``max_df``) — standard practice (they carry no
near-dup signal). AQE skew-join covers residual skew. Output is capped by a
Jaccard threshold, keeping the result set sparse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .shingles import cached_doc_shingles

DEFAULT_THRESHOLD = 0.10
DEFAULT_MAX_DF = 100


def ngram_jaccard_pairs(
    spark: SparkSession,
    sf_dir: str,
    k: int = 3,
    threshold: float = DEFAULT_THRESHOLD,
    max_df: int = DEFAULT_MAX_DF,
) -> DataFrame:
    """Document pairs with shingle-Jaccard ≥ ``threshold`` (computed over
    distinct k-token shingles, hot shingles DF-capped)."""
    # The exploded shingle relation feeds four plan legs (sizes, DF cap,
    # both self-join sides) — served from the shared persisted shingle
    # table instead of re-tokenizing per leg (dedup/shingles.py).
    doc_shingles = cached_doc_shingles(spark, sf_dir, k)
    rare = (
        doc_shingles.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("shingle")
    )
    filtered = doc_shingles.join(rare, "shingle")
    # |A| and |B| ride the exploded rows (denormalized in the shingle
    # table), so the pair aggregation yields the full Jaccard inputs in ONE
    # shuffle — no per-document size join afterwards (a per-doc lookup
    # would be un-broadcastable at corpus scale).
    a, b = filtered.alias("a"), filtered.alias("b")
    return (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.first(F.col("a.n_shingles")).alias("n_a"),
            F.first(F.col("b.n_shingles")).alias("n_b"),
        )
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id_a", "doc_id_b", "n_common", "jaccard")
    )
