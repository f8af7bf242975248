"""Sparse TF-IDF near-duplicate pairs via an inverted-index join
[extension] — the SPARSE similarity plan, complementing the dense
embedding paths (``similarity/ann.py`` brute force / LSH / IVF) and the
shingle paths (MinHash / SimHash / n-gram Jaccard).

Why a separate plan matters at 100 TB: dense cosine must touch every
(query, candidate) pair; the inverted index only joins documents that
SHARE a term, so the work is Σ_t df(t)² over the pruned vocabulary —
the classic sparse-similarity self-join (term-partitioned, perfectly
shuffle-keyed). The two standard levers are both here: a df cap prunes
stop-like terms from the vector space (they dominate join fan-out and
carry no discriminative weight), and per-term partial dot products are
map-side combined before the per-pair sum.

Cross-engine exactness (the decimal-sufficient-statistics discipline):
- idf is LINEAR inverse document frequency in fixed point,
  ``idf_fp = (N·IDF_SCALE) div df`` — exact integers; an ``ln``-based
  idf would hang the contract on libm bit-parity across engines.
- tf saturates at ``TF_CAP`` (sublinear-ish, deterministic).
- dot products and squared norms accumulate in DECIMAL(38,0) — exact
  and order-independent in both engines regardless of magnitude (the
  ADVICE-r8 remedy applied from the start instead of documenting an
  int64 headroom bound).
- cosine is the shared one-shape double expression over the exact
  statistics; ranking ties break on (doc_a, doc_b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.text import tokens_col
from ..io import read_table

IDF_SCALE = 16  # idf fixed-point scale
TF_CAP = 255  # saturating term frequency
DF_FRACTION_DEN = 10  # terms in more than N/10 docs leave the vector space
TFIDF_TOPK = 30


def tfidf_neardup_pairs(
    spark: SparkSession, sf_dir: str, k: int = TFIDF_TOPK
) -> DataFrame:
    """Registry entry: ``(rank, doc_a, doc_b, n_shared_terms, cosine)``
    — the ``k`` most TF-IDF-cosine-similar document pairs under the
    df-capped vocabulary (ties → (doc_a, doc_b) ascending). Ordered by
    rank."""
    docs = read_table(spark, sf_dir, "documents", ["doc_id", "text"])
    n_docs = docs.select(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    tf = (
        docs.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("w"))
        .groupBy("doc_id", "w")
        .agg(
            F.least(F.count(F.lit(1)), F.lit(TF_CAP))
            .cast("long")
            .alias("tf")
        )
    )
    df_counts = tf.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    weights = (
        tf.join(df_counts, "w")
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") <= F.expr(f"n_docs div {DF_FRACTION_DEN}"))
        .select(
            "doc_id",
            "w",
            F.expr(f"tf * ((n_docs * {IDF_SCALE}) div df)")
            .cast("decimal(19,0)")
            .alias("wt"),
        )
    )
    norms = weights.groupBy("doc_id").agg(
        F.sum(F.col("wt") * F.col("wt")).alias("norm2")
    )
    a, b = weights.alias("a"), weights.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(
            F.sum(F.col("a.wt") * F.col("b.wt")).alias("dot"),
            F.count(F.lit(1)).cast("long").alias("n_shared_terms"),
        )
    )
    scored = (
        dots.join(
            norms.select(
                F.col("doc_id").alias("doc_a"), F.col("norm2").alias("na")
            ),
            "doc_a",
        )
        .join(
            norms.select(
                F.col("doc_id").alias("doc_b"), F.col("norm2").alias("nb")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "n_shared_terms",
            (
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("na").cast("double"))
                    * F.sqrt(F.col("nb").cast("double"))
                )
            ).alias("cosine"),
        )
    )
    w = Window.orderBy(F.desc("cosine"), F.asc("doc_a"), F.asc("doc_b"))
    return (
        scored.orderBy(F.desc("cosine"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "doc_a", "doc_b", "n_shared_terms", "cosine")
        .orderBy("rank")
    )
