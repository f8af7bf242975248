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

from ..io import read_table
from .minhash import _shingles

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
    # Repartition parallelizes the narrow tokenize/shingle work when the
    # source is a small single-row-group file; at corpus scale the input is
    # already split and this is a cheap rebalance of (doc_id, text).
    docs = read_table(spark, sf_dir, "documents", ["doc_id", "text"]).repartition(
        spark.sparkContext.defaultParallelism
    )
    doc_shingles = docs.select(
        "doc_id", F.explode(_shingles(F.col("text"), k)).alias("shingle")
    )
    sizes = doc_shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    rare = (
        doc_shingles.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("shingle")
    )
    filtered = doc_shingles.join(rare, "shingle")
    a, b = filtered.alias("a"), filtered.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_id_b"), F.col("n_shingles").alias("n_b"))
    return (
        common.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id_a", "doc_id_b", "n_common", "jaccard")
        .orderBy("doc_id_a", "doc_id_b")
    )
