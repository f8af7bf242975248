"""Embedding-cosine near-duplicate pairs with label blocking.

All-pairs cosine is O(n²·d); the scalable shape blocks candidates into
coarse partitions first (here the corpus ``label`` column — the same role a
k-means/IVF cell or LSH bucket plays at 100 TB) and compares only within a
block. Cosine uses the quantized-exact formulation
(:mod:`graphdb_td2_spark.functions.vectors`) so the DuckDB oracle matches
bit-for-bit.

Scale notes: the within-block self-join shuffles on the block key, and
the quadratic term is bounded by the LARGEST BLOCK — which, with a
fixed label domain, grows linearly with the corpus (measured 12.6× wall
at 10× rows, SCALE_r10_full.json): this operator is the EXACT
within-block baseline, correct at any scale but priced O(Σ block²).
The 100 TB members of the family are the sub-blocked approximate paths —
:mod:`graphdb_td2_spark.similarity.ann` (sign-LSH buckets, IVF cells)
and :mod:`graphdb_td2_spark.dedup.semantic` (k-means-cell blocking) —
which keep per-bucket fan-out constant; a pipeline uses THIS operator on
a sampled or pre-blocked slice when it needs the exact answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import read_table
from ..functions.vectors import cosine_similarity_q, quantize_embedding

DEFAULT_THRESHOLD = 0.35


def embedding_neardup_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = DEFAULT_THRESHOLD,
) -> DataFrame:
    """Vector pairs within the same label block with quantized cosine ≥
    ``threshold``."""
    emb = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    q = emb.select("vec_id", "label", quantize_embedding(F.col("embedding")).alias("qe"))
    a, b = q.alias("a"), q.alias("b")
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_id_a"),
            F.col("b.vec_id").alias("vec_id_b"),
            F.col("a.label").alias("label"),
            cosine_similarity_q(F.col("a.qe"), F.col("b.qe")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
