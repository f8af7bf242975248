"""Cross-source corpus overlap — the "is source B a near-copy of source
A" screen a training-data pipeline runs before mixing sources (double-
counted content silently re-weights the mixture and can leak eval data
between splits drawn from different sources).

Reference parity: no counterpart (the reference has no corpus
analytics); this extends the dedup tier (SURVEY.md §2 extension block)
with the source-level aggregate of the same shingle machinery —
``cached_doc_shingles`` is computed ONCE for the whole dedup family and
reused here.

Scale notes: the per-(shingle, source) projection collapses the corpus
to at most |shingles|·|sources| rows before any join; the pair
expansion is a shingle-keyed equi-self-join whose fan-out per shingle is
bounded by |sources|² (sources are a dimension, like brands — never
corpus-sized), and the output matrix is |sources|² rows. Jaccard is one
integer division per pair — engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import read_table
from .shingles import cached_doc_shingles


def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(source_a, source_b, n_a, n_b, n_common,
    jaccard)`` — distinct-shingle Jaccard overlap for every ordered
    source pair that shares at least one shingle. Ordered by
    (source_a, source_b)."""
    sh = cached_doc_shingles(spark, sf_dir).select("doc_id", "shingle")
    docs = read_table(spark, sf_dir, "documents", ["doc_id", "source"])
    per_ss = (
        sh.join(docs, "doc_id").select("source", "shingle").distinct()
    )
    sizes = per_ss.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles")
    )
    # shingles unique to ONE source cannot intersect anything — prune them
    # before the self-join (they still count in the per-source sizes);
    # on a real corpus this drops the bulk of the join input
    multi = (
        per_ss.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("ns"))
        .filter(F.col("ns") >= 2)
        .select("shingle")
    )
    shared = per_ss.join(multi, "shingle", "left_semi")
    a, b = shared.alias("a"), shared.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    na = sizes.select(
        F.col("source").alias("source_a"), F.col("n_shingles").alias("n_a")
    )
    nb = sizes.select(
        F.col("source").alias("source_b"), F.col("n_shingles").alias("n_b")
    )
    return (
        common.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )
