"""Cross-document repeated-substring profile — the signal behind exact
substring deduplication (Lee et al., "Deduplicating Training Data Makes
Language Models Better", ACL 2022): text spans that recur across
documents (boilerplate, licenses, templated pages) inflate memorization
and should be cut even when whole documents are unique.

Granularity here is the engine's shared k-token shingle: a shingle whose
document frequency is ≥ 2 is a *repeated span witness*, and a document's
``dup fraction`` is the share of its distinct shingles that are such
witnesses. Documents past ``DUP_FRAC_NUM/DUP_FRAC_DEN`` are the
boilerplate-heavy candidates a span-removal pass would rewrite.

Reuses ``cached_doc_shingles`` — the same materialized artifact MinHash,
Jaccard, and the contamination screen join against, so a corpus snapshot
tokenizes exactly once across the whole dedup tier.

Scale notes: one groupBy(shingle) for document frequency (map-side
partial; the DF table is vocabulary-sized, not corpus-sized), one
equi-join back on shingle (AQE handles hot boilerplate shingles), one
per-doc and one per-source aggregate. All comparisons are integer
cross-multiplications; the single division is the final per-source
IEEE double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import read_table
from .shingles import cached_doc_shingles

MIN_DF = 2  # a shingle in >= MIN_DF docs witnesses a repeated span
DUP_FRAC_NUM = 1  # flag docs with dup_frac >= 1/2
DUP_FRAC_DEN = 2


def repeated_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: per-source repeated-substring profile —
    ``(source, n_docs, n_flagged, sum_shingles, sum_dup, dup_share)``
    where ``n_flagged`` counts documents whose duplicated-shingle
    fraction reaches 1/2 and ``dup_share`` is the source-level duplicated
    fraction (one division)."""
    sh = cached_doc_shingles(spark, sf_dir)
    df = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= MIN_DF)
        .select("shingle")
    )
    per_doc = (
        sh.join(df, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dup"))
    )
    docs = read_table(spark, sf_dir, "documents", ["doc_id", "source"])
    sizes = sh.select("doc_id", "n_shingles").distinct()
    per_doc_full = (
        docs.join(sizes, "doc_id", "left")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce(F.col("n_shingles"), F.lit(0)).cast("long").alias("n_sh"),
            F.coalesce(F.col("n_dup"), F.lit(0)).cast("long").alias("n_dup"),
        )
    )
    flagged = (F.col("n_dup") * DUP_FRAC_DEN >= F.col("n_sh") * DUP_FRAC_NUM) & (
        F.col("n_sh") > 0
    )
    return (
        per_doc_full.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(flagged.cast("long")).cast("long").alias("n_flagged"),
            F.sum("n_sh").cast("long").alias("sum_shingles"),
            F.sum("n_dup").cast("long").alias("sum_dup"),
        )
        .withColumn(
            "dup_share",
            F.col("sum_dup").cast("double") / F.col("sum_shingles").cast("double"),
        )
        .orderBy("source")
    )
