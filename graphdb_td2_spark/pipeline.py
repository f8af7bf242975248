"""End-to-end corpus-cleaning pipeline — the funnel every LLM training-data
run executes, composed from this engine's own tiers:

    raw docs
      → exact dedup        (normalized-md5 digest, keep lowest id)
      → near-dup prune     (MinHash-LSH candidate pairs, drop the higher id)
      → quality filter     (the integer-exact C4/Gopher rules)
      → decontamination    (drop benchmark docs + docs sharing ≥5 shingles
                            with the eval set)
      → clean corpus

Every stage reuses the already-oracle-checked operator (same digests, same
capped LSH buckets, same QF_* constants, same shingle table), so the funnel
adds NO new primitive — only composition — and the DuckDB oracle chains the
same fragments. The near-dup prune list is computed corpus-wide once (the
materialized-pair-artifact pattern of a production pipeline) and applied to
the exact-dedup survivors.

Scale notes: the funnel is flag-propagation — one corpus scan computes all
per-doc predicates (digest window, quality rules), the two drop lists
(near-dup b-sides, contaminated ids) are corpus-sublinear and join in as
left-semi markers, and the only output-sized aggregation is the per-source
funnel count. Nothing here materializes the corpus more than the underlying
operators already do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .io import read_table
from .dedup.exact import content_digest
from .dedup.minhash import minhash_lsh_pairs
from .dedup.shingles import cached_doc_shingles
from .functions.text import (
    CONTAM_EVAL_DOCS,
    CONTAM_MIN_SHARED,
    LANG_LEXICONS,
    QF_MAX_MEAN_LEN_NUM,
    QF_MAX_TOKENS,
    QF_MIN_MEAN_LEN_NUM,
    QF_MIN_STOP_HITS,
    QF_MIN_TOKENS,
    QF_TTR_DEN,
    QF_TTR_NUM,
    _lex_hits,
    tokens_col,
)


def _contaminated_ids(
    spark: SparkSession,
    sf_dir: str,
    n_eval: int = CONTAM_EVAL_DOCS,
    min_shared: int = CONTAM_MIN_SHARED,
) -> DataFrame:
    """(doc_id) of training docs sharing ≥ min_shared distinct shingles
    with any eval doc — the drop side of contamination_overlap."""
    sh = cached_doc_shingles(spark, sf_dir).select("doc_id", "shingle")
    ev = sh.filter(F.col("doc_id") < n_eval).select(
        F.col("doc_id").alias("eval_doc_id"), "shingle"
    )
    return (
        sh.filter(F.col("doc_id") >= n_eval)
        .join(F.broadcast(ev), "shingle")
        .groupBy("doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .select("doc_id")
        .distinct()
    )


def clean_corpus_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document funnel flags: (doc_id, source, s_exact, s_neardup,
    s_quality, s_clean) — each stage ANDs into the next, so the flags are
    monotone and the funnel counts partition exactly."""
    docs = read_table(spark, sf_dir, "documents", ["doc_id", "source", "text"])

    dg = Window.partitionBy(content_digest(F.col("text")))
    s_exact = F.col("doc_id") == F.min("doc_id").over(dg)

    tokens = tokens_col(F.col("text"))
    n_tok = F.size(tokens).cast("long")
    total_len = F.aggregate(
        tokens, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
    )
    n_distinct = F.size(F.array_distinct(tokens)).cast("long")
    all_words = tuple(w for lex in LANG_LEXICONS.values() for w in lex)
    stop_hits = _lex_hits(tokens, all_words).cast("long")
    q_ok = (
        (n_tok >= QF_MIN_TOKENS)
        & (n_tok <= QF_MAX_TOKENS)
        & (total_len >= QF_MIN_MEAN_LEN_NUM * n_tok)
        & (total_len <= QF_MAX_MEAN_LEN_NUM * n_tok)
        & (QF_TTR_DEN * n_distinct >= QF_TTR_NUM * n_tok)
        & (stop_hits >= QF_MIN_STOP_HITS)
    )

    flagged = docs.select(
        "doc_id", "source", s_exact.alias("s_exact"), q_ok.alias("q_ok")
    )

    neardup_drops = (
        minhash_lsh_pairs(spark, sf_dir)
        .select(F.col("doc_id_b").alias("doc_id"))
        .distinct()
        .withColumn("nd", F.lit(True))
    )
    contam = _contaminated_ids(spark, sf_dir).withColumn("ct", F.lit(True))

    return (
        flagged.join(F.broadcast(neardup_drops), "doc_id", "left")
        .join(F.broadcast(contam), "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.col("s_exact"),
            (F.col("s_exact") & F.col("nd").isNull()).alias("s_neardup"),
            (F.col("s_exact") & F.col("nd").isNull() & F.col("q_ok")).alias(
                "s_quality"
            ),
            (
                F.col("s_exact")
                & F.col("nd").isNull()
                & F.col("q_ok")
                & F.col("ct").isNull()
                & (F.col("doc_id") >= CONTAM_EVAL_DOCS)
            ).alias("s_clean"),
        )
    )


def clean_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: the per-source cleaning funnel — documents surviving
    each stage, plus the final clean share (one IEEE division)."""
    flags = clean_corpus_flags(spark, sf_dir)
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("s_exact").cast("long")).cast("long").alias("n_exact"),
            F.sum(F.col("s_neardup").cast("long")).cast("long").alias("n_neardup"),
            F.sum(F.col("s_quality").cast("long")).cast("long").alias("n_quality"),
            F.sum(F.col("s_clean").cast("long")).cast("long").alias("n_clean"),
        )
        .withColumn(
            "clean_share",
            F.col("n_clean").cast("double") / F.col("n_docs").cast("double"),
        )
        .orderBy("source")
    )


def clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleaned corpus itself (doc_id, source, text of survivors) — the
    write-side consumer of the flags (what a production run persists)."""
    docs = read_table(spark, sf_dir, "documents", ["doc_id", "source", "text"])
    keep = clean_corpus_flags(spark, sf_dir).filter(F.col("s_clean")).select("doc_id")
    return docs.join(keep, "doc_id", "left_semi")
