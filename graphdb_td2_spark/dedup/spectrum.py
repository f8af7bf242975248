"""Corpus shingle-vocabulary statistics [extension] — the measurements the
dedup tier's pruning decisions rest on.

Two registry entries over the shared shingle cache (``dedup/shingles.py``;
one tokenize pass per session, like every other dedup operator):

- ``shingle_frequency_spectrum`` — Good-Turing "frequency of frequencies"
  of shingle document-frequency, in power-of-two buckets. This is the
  distribution behind every df-based pruning constant in the tier: the
  rare-shingle filter in ``ngram_jaccard_pairs`` (df ≤ 100), the
  single-source prune in ``source_overlap_matrix``, the BUCKET_CAP in
  MinHash-LSH — each draws a line through this histogram. At 100 TB the
  spectrum is how you *pick* those constants instead of guessing.
- ``shingle_novelty_curve`` — Heaps'-law vocabulary growth: cumulative
  distinct shingles vs cumulative shingle postings across the corpus in
  document order (deciles). The marginal-novelty rate is the capacity
  plan for incremental dedup state (``streaming/dedup_stream.py``): a
  flattening curve means LSH state growth is sublinear in corpus growth.

Exactness: counts, integer log2 via binary-string length (the same
engine-proof idiom as ``graph/centrality.py:degree_distribution``), and
integer ceil-division decile assignment — no floats anywhere, so the
DuckDB oracles hash-match bit-for-bit.

Scale notes: the spectrum is one partial-aggregated groupBy over the
shingle table (shuffle keyed on shingle — the same key the dedup joins
use) followed by a log-bounded (≤64-row) bucket rollup. The novelty
curve's only wide ops are the per-shingle min-rank aggregate and the
document ranking, which uses the two-phase ``bucketed_row_number``
(``operators/prefix.py``) — no single-partition window over the corpus
axis; the decile rollup is 10 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators.prefix import bucketed_row_number
from .shingles import cached_doc_shingles


def _log2_bucket(c: F.Column) -> F.Column:
    """floor(log2(c)) for positive integers, exact (no float log)."""
    return (F.length(F.conv(c.cast("string"), 10, 2)) - 1).cast("long")


def shingle_frequency_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(df_bucket, n_shingles, n_postings, min_df,
    max_df)`` — how many distinct shingles fall in each power-of-two
    document-frequency bucket, with the posting mass they carry."""
    sh = cached_doc_shingles(spark, sf_dir)
    df = sh.groupBy("shingle").agg(F.count(F.lit(1)).cast("long").alias("df"))
    return (
        df.groupBy(_log2_bucket(F.col("df")).alias("df_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum("df").cast("long").alias("n_postings"),
            F.min("df").alias("min_df"),
            F.max("df").alias("max_df"),
        )
        .orderBy("df_bucket")
    )


def shingle_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(decile, n_docs, n_postings, n_new_shingles,
    cum_postings, cum_vocab)`` — vocabulary growth in corpus document
    order (doc_id), one row per decile of documents.

    A shingle is "new" in the decile of the FIRST document containing
    it (min document rank). Decile of rank r over n docs is
    ``ceil(10·r / n)`` in pure integer arithmetic.
    """
    sh = cached_doc_shingles(spark, sf_dir)
    docs = sh.select("doc_id").distinct()
    n_docs = docs.count()
    if n_docs == 0:  # empty corpus → empty curve (no 0-denominator decile)
        return spark.createDataFrame(
            [],
            "decile long, n_docs long, n_postings long, n_new_shingles long,"
            " cum_postings long, cum_vocab long",
        )
    # two-phase rank: bucket is monotone in doc_id, so no corpus-sized
    # single-partition window (operators/prefix.py contract)
    ranked = bucketed_row_number(
        docs, F.expr("doc_id div 64"), [F.col("doc_id")], out="rank"
    )
    # ceil(10r/n) in BIGINT arithmetic (div, not a double quotient — the
    # same determinism rule as operators/percentiles.py)
    ranked = ranked.withColumn(
        "decile", F.expr(f"(rank * 10 + {n_docs - 1}) div {n_docs}")
    )
    tagged = sh.join(ranked, "doc_id")
    per_doc = tagged.groupBy("decile").agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_postings"),
    )
    first_seen = (
        tagged.groupBy("shingle")
        .agg(F.min("decile").alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).cast("long").alias("n_new_shingles"))
    )
    out = per_doc.join(first_seen, "decile", "left").select(
        "decile",
        "n_docs",
        "n_postings",
        F.coalesce("n_new_shingles", F.lit(0)).cast("long").alias("n_new_shingles"),
    )
    # the cumulative pass runs over the ≤10-row decile axis — bounded,
    # same dispensation as the calendar/day-axis windows
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return out.select(
        "decile",
        "n_docs",
        "n_postings",
        "n_new_shingles",
        F.sum("n_postings").over(w).cast("long").alias("cum_postings"),
        F.sum("n_new_shingles").over(w).cast("long").alias("cum_vocab"),
    ).orderBy("decile")
