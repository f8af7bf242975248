"""Materialized search index [extension]: the pay-once, query-many form
of the BM25 tier. ``build_search_index`` lands the inverted index as lake
tables — postings and term document-frequencies both BUCKETED BY token,
document lengths, and a one-row corpus-stats table — and
``bm25_topk_from_index`` answers the same more-like-this queries from
those tables alone, never re-tokenizing the corpus.

Scale notes (100 TB posture):

- the expensive corpus-wide work (tokenize, per-(token, doc) tf groupBy,
  per-token df) happens ONCE at build time; each query afterwards touches
  only the queried terms' postings.
- postings and df are co-bucketed on token, so the query-path
  postings ⋈ df join is **exchange-free** (plan-asserted in
  tests/test_search_index.py) — the same bucketing contract as the lake
  sinks' co-bucketed fact joins (sources/sinks.py).
- results are bit-identical to the direct path (``bm25_doc_topk``):
  same score components, same fixed-point contract — asserted by test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.sinks import write_sorted_buckets
from .bm25 import (
    MIN_TERM_LEN,
    N_QUERY_DOCS,
    N_QUERY_TERMS,
    TOPK,
    _doc_tokens,
    _ranked,
    bm25_score_components,
)

N_INDEX_BUCKETS = 16


def index_tables(prefix: str) -> dict[str, str]:
    return {
        "postings": f"{prefix}_postings",
        "df": f"{prefix}_df",
        "doclen": f"{prefix}_doclen",
        "stats": f"{prefix}_stats",
    }


def build_search_index(
    spark: SparkSession,
    sf_dir: str,
    prefix: str = "search_idx",
    n_buckets: int = N_INDEX_BUCKETS,
) -> dict[str, str]:
    """Tokenize once, land the index; returns the table names."""
    names = index_tables(prefix)
    toks = _doc_tokens(spark, sf_dir)
    postings = (
        toks.select("doc_id", F.explode("toks").alias("token"))
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    write_sorted_buckets(postings, names["postings"], ["token"], n_buckets, ["token"])
    # df from the landed postings table (one exchange-free pass — postings
    # are already bucketed by token), co-bucketed for the query-path join.
    df_tbl = (
        spark.table(names["postings"])
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    write_sorted_buckets(df_tbl, names["df"], ["token"], n_buckets, ["token"])
    dl = toks.select("doc_id", F.size("toks").cast("long").alias("dl"))
    dl.write.mode("overwrite").format("parquet").saveAsTable(names["doclen"])
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tokens"),
    )
    stats.write.mode("overwrite").format("parquet").saveAsTable(names["stats"])
    return names


def drop_search_index(spark: SparkSession, prefix: str = "search_idx") -> None:
    for table in index_tables(prefix).values():
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def _query_terms_from_postings(postings: DataFrame) -> DataFrame:
    """Same contract as bm25._query_terms, derived from the index alone
    (postings rows are already distinct per (doc, token))."""
    w = Window.partitionBy("query_doc_id").orderBy(F.asc("token"))
    return (
        postings.filter(F.col("doc_id") < N_QUERY_DOCS)
        .select(F.col("doc_id").alias("query_doc_id"), "token")
        .filter(F.length("token") >= MIN_TERM_LEN)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= N_QUERY_TERMS)
        .select("query_doc_id", "token")
    )


def bm25_topk_from_index(
    spark: SparkSession, prefix: str = "search_idx", k: int = TOPK
) -> DataFrame:
    """More-like-this BM25 top-k answered purely from the landed index —
    bit-identical to ``bm25_doc_topk`` on the same corpus."""
    names = index_tables(prefix)
    postings = spark.table(names["postings"])
    df_tbl = spark.table(names["df"])
    dl = spark.table(names["doclen"])
    stats = spark.table(names["stats"]).collect()[0]
    n_docs, total_tokens = int(stats["n_docs"]), int(stats["total_tokens"])
    avgdl = float(total_tokens) / float(n_docs)

    qterms = _query_terms_from_postings(postings)
    # co-bucketed postings ⋈ df: exchange-free; the tiny query-term table
    # broadcasts into that stream.
    matched = postings.join(df_tbl, "token").join(F.broadcast(qterms), "token")
    scored = matched.join(dl, "doc_id").select(
        "query_doc_id",
        "doc_id",
        bm25_score_components(
            F.col("tf"), F.col("df"), F.col("dl"), float(n_docs), avgdl
        ).alias("fp"),
    )
    agg = (
        scored.filter(F.col("doc_id") != F.col("query_doc_id"))
        .groupBy("query_doc_id", "doc_id")
        .agg(
            F.sum("fp").cast("long").alias("score_fp"),
            F.count(F.lit(1)).cast("long").alias("n_terms"),
        )
    )
    ranked = _ranked(agg, [F.desc("score_fp"), F.asc("doc_id")], k)
    return ranked.select(
        "query_doc_id", "rank", "doc_id", "score_fp", "n_terms"
    ).orderBy("query_doc_id", "rank")
