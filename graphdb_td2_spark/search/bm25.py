"""BM25 full-text ranking over ``documents`` [extension] — the retrieval
capability the reference's roadmap gestures at ("what products go with X")
re-expressed for a document corpus: "more-like-this" search where each query
is a document's own distinctive terms, scored with BM25 against the whole
corpus, plus a hybrid variant that reranks the lexical candidates with the
embedding cosine (``embeddings.vec_id == documents.doc_id``).

No reference counterpart (the reference has no text search; its nearest
analogue is the Cypher co-occurrence ranking, ``app/main.py:44-57``) — this
is part of the LLM-data-pipeline extension tier.

Cross-engine determinism (the repo-wide oracle discipline):

- the **idf is the exact ratio** ``(N - df + 0.5) / (df + 0.5)`` instead of
  its log — same per-term ranking direction, but computed purely with IEEE
  ``+ - * /`` from exact integer counts, so Spark and DuckDB produce
  bit-identical doubles (``ln`` is not exactly specified across libms; the
  same trick as :func:`~graphdb_td2_spark.functions.text.distinctive_terms`).
- each per-term contribution is floored into **bigint fixed-point**
  (``floor(x * 1e6)``) *before* the per-document sum, making the sum an
  exact, order-independent integer aggregation — double summation order
  (which Spark does not fix across partitions) can never drift the hash.
- the tf saturation term uses k1=1.2, b=0.75 with the expression shape
  written identically (same parenthesisation) on both engines, so every
  intermediate double is bit-identical.

Scale notes (100 TB posture):

- the query-term table is tiny (n_query_docs × n_terms rows) and broadcast;
  the corpus token explode is filtered by that broadcast join *before* the
  tf groupBy, so the only corpus-sized shuffle is the per-(query, term, doc)
  partial-agg'd count over matching postings — proportional to the postings
  of the queried terms, not the corpus.
- document length (dl) and the corpus stats (N, total tokens) are one
  narrow projection + one global partial agg; no second tokenize pass.
- top-k per query is a window over the candidate set followed by
  TakeOrderedAndProject on a ≤ n_queries × k output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from ..functions.text import tokens_col
from ..functions.vectors import cosine_similarity_q, quantize_embedding
from ..io import read_table

K1 = 1.2
B = 0.75
FP_SCALE = 1_000_000.0  # 6-digit fixed point, same as vectors._Q

N_QUERY_DOCS = 5
N_QUERY_TERMS = 4
TOPK = 10
HYBRID_CANDIDATES = 20
MIN_TERM_LEN = 3


def bm25_score_components(
    tf: Column, df: Column, dl: Column, n_docs: float, avgdl: float
) -> Column:
    """Fixed-point BM25 contribution of one (term, doc) posting.

    ``((N - df + 0.5) / (df + 0.5)) * ((tf*(k1+1)) / (tf + k1*(1-b + b*dl/avgdl)))``
    floored to bigint ×1e6. Expression shape mirrored verbatim in the DuckDB
    oracle (``__spark_entry__.py``) — keep both in sync.
    """
    tfd = tf.cast("double")
    dfd = df.cast("double")
    dld = dl.cast("double")
    idf = (F.lit(n_docs) - dfd + F.lit(0.5)) / (dfd + F.lit(0.5))
    tfpart = (tfd * F.lit(K1 + 1.0)) / (
        tfd + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * (dld / F.lit(avgdl)))
    )
    return F.floor(idf * tfpart * F.lit(FP_SCALE)).cast("long")


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents", ["doc_id", "text"])
    return docs.select("doc_id", tokens_col(F.col("text")).alias("toks"))


def _query_terms(toks: DataFrame) -> DataFrame:
    """Per query doc (doc_id < N_QUERY_DOCS): the N_QUERY_TERMS
    alphabetically-first distinct tokens of length ≥ MIN_TERM_LEN.
    Alphabetic (not first-occurrence) selection because DuckDB's
    ``list_distinct`` does not guarantee order preservation."""
    w = Window.partitionBy("query_doc_id").orderBy(F.asc("token"))
    return (
        toks.filter(F.col("doc_id") < N_QUERY_DOCS)
        .select(
            F.col("doc_id").alias("query_doc_id"),
            F.explode(F.array_distinct("toks")).alias("token"),
        )
        .filter(F.length("token") >= MIN_TERM_LEN)
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= N_QUERY_TERMS)
        .select("query_doc_id", "token")
    )


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_doc_id, doc_id, score_fp, n_terms) for every candidate doc
    sharing ≥1 query term, self excluded."""
    toks = _doc_tokens(spark, sf_dir)
    dl = toks.select("doc_id", F.size("toks").cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_tokens")
    ).collect()[0]
    n_docs, total_tokens = int(stats["n_docs"]), int(stats["total_tokens"])
    # float()/float(): match DuckDB's CAST(… AS DOUBLE)/CAST(… AS DOUBLE)
    # bit-for-bit even if the exact-int quotient would round differently.
    avgdl = float(total_tokens) / float(n_docs)

    qterms = _query_terms(toks)
    postings = toks.select("doc_id", F.explode("toks").alias("token"))
    # Broadcast the tiny query-term table so the corpus-sized posting
    # stream is filtered before its only shuffle (the tf groupBy).
    matched = postings.join(F.broadcast(qterms), "token")
    tf = matched.groupBy("query_doc_id", "token", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_tbl = (
        tf.select("token", "doc_id")
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    scored = (
        tf.join(F.broadcast(df_tbl), "token")
        .join(dl, "doc_id")
        .select(
            "query_doc_id",
            "doc_id",
            bm25_score_components(
                F.col("tf"), F.col("df"), F.col("dl"), float(n_docs), avgdl
            ).alias("fp"),
        )
    )
    return (
        scored.filter(F.col("doc_id") != F.col("query_doc_id"))
        .groupBy("query_doc_id", "doc_id")
        .agg(
            F.sum("fp").cast("long").alias("score_fp"),
            F.count(F.lit(1)).cast("long").alias("n_terms"),
        )
    )


def _ranked(scored: DataFrame, order: list[Column], k: int) -> DataFrame:
    w = Window.partitionBy("query_doc_id").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def bm25_doc_topk(spark: SparkSession, sf_dir: str, k: int = TOPK) -> DataFrame:
    """More-like-this BM25 top-k: for each query doc, the k best-scoring
    other documents. Deterministic tiebreak (score_fp desc, doc_id asc)."""
    ranked = _ranked(
        _bm25_scored(spark, sf_dir), [F.desc("score_fp"), F.asc("doc_id")], k
    )
    return ranked.select(
        "query_doc_id", "rank", "doc_id", "score_fp", "n_terms"
    ).orderBy("query_doc_id", "rank")


def bm25_hybrid_topk(
    spark: SparkSession, sf_dir: str, k: int = TOPK, n_candidates: int = HYBRID_CANDIDATES
) -> DataFrame:
    """Hybrid retrieval: BM25 selects n_candidates lexical candidates per
    query doc, then the embedding cosine (quantized, exact) reranks them —
    combined score = bm25_fp + floor(cosine × 1e6), both exact bigints.

    Scale: the rerank joins embeddings only for the candidate set
    (n_queries × n_candidates rows) plus the n_queries query vectors —
    never a corpus-wide vector scan; the candidate side is broadcast."""
    candidates = _ranked(
        _bm25_scored(spark, sf_dir), [F.desc("score_fp"), F.asc("doc_id")], n_candidates
    ).select("query_doc_id", "doc_id", "score_fp")

    emb = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"]).select(
        "vec_id", quantize_embedding(F.col("embedding")).alias("qe")
    )
    q_emb = emb.select(F.col("vec_id").alias("query_doc_id"), F.col("qe").alias("query_qe"))
    with_vecs = (
        F.broadcast(candidates)
        .join(emb, candidates["doc_id"] == emb["vec_id"])
        .drop("vec_id")
        .join(q_emb, "query_doc_id")
    )
    scored = with_vecs.select(
        "query_doc_id",
        "doc_id",
        "score_fp",
        F.floor(
            cosine_similarity_q(F.col("query_qe"), F.col("qe")) * F.lit(FP_SCALE)
        ).cast("long").alias("cosine_fp"),
    ).withColumn("combined_fp", (F.col("score_fp") + F.col("cosine_fp")).cast("long"))
    ranked = _ranked(scored, [F.desc("combined_fp"), F.asc("doc_id")], k)
    return ranked.select(
        "query_doc_id", "rank", "doc_id", "score_fp", "cosine_fp", "combined_fp"
    ).orderBy("query_doc_id", "rank")
