"""BM25 more-like-this + hybrid rerank (search/bm25.py).

Semantics are pinned on a tiny hand-built corpus (scores verified against a
pure-Python BM25 with the same ratio-idf + fixed-point contract), and the
corpus-level invariants run on the sf0.001 smoke data. The exact DuckDB
cross-engine check lives in the oracle harness (tools/oracle_check.py).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from graphdb_td2_spark.search import bm25_doc_topk, bm25_hybrid_topk
from graphdb_td2_spark.search.bm25 import (
    B,
    FP_SCALE,
    K1,
    MIN_TERM_LEN,
    N_QUERY_DOCS,
    N_QUERY_TERMS,
    _bm25_scored,
    _query_terms,
)


def _py_bm25_fp(tf: int, df: int, dl: int, n_docs: float, avgdl: float) -> int:
    idf = (n_docs - float(df) + 0.5) / (float(df) + 0.5)
    tfpart = (float(tf) * (K1 + 1.0)) / (
        float(tf) + K1 * ((1.0 - B) + B * (float(dl) / avgdl))
    )
    return math.floor(idf * tfpart * FP_SCALE)


@pytest.fixture(scope="module")
def tiny_docs(spark, tmp_path_factory):
    """4 docs; doc 0 is the only query doc (doc_id < 5 selects all four, but
    terms come from each). Tokens are ≥3 chars so MIN_TERM_LEN keeps them."""
    root = tmp_path_factory.mktemp("bm25")
    rows = [
        (0, "apple banana apple cherry"),
        (1, "apple apple apple durian"),
        (2, "banana cherry cherry fig"),
        (3, "durian fig fig grape grape"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df = df.withColumn("lang", F.lit("en")).withColumn("source", F.lit("t")) \
          .withColumn("n_chars", F.length("text").cast("long"))
    df.write.mode("overwrite").parquet(str(root / "documents.parquet"))
    return str(root)


def test_query_terms_alphabetic_capped(spark, tiny_docs):
    from graphdb_td2_spark.search.bm25 import _doc_tokens

    toks = _doc_tokens(spark, tiny_docs)
    qt = _query_terms(toks).collect()
    by_doc = {}
    for r in qt:
        by_doc.setdefault(r["query_doc_id"], []).append(r["token"])
    # distinct, alphabetically-first, ≤ N_QUERY_TERMS, all ≥ MIN_TERM_LEN
    assert sorted(by_doc[0]) == ["apple", "banana", "cherry"]
    assert all(len(t) >= MIN_TERM_LEN for ts in by_doc.values() for t in ts)
    assert all(len(ts) <= N_QUERY_TERMS for ts in by_doc.values())


def test_bm25_scores_match_pure_python(spark, tiny_docs):
    scored = {
        (r["query_doc_id"], r["doc_id"]): (r["score_fp"], r["n_terms"])
        for r in _bm25_scored(spark, tiny_docs).collect()
    }
    # corpus stats: dl = [4, 4, 4, 5], N = 4
    n_docs, avgdl = 4.0, float(4 + 4 + 4 + 5) / 4.0
    # query doc 0 terms {apple, banana, cherry} vs doc 1 {apple×3}:
    # apple df=2 (docs 0,1)
    exp_01 = _py_bm25_fp(tf=3, df=2, dl=4, n_docs=n_docs, avgdl=avgdl)
    assert scored[(0, 1)] == (exp_01, 1)
    # vs doc 2 {banana×1, cherry×2}: banana df=2, cherry df=2
    exp_02 = _py_bm25_fp(1, 2, 4, n_docs, avgdl) + _py_bm25_fp(2, 2, 4, n_docs, avgdl)
    assert scored[(0, 2)] == (exp_02, 2)
    # self excluded
    assert (0, 0) not in scored


def test_topk_rank_contract(spark, tiny_docs):
    out = bm25_doc_topk(spark, tiny_docs, k=2).collect()
    for r in out:
        assert r["rank"] in (1, 2)
        assert r["doc_id"] != r["query_doc_id"]
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_doc_id"], []).append((r["rank"], r["score_fp"], r["doc_id"]))
    for ranked in per_q.values():
        ranked.sort()
        # rank order == (score desc, doc_id asc)
        scores = [(-s, d) for _, s, d in ranked]
        assert scores == sorted(scores)


def test_smoke_corpus_shapes(spark, sf_dir):
    top = bm25_doc_topk(spark, sf_dir)
    rows = top.collect()
    assert {r["query_doc_id"] for r in rows} <= set(range(N_QUERY_DOCS))
    assert all(r["score_fp"] > 0 for r in rows)

    hybrid = bm25_hybrid_topk(spark, sf_dir)
    hrows = hybrid.collect()
    assert all(r["combined_fp"] == r["score_fp"] + r["cosine_fp"] for r in hrows)
    # cosine_fp is a floored ×1e6 cosine: bounded by [-1e6, 1e6]
    assert all(-1_000_000 <= r["cosine_fp"] <= 1_000_000 for r in hrows)


def test_hybrid_rerank_is_permutation_of_candidates(spark, sf_dir):
    from graphdb_td2_spark.search.bm25 import _ranked

    cand = _ranked(
        _bm25_scored(spark, sf_dir), [F.desc("score_fp"), F.asc("doc_id")], 20
    ).select("query_doc_id", "doc_id").collect()
    cand_set = {(r["query_doc_id"], r["doc_id"]) for r in cand}
    hrows = bm25_hybrid_topk(spark, sf_dir).collect()
    assert {(r["query_doc_id"], r["doc_id"]) for r in hrows} <= cand_set
