"""IVF-PQ exact-rerank stage (round 10): the refined top-k must be (a)
drawn entirely from the ADC shortlist, (b) exactly the brute-force
cosine ranking RESTRICTED to that shortlist — rerank fixes quantization
error, nothing else — and (c) certified by a gain report whose recalls
are well-formed."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_td2_spark.functions.vectors import quantize_embedding
from graphdb_td2_spark.io import read_table
from graphdb_td2_spark.similarity.pq import (
    REFINE_R,
    _adc_rank,
    _ivfpq_scored,
    ann_topk_ivfpq_refined,
    pq_refine_gain_report,
)


def test_refined_topk_is_exact_rerank_of_shortlist(spark, sf_dir):
    refined = ann_topk_ivfpq_refined(spark, sf_dir).collect()
    scored, corpus = _ivfpq_scored(spark, sf_dir, 5, 8)
    shortlist = {
        (r["query_id"], r["vec_id"])
        for r in _adc_rank(scored, REFINE_R).collect()
    }
    # (a) containment
    assert all((r["query_id"], r["vec_id"]) in shortlist for r in refined)

    # (b) per query, the refined order equals exact cosine over the
    # shortlist (ties -> lowest vec_id), computed independently here
    emb = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"])
    q = emb.select("vec_id", quantize_embedding(F.col("embedding")).alias("qe"))
    full = {r["vec_id"]: r["qe"] for r in q.collect()}

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(y * y for y in b) ** 0.5
        return dot / (na * nb)

    by_query: dict[int, list] = {}
    for r in refined:
        by_query.setdefault(r["query_id"], []).append(r)
    for query_id, rows in by_query.items():
        cands = [v for (qq, v) in shortlist if qq == query_id]
        expected = sorted(
            cands, key=lambda v: (-cos(full[query_id], full[v]), v)
        )[: len(rows)]
        got = [r["vec_id"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert got == expected
    # NOTE: corpus is the SHARED session cache (_cached_corpus) — do not
    # unpersist it here; that would silently strip the persist out from
    # under every later PQ call in this session.


def test_gain_report_bounds(spark, sf_dir):
    row = pq_refine_gain_report(spark, sf_dir).collect()[0]
    assert row["n_queries"] > 0 and row["k"] > 0
    for col in ("recall_adc", "recall_refined"):
        assert 0.0 <= row[col] <= 1.0
    assert row["n_hits_adc"] <= row["n_queries"] * row["k"]
    assert row["n_hits_refined"] <= row["n_queries"] * row["k"]


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_ivfpq_entries_bounded_persist(spark, sf_dir):
    """ADVICE r10: the per-call corpus persist accumulated one pin per
    invocation (the r10 full-registry OOM mechanism). The r11 shape is a
    BOUNDED session cache (`_cached_corpus`): the first PQ call may add
    exactly one persisted frame per (session, sf_dir); repeated calls
    across every consumer add ZERO."""
    from graphdb_td2_spark.similarity.pq import ann_topk_ivfpq

    before = _n_persistent(spark)
    ann_topk_ivfpq(spark, sf_dir).collect()  # may warm the cache
    warm = _n_persistent(spark)
    assert warm <= before + 1
    ann_topk_ivfpq(spark, sf_dir).collect()
    ann_topk_ivfpq_refined(spark, sf_dir).collect()
    pq_refine_gain_report(spark, sf_dir).collect()
    # <= not ==: the ContextCleaner releases earlier tests' superseded
    # blocks asynchronously, so the session-wide pin count can SHRINK
    # between snapshots under the full suite (observed r12); the invariant
    # under test is only that repeated PQ calls add no NEW pins.
    assert _n_persistent(spark) <= warm
