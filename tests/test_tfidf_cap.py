"""Adversarial TF-IDF df-cap tests (round-10 VERDICT task #1): a term
that sits just under the RELATIVE vocabulary prune (df ≤ N/10) must not
be allowed to drive the term-keyed self-join quadratic — that is the
100 TB failure mode ("data", "said" on a web corpus). The ABSOLUTE cap
``TFIDF_DF_CAP`` (here exercised with a small test cap, the
``tests/test_lsh_cap.py`` pattern) bounds every surviving term's join
fan-out at cap²/2 pairs regardless of corpus size."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_td2_spark.dedup.tfidf import (
    DF_FRACTION_DEN,
    TFIDF_DF_CAP,
    tfidf_pairs,
)


def _adversarial_docs(spark, n_heavy=16, n_filler=200):
    """``n_heavy`` docs share the boilerplate term "everywhere" (df just
    under N/10 — the relative prune keeps it); each doc also carries
    unique terms, and two planted near-dups share rare terms."""
    rows = []
    for i in range(n_heavy):
        rows.append((i, f"everywhere unique{i}a unique{i}b unique{i}c"))
    for i in range(n_filler):
        rows.append((1000 + i, f"filler{i}x filler{i}y filler{i}z"))
    # planted near-dup pair on RARE terms (df=2, far below any cap)
    rows.append((9001, "zebra quagga okapi pangolin aardvark"))
    rows.append((9002, "zebra quagga okapi pangolin anteater"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_absolute_cap_bounds_near_cap_term_fanout(spark):
    docs = _adversarial_docs(spark)
    n_docs = docs.count()
    # the boilerplate term survives the RELATIVE prune...
    assert 16 <= n_docs // DF_FRACTION_DEN
    # ...so without an absolute cap it emits C(16,2) = 120 pairs
    uncapped = tfidf_pairs(docs, k=500, df_cap=10**9)
    heavy_pairs_uncapped = uncapped.filter(
        (F.col("doc_a") < 1000) & (F.col("doc_b") < 1000)
    ).count()
    assert heavy_pairs_uncapped == 120

    # with an absolute cap below its df the term leaves the vector space
    capped = tfidf_pairs(docs, k=500, df_cap=8)
    heavy_pairs_capped = capped.filter(
        (F.col("doc_a") < 1000) & (F.col("doc_b") < 1000)
    ).count()
    assert heavy_pairs_capped == 0

    # the planted rare-term near-dup pair survives the cap, on top
    top = capped.orderBy("rank").first()
    assert (top["doc_a"], top["doc_b"]) == (9001, 9002)
    # 4 shared df=2 terms at weight w, 1 unique df=1 term at 2w:
    # cosine = 4w² / (√(8w²)·√(8w²)) = 0.5 exactly
    assert abs(top["cosine"] - 0.5) < 1e-12


def test_default_cap_is_noop_at_contract_scales(spark, sf_dir):
    """At sf0.001/sf0.01/sf0.1, n_docs/10 ≤ 500 < TFIDF_DF_CAP = 2000,
    so ``least(n_docs div 10, cap)`` equals the pre-round-10 relative
    prune and the driver oracle hashes are unchanged (the contract
    invariance the VERDICT required)."""
    from graphdb_td2_spark.io import read_table

    docs = read_table(spark, sf_dir, "documents", ["doc_id", "text"])
    assert docs.count() // DF_FRACTION_DEN < TFIDF_DF_CAP
    relative_only = tfidf_pairs(docs, k=10, df_cap=10**9).collect()
    shipped = tfidf_pairs(docs, k=10).collect()
    assert [tuple(r) for r in relative_only] == [tuple(r) for r in shipped]
