"""Round-11 operator additions: the IVF nprobe tuning curve and the
per-source dedup token-savings report."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_td2_spark.dedup.exact import dedup_token_savings, exact_dedup_stats
from graphdb_td2_spark.similarity.ann import (
    N_CELLS,
    ann_nprobe_tradeoff_report,
)


def test_nprobe_curve_is_monotone_and_converges(spark, sf_dir):
    """Candidates and recall must be non-decreasing in nprobe (candidate
    sets nest by construction), and probing ALL cells must recover the
    brute-force result exactly (recall = 1)."""
    rows = ann_nprobe_tradeoff_report(
        spark, sf_dir, probes=(1, 2, 4, N_CELLS)
    ).collect()
    assert [r["nprobe"] for r in rows] == [1, 2, 4, N_CELLS]
    cands = [r["n_candidates"] for r in rows]
    recalls = [r["recall"] for r in rows]
    assert cands == sorted(cands)
    assert recalls == sorted(recalls)
    # nprobe = n_cells probes every cell -> candidate set == brute force
    assert recalls[-1] == 1.0


def test_nprobe_hits_bounded_by_truth(spark, sf_dir):
    rows = ann_nprobe_tradeoff_report(spark, sf_dir).collect()
    for r in rows:
        assert 0 <= r["n_hits"] <= r["n_candidates"]
        assert 0.0 <= r["recall"] <= 1.0


def test_token_savings_consistent_with_exact_dedup(spark, sf_dir):
    """n_docs / n_unique_texts must agree with exact_dedup_stats, and the
    token identities must hold row-wise."""
    savings = {r["source"]: r for r in dedup_token_savings(spark, sf_dir).collect()}
    stats = {r["source"]: r for r in exact_dedup_stats(spark, sf_dir).collect()}
    assert set(savings) == set(stats)
    for src, r in savings.items():
        assert r["n_docs"] == stats[src]["n_docs"]
        assert r["n_unique_texts"] == stats[src]["n_distinct"]
        assert r["tokens_saved"] == r["tokens_total"] - r["tokens_unique"]
        assert 0 <= r["tokens_unique"] <= r["tokens_total"]
        if r["tokens_total"]:
            assert abs(
                r["savings_ratio"] - r["tokens_saved"] / r["tokens_total"]
            ) < 1e-15


def test_token_savings_planted_duplicates(spark, monkeypatch):
    """A source with 3 copies of a 4-token text + 1 unique 2-token text:
    total 14 tokens, unique 6, saved 8."""
    import graphdb_td2_spark.dedup.exact as mod

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "s1"),
            (2, "alpha  beta gamma delta", "s1"),  # whitespace-normalized dup
            (3, "ALPHA beta gamma delta", "s1"),  # case-normalized dup
            (4, "epsilon zeta", "s1"),
        ],
        "doc_id long, text string, source string",
    )
    monkeypatch.setattr(
        mod, "read_table", lambda spark, sf_dir, table, cols=None: docs
    )
    row = mod.dedup_token_savings(spark, "ignored").collect()[0]
    assert (row["n_docs"], row["n_unique_texts"]) == (4, 2)
    assert (row["tokens_total"], row["tokens_unique"]) == (14, 6)
    assert row["tokens_saved"] == 8
    assert abs(row["savings_ratio"] - 8 / 14) < 1e-15
