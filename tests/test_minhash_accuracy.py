"""MinHash estimator-accuracy audit (dedup/minhash.py:
minhash_accuracy_report) — bounds and accounting invariants."""

from __future__ import annotations

from graphdb_td2_spark.dedup.minhash import (
    ACC_FP,
    N_BANDS,
    minhash_accuracy_report,
    minhash_lsh_pairs,
)


def test_accuracy_report_accounts_for_every_candidate_pair(spark, sf_dir):
    rows = minhash_accuracy_report(spark, sf_dir).collect()
    n_pairs_total = minhash_lsh_pairs(spark, sf_dir).count()
    assert sum(r["n_pairs"] for r in rows) == n_pairs_total
    assert all(1 <= r["n_shared_bands"] <= N_BANDS for r in rows)


def test_accuracy_report_scores_are_bounded_fixed_point(spark, sf_dir):
    for r in minhash_accuracy_report(spark, sf_dir).collect():
        assert 0 <= r["mean_est_fp"] <= ACC_FP
        assert 0 <= r["mean_true_fp"] <= ACC_FP
        assert 0 <= r["mean_abs_err_fp"] <= r["max_abs_err_fp"] <= ACC_FP


def test_more_shared_bands_means_higher_estimated_similarity(spark, sf_dir):
    """The LSH s-curve: pairs colliding in all bands must estimate at
    least as similar, on average, as single-band collisions (holds on
    this corpus; the report exists to CHECK it on any other)."""
    rows = sorted(
        minhash_accuracy_report(spark, sf_dir).collect(),
        key=lambda r: r["n_shared_bands"],
    )
    if len(rows) >= 2:
        assert rows[-1]["mean_est_fp"] >= rows[0]["mean_est_fp"]


def test_pq_recall_report_bounds(spark, sf_dir):
    """IVF-PQ recall accounting: same query set/k as the IVF report,
    recall an exact n_hits/n_truth ratio in [0, 1]."""
    from graphdb_td2_spark.similarity.ann import ann_recall_report
    from graphdb_td2_spark.similarity.pq import pq_recall_report

    pq = pq_recall_report(spark, sf_dir).collect()[0]
    ivf = ann_recall_report(spark, sf_dir).collect()[0]
    assert (pq["n_queries"], pq["k"]) == (ivf["n_queries"], ivf["k"])
    assert 0 <= pq["n_hits"] <= pq["n_queries"] * pq["k"]
    assert pq["recall"] == pq["n_hits"] / (pq["n_queries"] * pq["k"])
