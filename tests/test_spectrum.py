"""Shingle-vocabulary statistics (dedup/spectrum.py) — accounting laws
against the shared shingle cache."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_td2_spark.dedup.shingles import cached_doc_shingles
from graphdb_td2_spark.dedup.spectrum import (
    shingle_frequency_spectrum,
    shingle_novelty_curve,
)


def test_spectrum_accounts_for_every_posting_and_type(spark, sf_dir):
    sh = cached_doc_shingles(spark, sf_dir)
    total_postings = sh.count()
    total_types = sh.select("shingle").distinct().count()
    rows = shingle_frequency_spectrum(spark, sf_dir).collect()
    assert sum(r["n_postings"] for r in rows) == total_postings
    assert sum(r["n_shingles"] for r in rows) == total_types
    for r in rows:
        # bucket b holds dfs in [2^b, 2^(b+1))
        assert 2 ** r["df_bucket"] <= r["min_df"] <= r["max_df"] < 2 ** (
            r["df_bucket"] + 1
        )
    assert [r["df_bucket"] for r in rows] == sorted(r["df_bucket"] for r in rows)


def test_novelty_curve_sums_to_corpus_totals(spark, sf_dir):
    sh = cached_doc_shingles(spark, sf_dir)
    n_docs = sh.select("doc_id").distinct().count()
    total_postings = sh.count()
    total_types = sh.select("shingle").distinct().count()
    rows = shingle_novelty_curve(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert rows[-1]["cum_postings"] == total_postings == sum(
        r["n_postings"] for r in rows
    )
    assert rows[-1]["cum_vocab"] == total_types == sum(
        r["n_new_shingles"] for r in rows
    )
    # cumulative columns really are the running sums, in decile order
    run_p = run_v = 0
    for r in rows:
        run_p += r["n_postings"]
        run_v += r["n_new_shingles"]
        assert r["cum_postings"] == run_p and r["cum_vocab"] == run_v


def test_first_decile_novelty_equals_its_own_vocabulary(spark, sf_dir):
    """Every shingle of decile 1 is new by definition."""
    sh = cached_doc_shingles(spark, sf_dir)
    rows = {r["decile"]: r for r in shingle_novelty_curve(spark, sf_dir).collect()}
    d1_docs = (
        sh.select("doc_id").distinct().orderBy("doc_id").limit(rows[1]["n_docs"])
    )
    d1_vocab = (
        sh.join(d1_docs, "doc_id").select("shingle").distinct().count()
    )
    assert rows[1]["n_new_shingles"] == d1_vocab
