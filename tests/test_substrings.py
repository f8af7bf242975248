"""Repeated-substring profile (dedup/substrings.py): accounting laws on
the corpus and a planted-boilerplate fixture."""

from __future__ import annotations

from graphdb_td2_spark.dedup.substrings import repeated_ngram_stats
from graphdb_td2_spark.io import read_table


def test_accounting_laws(spark, sf_dir):
    rows = repeated_ngram_stats(spark, sf_dir).collect()
    assert rows
    n_total = read_table(spark, sf_dir, "documents", ["doc_id"]).count()
    assert sum(r["n_docs"] for r in rows) == n_total
    for r in rows:
        assert 0 <= r["n_flagged"] <= r["n_docs"]
        assert 0 <= r["sum_dup"] <= r["sum_shingles"]
        assert r["dup_share"] == r["sum_dup"] / r["sum_shingles"]


def test_planted_boilerplate_is_flagged(spark, tmp_path):
    boiler = "all rights reserved license text applies here"
    docs = [
        (0, f"{boiler} unique zero words", "en", "web", 1),
        (1, f"{boiler} other one tokens", "en", "web", 1),
        (2, "completely different text about gardening tips", "en", "web", 1),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tmp_path / "fx"
    df.write.parquet(str(d / "documents.parquet"))
    (row,) = repeated_ngram_stats(spark, str(d)).collect()
    # docs 0 and 1 share the 5 boilerplate shingles out of 8 each → flagged;
    # doc 2 shares nothing
    assert row["n_docs"] == 3
    assert row["n_flagged"] == 2
    assert row["sum_dup"] == 10
