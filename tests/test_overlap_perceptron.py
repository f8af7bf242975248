"""Units for the round-7 additions: cross-source shingle overlap and the
batch-perceptron training curve."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_td2_spark.dedup.overlap import source_overlap_matrix
from graphdb_td2_spark.functions.scoring import perceptron_lang_curve
from graphdb_td2_spark.io import read_table


def test_source_overlap_invariants(spark, sf_dir):
    rows = source_overlap_matrix(spark, sf_dir).collect()
    assert rows, "some source pair must share a shingle on the fixture"
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert 0 < r["n_common"] <= min(r["n_a"], r["n_b"])
        union = r["n_a"] + r["n_b"] - r["n_common"]
        assert r["jaccard"] == r["n_common"] / union
        assert 0.0 < r["jaccard"] <= 1.0
    keys = [(r["source_a"], r["source_b"]) for r in rows]
    assert keys == sorted(keys)  # deterministic matrix order


def test_perceptron_curve_semantics(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents", ["doc_id", "lang"])
    n_docs = docs.count()
    n_en = docs.filter(F.col("lang") == "en").count()
    rows = {r["epoch"]: r for r in perceptron_lang_curve(spark, sf_dir).collect()}
    assert sorted(rows) == [1, 2, 3, 4]
    # epoch 1 starts from w=0, b=0: every document scores 0 and y*0 <= 0,
    # so ALL docs are mistakes and the bias update is the label sum
    assert rows[1]["n_mistakes"] == n_docs
    assert rows[1]["bias"] == n_en - (n_docs - n_en)
    assert rows[1]["w_l1"] > 0
    # training actually reduces mistakes below the all-wrong start
    assert min(r["n_mistakes"] for r in rows.values()) < n_docs
