"""Linear-classifier quality scoring (functions/scoring.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_td2_spark.functions.scoring import (
    FP,
    KEEP_THRESHOLD_FP,
    W_MLEN,
    W_STOP,
    W_TTR,
    quality_logit_stats,
)


def test_logit_matches_hand_computation(spark, tmp_path):
    # one doc with fully known features:
    # tokens = [the, the, cat] → n=3, distinct=2, stop_hits=2, sum_len=9
    df = spark.createDataFrame(
        [(0, "the the cat")], "doc_id long, text string"
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("s")) \
     .withColumn("n_chars", F.length("text").cast("long"))
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    row = quality_logit_stats(spark, str(tmp_path)).collect()[0]
    ttr_fp = (2 * FP) // 3
    stop_fp = (2 * FP) // 3
    mlen_fp = (9 * FP) // 3
    logit = W_TTR * ttr_fp + W_STOP * stop_fp + W_MLEN * mlen_fp
    assert row["min_logit_fp"] == row["max_logit_fp"] == logit
    assert row["n_docs"] == 1
    assert row["n_kept"] == (1 if logit >= KEEP_THRESHOLD_FP else 0)


def test_corpus_rollup_contract(spark, sf_dir):
    rows = quality_logit_stats(spark, sf_dir).collect()
    assert rows, "every corpus source must be scored"
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_docs"]
        assert abs(r["keep_rate"] - r["n_kept"] / r["n_docs"]) < 1e-12
        assert r["min_logit_fp"] <= r["mean_logit_fp"] <= r["max_logit_fp"]
    # the threshold was picked at the corpus median: the global keep rate
    # must be a genuine split, not degenerate 0/1
    total = sum(r["n_docs"] for r in rows)
    kept = sum(r["n_kept"] for r in rows)
    assert 0 < kept < total
