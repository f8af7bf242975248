"""N-gram LM scoring (functions/lm.py): exact-count invariants for the
oracle-gated entry, and the perplexity variant verified against a pure-Python
reference model (the BM25/ER/SSSP property-test pattern — the transcendental
column is deliberately outside the SQL oracle)."""

from __future__ import annotations

import math

import pytest

from graphdb_td2_spark.functions.lm import (
    TRAIN_RATE,
    lm_bigram_scores,
    lm_perplexity,
    reference_perplexity,
)
from graphdb_td2_spark.functions.sampling import DENOM, hash_sample_flag
from graphdb_td2_spark.io import read_table

from pyspark.sql import functions as F


def _split_texts(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents", ["doc_id", "text"]).withColumn(
        "in_train", hash_sample_flag(F.col("doc_id"), TRAIN_RATE)
    )
    rows = docs.collect()
    train = [r["text"] for r in rows if r["in_train"]]
    score = [(r["doc_id"], r["text"]) for r in rows if not r["in_train"]]
    return train, sorted(score)


def test_bigram_score_invariants(spark, sf_dir):
    out = lm_bigram_scores(spark, sf_dir).collect()
    assert out, "held-out split must be non-empty"
    for r in out:
        assert r["known_bigrams"] + r["novel_bigrams"] == r["n_bigrams"]
        assert r["hit_weight"] >= r["known_bigrams"]  # every hit counts >= 1
        if r["n_bigrams"] > 0:
            assert r["coverage"] == r["known_bigrams"] / r["n_bigrams"]
        else:
            assert r["coverage"] is None


def test_split_is_disjoint_and_covers(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents", ["doc_id"])
    n_total = docs.count()
    n_held = lm_bigram_scores(spark, sf_dir).count()
    n_train = docs.filter(hash_sample_flag(F.col("doc_id"), TRAIN_RATE)).count()
    assert n_train + n_held == n_total
    # md5-uniform: the train share should be near rate (loose 3-sigma bound)
    sigma = math.sqrt(n_total * TRAIN_RATE * (1 - TRAIN_RATE))
    assert abs(n_train - n_total * TRAIN_RATE) < 3 * sigma + 1
    assert DENOM * TRAIN_RATE == int(DENOM * TRAIN_RATE)  # exact boundary


def test_perplexity_matches_reference_model(spark, sf_dir):
    train, score = _split_texts(spark, sf_dir)
    expected = reference_perplexity(train, [t for _, t in score])
    got = {r["doc_id"]: r["perplexity"] for r in lm_perplexity(spark, sf_dir).collect()}
    assert len(got) == len(score)
    for (doc_id, _), exp in zip(score, expected):
        if exp is None:
            assert got[doc_id] is None
        else:
            assert got[doc_id] == pytest.approx(exp, rel=1e-9), doc_id


def test_perplexity_orders_fluency():
    """A doc made of training bigrams must score lower perplexity than one
    made of unseen bigrams, under the same model."""
    train = ["the cat sat on the mat", "the cat ate the fish"]
    fluent, gibberish = "the cat sat", "zyx qwv jkl"
    ppl = reference_perplexity(train, [fluent, gibberish])
    assert ppl[0] < ppl[1]
