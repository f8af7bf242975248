"""Feature hashing (functions/hashing_tf.py): accounting vs token_stats
and bucket-range/stability properties."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from graphdb_td2_spark.functions.hashing_tf import N_FEATURES, hashing_tf_stats
from graphdb_td2_spark.functions.text import tokens_col
from graphdb_td2_spark.io import read_table


def test_buckets_account_for_every_token(spark, sf_dir):
    rows = hashing_tf_stats(spark, sf_dir).collect()
    assert rows
    docs = read_table(spark, sf_dir, "documents", ["text"])
    n_tokens = docs.select(
        F.sum(F.size(tokens_col(F.col("text")))).alias("n")
    ).collect()[0]["n"]
    assert sum(r["n_tokens"] for r in rows) == n_tokens
    for r in rows:
        assert 0 <= r["bucket"] < N_FEATURES
        assert 0 < r["n_docs"] <= r["n_tokens"]


def test_bucket_matches_python_md5(spark):
    # the engine's bucket for a literal token equals the Python md5 mirror
    tok = "hello"
    want = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % N_FEATURES
    from graphdb_td2_spark.functions.hashing_tf import feature_bucket

    got = spark.range(1).select(feature_bucket(F.lit(tok))).collect()[0][0]
    assert got == want
