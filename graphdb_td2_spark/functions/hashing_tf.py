"""Feature hashing (the "hashing trick") — fixed-width term-frequency
vectors without a vocabulary: each token maps to
``md5(token) mod n_features``, so the featurizer is stateless,
engine-portable, and needs no fit pass or dictionary broadcast. This is
Spark MLlib's ``HashingTF`` re-expressed as pure Catalyst built-ins
(explode → narrow bucket expression → partial-agged counts), plus the
naive-Bayes sufficient statistics a hashed-feature classifier trains
from.

The bucket expression reuses ``sampling.hash_bucket`` — the ONE
cross-engine md5-bucket definition the DuckDB oracles mirror.

Scale notes: no vocabulary state is the point — at 100 TB a dictionary
vectorizer needs a fit pass and a giant broadcast; the hashed one is a
per-row expression. One explode (narrow) + one (group, bucket) hash
aggregate; outputs are ``groups × n_features``-bounded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..io import read_table
from .sampling import hash_bucket
from .text import tokens_col

N_FEATURES = 8


def feature_bucket(token: Column, n_features: int = N_FEATURES) -> Column:
    return hash_bucket(token, n_features)


def hashing_tf_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(source, bucket, n_tokens, n_docs)`` — the
    per-source hashed term-frequency profile (summed HashingTF vectors)
    with the per-bucket document frequency, ordered by (source,
    bucket)."""
    docs = read_table(spark, sf_dir, "documents", ["doc_id", "source", "text"])
    toks = docs.select(
        "doc_id", "source", F.explode(tokens_col(F.col("text"))).alias("token")
    )
    return (
        toks.select(
            "doc_id", "source", feature_bucket(F.col("token")).alias("bucket")
        )
        .groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
        )
        .orderBy("source", "bucket")
    )
