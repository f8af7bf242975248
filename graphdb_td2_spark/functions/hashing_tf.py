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


def source_token_chisq(
    spark: SparkSession, sf_dir: str, n_features: int = N_FEATURES
) -> DataFrame:
    """Registry entry: ``(source, n_tokens, chi2)`` — per-source χ²
    divergence of the hashed token-bucket distribution against the
    corpus-wide distribution: the data-mixing diagnostic that flags a
    source whose token statistics drift from the blend it feeds
    (a cheap, vocabulary-free stand-in for per-source KL monitoring —
    KL needs log(), whose libm rounding differs across engines; χ² is
    division/multiplication only). Ordered by source.

    Determinism: bucket counts are exact longs; the expected counts and
    the χ² sum are ONE FIXED expression tree over the ``n_features``
    pivoted columns (each per-bucket term written literally, summed in
    bucket order — no aggregate-order dependence), so DuckDB reproduces
    every double bit-for-bit.

    Scale notes: one tokenize pass → (source, bucket) hash aggregate
    (map-side partials), a broadcast |buckets|-row corpus profile, and a
    |sources|-row output. The pivot is conditional aggregation, not a
    wide shuffle.
    """
    docs = read_table(spark, sf_dir, "documents", ["source", "text"])
    toks = docs.select(
        "source", F.explode(tokens_col(F.col("text"))).alias("token")
    )
    per_sb = (
        toks.select("source", feature_bucket(F.col("token"), n_features).alias("b"))
        .groupBy("source")
        .agg(
            *[
                F.sum((F.col("b") == j).cast("long"))
                .cast("long")
                .alias(f"c{j}")
                for j in range(n_features)
            ]
        )
    )
    # corpus totals get a distinct prefix: Spark resolves column names
    # case-insensitively, so C0 would collide with c0
    corpus = per_sb.agg(
        *[F.sum(f"c{j}").cast("long").alias(f"g{j}") for j in range(n_features)]
    )
    t_s = sum((F.col(f"c{j}") for j in range(1, n_features)), F.col("c0"))
    t_all = sum((F.col(f"g{j}") for j in range(1, n_features)), F.col("g0"))

    def term(j: int):
        e = (
            F.col("__ts").cast("double")
            * F.col(f"g{j}").cast("double")
            / F.col("__t").cast("double")
        )
        d = F.col(f"c{j}").cast("double") - e
        # empty corpus-wide bucket → e = 0 and c_j = 0: the term is 0 by
        # convention, not 0/0 (NaN vs engine-dependent — ADVICE r7); the
        # integer g_j guard is mirrored verbatim in the oracle SQL
        return F.when(F.col(f"g{j}") == 0, F.lit(0.0)).otherwise(d * d / e)

    chi2 = term(0)
    for j in range(1, n_features):
        chi2 = chi2 + term(j)
    return (
        per_sb.crossJoin(F.broadcast(corpus))
        .withColumn("__ts", t_s.cast("long"))
        .withColumn("__t", t_all.cast("long"))
        .select(
            "source",
            F.col("__ts").alias("n_tokens"),
            chi2.alias("chi2"),
        )
        .orderBy("source")
    )
