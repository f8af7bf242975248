"""N-gram language-model scoring — the KenLM-style perplexity filter of
production training-data pipelines (CCNet/RedPajama recipe: train a cheap LM
on a trusted split, score candidate docs, drop the high-perplexity tail).

Two-phase, both fully distributed:

1. TRAIN — bigram counts over the *training split* (md5-uniform half of the
   corpus via the shared :func:`graphdb_td2_spark.functions.sampling.hash_bucket`
   policy — deterministic, partition-invariant, engine-portable): explode
   bigrams → groupBy count. Map-side partial aggregation makes the shuffle
   carry distinct-bigram rows, not token rows.
2. SCORE — explode the *held-out* docs' bigrams, join against the model
   (broadcast here; at 100 TB the model side is still the small side —
   distinct bigrams grow sub-linearly — or falls back to a shuffle join on
   the bigram key), then one groupBy(doc_id) re-aggregation.

Driver-checked output is exact: integer bigram counts and ONE final IEEE
division for the coverage ratio (the same single-division discipline as the
quantized cosine). Perplexity itself is transcendental (sums of ``ln``), so
it is deliberately NOT in the oracle-gated projection:
:func:`lm_perplexity` computes it for production use and is verified against
a pure-Python reference model by property test (tests/test_lm.py), the same
pattern as the BM25/ER/SSSP reference models.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import read_table
from .sampling import hash_sample_flag
from .text import tokens_col

TRAIN_RATE = 0.5  # md5-bucket share of docs used to train the model
ADD_K = 1  # add-k (Laplace) smoothing for the perplexity variant


def _with_bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, split-cols…, bigrams array<string>) — adjacent token pairs
    space-joined; empty array for docs with fewer than 2 tokens (guarded:
    Spark's sequence(1, 0) would count DOWN)."""
    toks = tokens_col(F.col("text"))
    bigrams = F.when(
        F.size(toks) >= 2,
        F.expr(
            "transform(sequence(1, size(toks) - 1),"
            " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.withColumn("toks", toks).withColumn("bigrams", bigrams).drop("toks")


def _split_docs(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    docs = read_table(spark, sf_dir, "documents", ["doc_id", "text"])
    in_train = hash_sample_flag(F.col("doc_id"), TRAIN_RATE)
    with_b = _with_bigrams(docs)
    return with_b.filter(in_train), with_b.filter(~in_train)


def train_bigram_counts(train: DataFrame) -> DataFrame:
    """(bigram, cnt) over the training split — the LM 'model' table."""
    return (
        train.select(F.explode("bigrams").alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def lm_bigram_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: held-out docs scored against the train-split bigram
    model. All-exact columns:

    doc_id, n_bigrams, known_bigrams (seen in training), novel_bigrams,
    hit_weight (sum of training counts of matched bigrams — the integer
    fluency signal), coverage (known/n — one IEEE division, deterministic;
    NULL for docs with no bigrams)."""
    train, heldout = _split_docs(spark, sf_dir)
    model = train_bigram_counts(train)
    exploded = heldout.select(
        "doc_id", F.explode_outer("bigrams").alias("bigram")
    ).join(F.broadcast(model), "bigram", "left")
    known = F.sum(
        F.when(F.col("cnt").isNotNull(), F.lit(1)).otherwise(F.lit(0))
    ).cast("long")
    n_bigrams = F.sum(
        F.when(F.col("bigram").isNotNull(), F.lit(1)).otherwise(F.lit(0))
    ).cast("long")
    return (
        exploded.groupBy("doc_id")
        .agg(
            n_bigrams.alias("n_bigrams"),
            known.alias("known_bigrams"),
            (n_bigrams - known).alias("novel_bigrams"),
            F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("hit_weight"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "known_bigrams",
            "novel_bigrams",
            "hit_weight",
            F.when(
                F.col("n_bigrams") > 0,
                F.col("known_bigrams").cast("double")
                / F.col("n_bigrams").cast("double"),
            ).alias("coverage"),
        )
        .orderBy("doc_id")
    )


def lm_perplexity(
    spark: SparkSession, sf_dir: str, add_k: int = ADD_K
) -> DataFrame:
    """Production scoring variant: add-k smoothed bigram perplexity of each
    held-out doc under the train-split model.

    p(b) = (cnt(b) + k) / (N + k·V) with N = total training bigram tokens,
    V = distinct training bigrams + 1 (the OOV event);
    ppl(doc) = exp(-mean ln p). Transcendental → verified by property test
    against a pure-Python model, not the SQL oracle."""
    train, heldout = _split_docs(spark, sf_dir)
    model = train_bigram_counts(train)
    totals = model.agg(
        F.sum("cnt").alias("n_tok"), F.count(F.lit(1)).alias("v")
    ).first()
    n_tok = int(totals["n_tok"] or 0)
    vocab = int(totals["v"] or 0) + 1
    denom = float(n_tok + add_k * vocab)
    log_p = F.log(
        (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(add_k)).cast("double")
        / F.lit(denom)
    )
    return (
        heldout.select("doc_id", F.explode_outer("bigrams").alias("bigram"))
        .join(F.broadcast(model), "bigram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.col("bigram")).cast("long").alias("n_bigrams"),
            F.sum(F.when(F.col("bigram").isNotNull(), log_p)).alias("ll"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.when(
                F.col("n_bigrams") > 0, F.exp(-F.col("ll") / F.col("n_bigrams"))
            ).alias("perplexity"),
        )
        .orderBy("doc_id")
    )


def reference_perplexity(
    train_texts: list[str], score_texts: list[str], add_k: int = ADD_K
) -> list[float | None]:
    """Pure-Python reference model for the property test (mirrors
    :func:`lm_perplexity` exactly, including the OOV vocab slot)."""

    def bigrams(t: str) -> list[str]:
        toks = t.strip().lower().split()
        return [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    counts: dict[str, int] = {}
    for t in train_texts:
        for b in bigrams(t):
            counts[b] = counts.get(b, 0) + 1
    n_tok = sum(counts.values())
    denom = float(n_tok + add_k * (len(counts) + 1))
    out: list[float | None] = []
    for t in score_texts:
        bs = bigrams(t)
        if not bs:
            out.append(None)
            continue
        ll = sum(math.log((counts.get(b, 0) + add_k) / denom) for b in bs)
        out.append(math.exp(-ll / len(bs)))
    return out
