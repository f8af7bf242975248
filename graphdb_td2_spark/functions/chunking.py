"""RAG-style document chunking: fixed-size token windows with overlap.

The standard retrieval/pre-training preprocessing step the reference has no
analogue for (its corpus is relational rows): split each document's token
sequence into windows of ``CHUNK_TOKENS`` with stride ``CHUNK_STRIDE``
(overlap = CHUNK_TOKENS - CHUNK_STRIDE), so embedding / indexing operates on
bounded spans while no token span longer than the overlap is lost at a
boundary.

Spark-first shape: tokenize (shared whitespace tokenizer,
:func:`graphdb_td2_spark.functions.text.tokens_col`), derive the chunk count
with exact integer math, ``explode(sequence(...))`` one row per chunk, then
``slice`` the token array per chunk — a single narrow projection + explode,
no shuffle at all until a downstream consumer groups. At 100 TB this is the
ideal shape: embarrassingly parallel per input split, output partitioning
inherited from the scan, and the chunk id is derivable (doc_id, chunk_id) so
downstream dedup/indexing can co-partition on doc_id for free.

Chunk-count law (all integer): n_chunks = 1 if n ≤ W else (n - W + S - 1)
div S + 1 — the last window may be shorter than W but always ends at token
n, and every start position satisfies start ≤ n.

The chunk fingerprint is md5 of the space-joined window (bit-identical hex
in Spark and DuckDB), so the oracle hash covers chunk CONTENT, not just the
span arithmetic.

This is span *extraction* (overlapping windows over raw docs); the related
:mod:`graphdb_td2_spark.functions.packing` is span *packing* (greedy
concatenation of whole docs into fixed training contexts) — the two ends of
the context-assembly pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import read_table
from .text import tokens_col

CHUNK_TOKENS = 64  # window W
CHUNK_STRIDE = 48  # stride S (overlap = 16 tokens)


def doc_chunks(
    spark: SparkSession,
    sf_dir: str,
    window: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """One row per (doc_id, chunk_id): token span bounds, span length, and
    an md5 fingerprint of the chunk text.

    Columns: doc_id, chunk_id, start_tok, end_tok, n_chunk_tokens (BIGINT,
    1-based inclusive token positions), chunk_md5 (hex string)."""
    if not (0 < stride <= window):
        raise ValueError(f"need 0 < stride <= window, got W={window} S={stride}")
    docs = read_table(spark, sf_dir, "documents", ["doc_id", "text"])
    toks = docs.select("doc_id", tokens_col(F.col("text")).alias("toks")).select(
        "doc_id", "toks", F.size("toks").cast("long").alias("n")
    )
    w, s = F.lit(window), F.lit(stride)
    n_chunks = F.when(F.col("n") <= w, F.lit(1).cast("long")).otherwise(
        F.expr(f"(n - {window} + {stride} - 1) div {stride}") + F.lit(1)
    )
    per_chunk = toks.select(
        "doc_id",
        "toks",
        "n",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_id"),
    ).select(
        "doc_id",
        "toks",
        "n",
        "chunk_id",
        (F.col("chunk_id") * s + 1).cast("long").alias("start_tok"),
    )
    end_tok = F.least(F.col("start_tok") + w - 1, F.col("n")).cast("long")
    return (
        per_chunk.select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            "start_tok",
            end_tok.alias("end_tok"),
            (end_tok - F.col("start_tok") + 1).cast("long").alias("n_chunk_tokens"),
            F.md5(
                F.array_join(
                    F.slice(
                        F.col("toks"),
                        F.col("start_tok").cast("int"),
                        (end_tok - F.col("start_tok") + 1).cast("int"),
                    ),
                    " ",
                )
            ).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_id")
    )


MASK_RATE_PCT = 15
SPAN_LEN = 3


def span_corruption_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(source, n_tokens, n_masked, n_spans,
    mask_rate)`` — T5-style span-corruption planning: tokens are masked
    in aligned spans of ``SPAN_LEN`` (a span is selected iff
    ``md5(doc_id:span_index) mod 100 < 15``), giving the denoising
    objective's (inputs, targets) split sizes per source BEFORE any
    expensive materialization. Ordered by source.

    Determinism: span selection is the engine's md5-bucket idiom on
    (doc_id, span index) — reproducible across engines, partitionings
    and reruns, unlike RNG-state masking. All counts are exact integers;
    mask_rate is one final division (it converges to 15% by md5
    uniformity — the test pins the tolerance).

    Scale notes: one tokens explode (the same shape as token_stats) into
    a partial-agged rollup; no per-doc Python, no RNG state to
    checkpoint.
    """
    docs = read_table(spark, sf_dir, "documents", ["doc_id", "text", "source"])
    toks = docs.select(
        "doc_id", "source", F.posexplode(tokens_col(F.col("text"))).alias("i", "tok")
    )
    span = F.floor(F.col("i") / SPAN_LEN)
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("doc_id"), span)), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    flagged = toks.select(
        "source",
        span.alias("span"),
        "doc_id",
        (bucket < MASK_RATE_PCT).cast("long").alias("masked"),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("masked").cast("long").alias("n_masked"),
            F.countDistinct(
                F.when(F.col("masked") == 1, F.concat_ws(":", "doc_id", "span"))
            )
            .cast("long")
            .alias("n_spans"),
        )
        .select(
            "source",
            "n_tokens",
            "n_masked",
            "n_spans",
            (F.col("n_masked").cast("double") / F.col("n_tokens").cast("double")).alias(
                "mask_rate"
            ),
        )
        .orderBy("source")
    )
