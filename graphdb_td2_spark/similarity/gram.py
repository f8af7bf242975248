"""Distributed Gram / second-moment matrix over the embedding corpus —
the one-pass statistic behind PCA, whitening, and OPQ rotation training
in an embedding-heavy training-data pipeline (the reference's vector
tier stops at per-pair cosine; this is the corpus-level aggregate).

Two implementations with IDENTICAL integer results:

- ``gram_fixed_point`` (primary, the 100 TB path): Arrow-batched
  ``mapInPandas`` — each batch contributes a d×d partial Gram
  ``Qᵀ·Q`` accumulated in int64 (one numpy matmul per batch, emitted
  once per partition as d·(d+1)/2 upper-triangle rows), then one
  partial-aggregated hash agg over a (d²/2)-key space. Shuffle volume
  is #partitions · d² rows — independent of corpus row count.
- ``gram_exploded`` (declarative twin): double ``posexplode`` +
  equi-self-join on vec_id — the shape the DuckDB oracle mirrors
  1:1. O(N·d²) intermediate rows, fine at test scale, used to pin
  the mapInPandas path cross-checked in tests.

Determinism: components quantize via ``floor(x·1e6)`` (exact in both
engines, see functions/vectors.py); every product and sum is int64, so
the upper-triangle entries are bit-exact across engines, partitionings,
and the two implementations. int64 headroom: |q|≤2²⁰ ⇒ products ≤2⁴⁰,
safe to ~2²³ corpus rows per entry; at larger corpora drop the scale to
1e3 (documented contract, same code path).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.vectors import quantize_embedding
from ..io import read_table

Q_SCALE = 1_000_000


def gram_fixed_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(i, j, gram_fp)`` — exact int64 upper-triangle
    (i ≤ j, 0-based) of Σ q(x)·q(x)ᵀ over all embeddings, ordered by
    (i, j)."""
    emb = read_table(spark, sf_dir, "embeddings", ["embedding"])
    quant = emb.select(quantize_embedding(F.col("embedding")).alias("q"))

    def partial_gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        acc = None
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf["q"].to_numpy()).astype("int64")
            g = mat.T @ mat  # int64-exact partial Gram
            acc = g if acc is None else acc + g
        if acc is None:
            return
        d = acc.shape[0]
        iu, ju = [], []
        for i in range(d):
            for j in range(i, d):
                iu.append(i)
                ju.append(j)
        yield pd.DataFrame(
            {
                "i": pd.array(iu, dtype="int32"),
                "j": pd.array(ju, dtype="int32"),
                "partial": acc[iu, ju],
            }
        )

    partials = quant.mapInPandas(partial_gram, "i int, j int, partial long")
    return (
        partials.groupBy("i", "j")
        .agg(F.sum("partial").cast("long").alias("gram_fp"))
        .orderBy("i", "j")
    )


def gram_exploded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative twin of :func:`gram_fixed_point` (same output,
    O(N·d²) shape) — the oracle-mirrored formulation."""
    emb = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"])
    quant = emb.select(
        "vec_id", quantize_embedding(F.col("embedding")).alias("q")
    )
    comp = quant.select(
        "vec_id", F.posexplode("q").alias("i", "qx")
    )
    a, b = comp.alias("a"), comp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.vec_id") == F.col("b.vec_id"))
            & (F.col("a.i") <= F.col("b.i")),
        )
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(F.sum(F.col("a.qx") * F.col("b.qx")).cast("long").alias("gram_fp"))
        .orderBy("i", "j")
    )
