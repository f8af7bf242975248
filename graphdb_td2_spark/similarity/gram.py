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


def label_centroid_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(label_a, label_b, n_a, n_b, sq_dist_fp)`` —
    pairwise squared distances between per-label embedding centroids,
    the domain-shift / cluster-separation diagnostic an embedding
    pipeline tracks release-over-release. Ordered by (label_a, label_b).

    Exactness: centroids are computed in fixed point — per-dimension
    quantized component sums (exact int64) floor-divided by the label
    count — and the squared distance of two integer centroid vectors is
    an exact int64 sum. No float means, no summation-order dependence.

    Scale notes: the component rollup is one (label, dim)-keyed hash
    agg (k·d rows out — label- and dimension-bounded, NOT row-bounded);
    the pairwise stage joins two k·d-sized frames (k² d intermediate,
    trivial for any real label count). The corpus-sized pass never
    leaves partial aggregation.
    """
    emb = read_table(spark, sf_dir, "embeddings", ["label", "embedding"])
    comp = emb.select(
        "label", F.posexplode(quantize_embedding(F.col("embedding"))).alias("i", "qx")
    )
    # Spark's integer DIV truncates toward zero; component sums can be
    # negative, so the oracle spells the same truncation explicitly
    # (DuckDB's bare // floors).
    cent = comp.groupBy("label", "i").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("qx").cast("long").alias("s"),
    ).select("label", "i", "n", F.expr("s DIV n").cast("long").alias("c"))
    a = cent.select(
        F.col("label").alias("label_a"), "i",
        F.col("n").alias("n_a"), F.col("c").alias("ca"),
    )
    b = cent.select(
        F.col("label").alias("label_b"), "i",
        F.col("n").alias("n_b"), F.col("c").alias("cb"),
    )
    return (
        a.join(b, "i")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.first("n_a").cast("long").alias("n_a"),
            F.first("n_b").cast("long").alias("n_b"),
            F.sum(
                (F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb"))
            )
            .cast("long")
            .alias("sq_dist_fp"),
        )
        .orderBy("label_a", "label_b")
    )


def embedding_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: one row ``(n_vecs, n_dims, n_dim_mismatch,
    n_null_vec, n_zero_norm, p50_sqnorm_fp, max_sqnorm_fp)`` — the
    embedding-table health audit an ANN pipeline gates on: dimension
    consistency, null/zero vectors (cosine-undefined), and the quantized
    squared-norm distribution (exact int64 norms → parity-pinned
    percentile). One pass, one row.
    """
    from ..functions.vectors import quantize_embedding, sqnorm_q

    emb = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"])
    dim0 = emb.filter(F.col("embedding").isNotNull()).agg(
        F.min(F.size("embedding")).alias("d0")
    )
    q = emb.crossJoin(F.broadcast(dim0)).select(
        F.col("embedding").isNull().cast("long").alias("is_null"),
        F.when(
            F.col("embedding").isNotNull(),
            (F.size("embedding") != F.col("d0")).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("dim_mismatch"),
        F.when(
            F.col("embedding").isNotNull(),
            sqnorm_q(quantize_embedding(F.col("embedding"))),
        ).alias("sqn"),
    )
    from ..operators.percentiles import percentile_numerators

    # engine-exact global median of the int64 norms: histogram percentile
    # with a monotone 2^20-wide bucket (two-phase prefix sum, no
    # single-partition window); p50 = numerator/2 exactly
    med = percentile_numerators(
        q.filter(F.col("sqn").isNotNull()).select(F.col("sqn").alias("v")),
        [],
        "v",
        [(1, 2, "p50n")],
        global_bucket=F.floor(F.col("v") / F.lit(1048576)),
    ).select((F.col("p50n").cast("double") / F.lit(2.0)).alias("p50_sqnorm_fp"))
    stats = q.crossJoin(F.broadcast(dim0)).agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.first("d0").cast("long").alias("n_dims"),
        F.sum("dim_mismatch").cast("long").alias("n_dim_mismatch"),
        F.sum("is_null").cast("long").alias("n_null_vec"),
        F.sum(F.coalesce((F.col("sqn") == 0).cast("long"), F.lit(0)))
        .cast("long")
        .alias("n_zero_norm"),
        F.max("sqn").cast("long").alias("max_sqnorm_fp"),
    )
    return stats.crossJoin(F.broadcast(med)).select(
        "n_vecs",
        "n_dims",
        "n_dim_mismatch",
        "n_null_vec",
        "n_zero_norm",
        "p50_sqnorm_fp",
        "max_sqnorm_fp",
    )
