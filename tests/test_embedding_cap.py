"""Adversarial embedding block-cap tests (round-11 VERDICT task #2): the
``label`` column is a FIXED domain, so the largest label block grows
linearly with the corpus and the within-block self-join
(`dedup/embedding.py`) emits O(block²) pairs — 12.63× measured wall at
10× rows in r10, the registry's last quadratic. ``EMB_BLOCK_CAP`` bounds
every block's participants at ``cap`` rows (first-by-``vec_id``
semantics, mirrored by the oracle's QUALIFY), so the self-join is
≤ |labels|·cap²/2 pairs regardless of corpus size."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from graphdb_td2_spark.dedup.embedding import (
    EMB_BLOCK_CAP,
    capped_label_blocks,
    embedding_neardup_pairs,
)
from graphdb_td2_spark.functions.vectors import quantize_embedding


def _adversarial_vectors(spark, n_hot=40, n_cold=6):
    """One label block far above the (test) cap, one far below. Every
    hot vector is identical, so uncapped output is the full C(n_hot, 2)
    clique — the quadratic blowup in miniature."""
    rows = [(i, "hot", [1.0, 2.0, 3.0, 4.0]) for i in range(n_hot)]
    rows += [(1000 + i, "cold", [1.0, 0.0, float(i), 1.0]) for i in range(n_cold)]
    return spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )


def test_cap_bounds_oversized_block(spark):
    emb = _adversarial_vectors(spark)

    def pairs(cap):
        q = capped_label_blocks(
            emb.select(
                "vec_id", "label", quantize_embedding(F.col("embedding")).alias("qe")
            ),
            cap=cap,
        )
        a, b = q.alias("a"), q.alias("b")
        return a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        ).select(
            F.col("a.vec_id").alias("vec_id_a"),
            F.col("b.vec_id").alias("vec_id_b"),
            F.col("a.label").alias("label"),
        )

    # uncapped: the hot block emits the full clique
    hot_uncapped = pairs(10**9).filter(F.col("label") == "hot").count()
    assert hot_uncapped == math.comb(40, 2)

    # capped at 8: exactly C(8,2) pairs from the 8 lowest vec_ids
    capped = pairs(8)
    hot_rows = capped.filter(F.col("label") == "hot").collect()
    assert len(hot_rows) == math.comb(8, 2)
    ids = {r["vec_id_a"] for r in hot_rows} | {r["vec_id_b"] for r in hot_rows}
    assert ids == set(range(8))  # first-by-vec_id head, deterministic
    # the under-cap block is untouched
    assert capped.filter(F.col("label") == "cold").count() == math.comb(6, 2)


def test_capped_head_matches_plain_row_number(spark):
    """The salted two-stage top-k must equal the oracle's one-window
    ``row_number() OVER (PARTITION BY label ORDER BY vec_id) <= cap``."""
    from pyspark.sql import Window

    emb = _adversarial_vectors(spark, n_hot=50, n_cold=9).select(
        "vec_id", "label"
    )
    staged = {
        (r["label"], r["vec_id"])
        for r in capped_label_blocks(emb, cap=7).collect()
    }
    w = Window.partitionBy("label").orderBy("vec_id")
    plain = {
        (r["label"], r["vec_id"])
        for r in emb.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 7)
        .drop("rn")
        .collect()
    }
    assert staged == plain


def test_default_cap_is_noop_at_contract_scales(spark, sf_dir):
    """At sf0.001/sf0.01/sf0.1 the largest label block (218 at sf0.1) is
    below EMB_BLOCK_CAP = 1000, so capped output is byte-identical to
    the uncapped operator — the driver-hash invariance the cap was
    required to preserve."""
    from graphdb_td2_spark.io import read_table

    max_block = (
        read_table(spark, sf_dir, "embeddings", ["vec_id", "label"])
        .groupBy("label")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert max_block < EMB_BLOCK_CAP
    shipped = embedding_neardup_pairs(spark, sf_dir).collect()
    uncapped = embedding_neardup_pairs(spark, sf_dir, block_cap=10**9).collect()
    key = lambda r: (r["vec_id_a"], r["vec_id_b"])  # noqa: E731
    assert sorted(map(tuple, shipped), key=lambda t: t[:2]) == sorted(
        map(tuple, uncapped), key=lambda t: t[:2]
    )
