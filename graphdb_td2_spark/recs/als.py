"""Rank-1 alternating least squares over the customer-product rating
matrix, in exact integer fixed point — the matrix-factorization tier of
the recommendation family (the reference's recs stop at co-occurrence
counts, `app/main.py:96-117`; this learns latent factors from the same
implicit ratings).

Rank 1 keeps the normal equations scalar — for observed ratings r_cp:

    u_c ← Σ_p r·v_p / Σ_p v_p²      (per customer, over its products)
    v_p ← Σ_c r·u_c / Σ_c u_c²      (per product, over its customers)

which is exactly the alternating update of the dominant singular pair.
Everything runs scaled by S=1000 in int64 (``x DIV y`` on non-negative
operands floors identically in Spark and DuckDB), so T unrolled
iterations are CTE-expressible and the per-iteration SSE is value-hash
exact across engines — same discipline as the fixed-point PageRank
oracle (graph/pagerank.py).

Scale notes: each half-update is one join of the ratings table with a
factor table on its OWN key followed by a hash agg on the other key —
the classic two-shuffle-per-iteration ALS data flow, with AQE handling
hot customers/products. Factor tables are |customers| / |products|
rows — never collected to the driver. SSE is a single partial-agg sum.
Overflow headroom: |u_fp|,|v_fp| ≲ r_max·S and per-key degrees are
corpus-bounded; terms stay far below 2⁶³ at S=1e3 (documented
contract — at extreme rating magnitudes S drops a decade).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import read_table

ALS_SCALE = 1_000
ALS_ITERATIONS = 2


def _ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Implicit ratings: r = number of distinct orders of customer c
    containing product p."""
    orders = read_table(spark, sf_dir, "orders", ["o_orderkey", "o_custkey"])
    items = read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    return (
        items.join(orders, items["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("o_custkey").alias("c"),
            F.col("l_partkey").alias("p"),
            F.col("o_orderkey").alias("o"),
        )
        .distinct()
        .groupBy("c", "p")
        .agg(F.count(F.lit(1)).cast("long").alias("r"))
    )


def _solve_half(ratings: DataFrame, factors: DataFrame, key: str, other: str) -> DataFrame:
    """One ALS half-update: re-solve the ``key``-side factors against the
    fixed ``other``-side ``factors`` (columns: other, f)."""
    s2 = ALS_SCALE * ALS_SCALE
    return (
        ratings.join(factors, other)
        .groupBy(key)
        .agg(
            F.sum(F.col("r") * F.col("f")).alias("num"),
            F.sum((F.col("f") * F.col("f")) ).alias("den"),
        )
        .select(
            key,
            F.expr(f"CAST(num * {s2} AS BIGINT) DIV GREATEST(den, 1)")
            .cast("long")
            .alias("f"),
        )
    )


def _sse(ratings: DataFrame, u: DataFrame, v: DataFrame) -> DataFrame:
    s2 = ALS_SCALE * ALS_SCALE
    return (
        ratings.join(u.withColumnRenamed("f", "uf"), "c")
        .join(v.withColumnRenamed("f", "vf"), "p")
        .select(
            F.expr(f"(r * {s2} - uf * vf) * (r * {s2} - uf * vf) DIV {s2}").alias(
                "sq"
            )
        )
        .agg(
            F.sum("sq").cast("long").alias("sse_fp"),
            F.count(F.lit(1)).cast("long").alias("n_obs"),
        )
    )


def als_rank1_convergence(
    spark: SparkSession, sf_dir: str, iterations: int = ALS_ITERATIONS
) -> DataFrame:
    """Registry entry: ``(iteration, sse_fp, n_obs)`` — fixed-point SSE
    of the rank-1 reconstruction after each alternating round, ordered
    by iteration (monotone non-increasing up to fixed-point floor
    noise)."""
    ratings = _ratings(spark, sf_dir).cache()
    v = ratings.select("p").distinct().select(
        "p", F.lit(ALS_SCALE).cast("long").alias("f")
    )
    out = None
    for it in range(1, iterations + 1):
        u = _solve_half(ratings, v, "c", "p")
        v = _solve_half(ratings, u, "p", "c")
        row = _sse(ratings, u, v).select(
            F.lit(it).cast("int").alias("iteration"), "sse_fp", "n_obs"
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("iteration")
