"""Deterministic hash sampling [extension] — the data-selection primitive
of a training-data pipeline (down-sample a corpus reproducibly, split
train/eval, A/B a pipeline change on the same 5%).

``df.sample()`` is seed-dependent per partitioning and not reproducible
across engines; hashing a stable key is: a row is kept iff
``md5(key) mod D < rate·D``. Same rows selected on every engine, every
run, any partitioning — and the predicate is a narrow per-row expression
(no shuffle, no coordination), so it scales embarrassingly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..io import read_table

DENOM = 10_000


def hash_bucket(key: Column, denom: int = DENOM) -> Column:
    """md5-uniform integer bucket in [0, denom) of a stable key — the ONE
    definition of the cross-engine-critical expression (the DuckDB oracles
    embed its exact mirror; keep them in lock-step)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
        % denom
    )


def hash_sample_flag(key: Column, rate: float, denom: int = DENOM) -> Column:
    """Boolean keep-flag: md5-uniform bucket of ``key`` below rate·denom.
    Exact integer math on the first 8 md5 hex digits (engine-portable)."""
    return hash_bucket(key, denom) < int(rate * denom)


def hash_sample(df: DataFrame, key: str, rate: float) -> DataFrame:
    """The rows of ``df`` whose ``key`` hashes into the sample."""
    return df.filter(hash_sample_flag(F.col(key), rate))


# train/val/test boundaries in DENOM-ths (90 / 5 / 5)
SPLIT_TRAIN_LT = 9_000
SPLIT_VAL_LT = 9_500


def dataset_split(key: Column) -> Column:
    """Deterministic train/val/test assignment from the key hash — the
    split is a pure row property: stable under repartitioning, appends,
    and engine choice (every engine md5s the same bytes)."""
    b = hash_bucket(key)
    return (
        F.when(b < SPLIT_TRAIN_LT, F.lit("train"))
        .when(b < SPLIT_VAL_LT, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def dataset_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, split) document counts with the within-source share —
    the audit a reproducible corpus split ships with. Narrow per-row
    assignment + one hash aggregate; the share is a window over the
    source partition (dimension-sized: one row per source×split)."""
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents", ["doc_id", "source"])
    counts = (
        docs.select("source", dataset_split(F.col("doc_id")).alias("split"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w = Window.partitionBy("source")
    return counts.select(
        "source",
        "split",
        "n_docs",
        (F.col("n_docs").cast("double") / F.sum("n_docs").over(w).cast("double")).alias(
            "split_share"
        ),
    ).orderBy("source", "split")


def stratified_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified rebalancing — the domain-mixing primitive: down-sample
    every source to (about) the SMALLEST source's size so the mixture is
    balanced, deterministically. A document survives iff
    ``bucket(doc_id) · n_source < n_target · DENOM`` — pure integer
    cross-multiplication (no float rate), so the kept set is exact and
    engine-portable; the per-source keep rate is n_target/n_source by
    md5-uniformity.

    Scale: one count aggregate over source (dimension-sized), the min
    broadcast back, then a narrow per-row predicate — the corpus itself
    is never shuffled. The audit output is one row per source."""
    docs = read_table(spark, sf_dir, "documents", ["doc_id", "source"])
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_source"))
    target = counts.agg(F.min("n_source").alias("n_target"))
    flagged = docs.join(F.broadcast(counts), "source").join(
        F.broadcast(target)
    ).withColumn(
        "kept",
        (
            hash_bucket(F.col("doc_id")) * F.col("n_source")
            < F.col("n_target") * F.lit(DENOM)
        ).cast("long"),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.first("n_source").alias("n_docs"),
            F.first("n_target").alias("n_target"),
            F.sum("kept").alias("n_kept"),
        )
        .withColumn(
            "kept_share",
            F.col("n_kept").cast("double") / F.col("n_docs").cast("double"),
        )
        .orderBy("source")
    )


FP_SQRT_SCALE = 1_000_000_000  # sqrt fixed-point: floor(sqrt(n)·10⁹)


def source_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-resampling weights per source, α = 0.5:
    ``w_s = n_s^α / Σ_t n_t^α`` — the standard rebalancing between
    proportional (α=1, big sources dominate) and uniform (α=0) mixing for
    multilingual/multi-domain corpora.

    Determinism: ``sqrt`` is IEEE-correctly-rounded in both engines, but a
    cross-row SUM of doubles is summation-order-dependent — so the weight
    numerator is the integer fixed-point ``floor(sqrt(n_s)·10⁹)`` and the
    denominator an exact BIGINT sum; each output double is ONE division of
    identical integers in both engines. ``rate_vs_proportional`` (the
    per-document up/down-sampling factor a mixer applies) is likewise a
    single division of exact int64 products (magnitudes bounded far below
    2⁶³ at any plausible source-count cardinality).

    Scale: a dimension-sized per-source count, a 1-row broadcast total,
    narrow arithmetic. The corpus is never reshuffled."""
    docs = read_table(spark, sf_dir, "documents", ["doc_id", "source"])
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    sq = counts.withColumn(
        "__s",
        F.floor(F.sqrt(F.col("n_docs")) * F.lit(FP_SQRT_SCALE)).cast("long"),
    )
    totals = sq.agg(
        F.sum("__s").alias("__s_total"), F.sum("n_docs").alias("__n_total")
    )
    return (
        sq.join(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            (F.col("__s").cast("double") / F.col("__s_total").cast("double")).alias(
                "weight"
            ),
            (
                (F.col("__s") * F.col("__n_total")).cast("double")
                / (F.col("__s_total") * F.col("n_docs")).cast("double")
            ).alias("rate_vs_proportional"),
        )
        .orderBy("source")
    )


def sampled_event_stats(
    spark: SparkSession, sf_dir: str, rate: float = 0.05
) -> DataFrame:
    """Per-type counts over a deterministic 5% sample of ``events`` vs the
    full population — the sanity check a sampling pipeline ships with
    (sample_share exposes bias; md5-uniformity keeps it near ``rate``)."""
    events = read_table(spark, sf_dir, "events", ["event_id", "event_type"])
    flagged = events.withColumn(
        "in_sample", hash_sample_flag(F.col("event_id"), rate)
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("in_sample").cast("long")).alias("n_sampled"),
        )
        .withColumn(
            "sample_share",
            F.col("n_sampled").cast("double") / F.col("n_total").cast("double"),
        )
        .orderBy("event_type")
    )


NEG_SLOTS = 4


def negative_sample_stats(
    spark: SparkSession, sf_dir: str, k: int = NEG_SLOTS
) -> DataFrame:
    """Registry entry: ``(slot, n_candidates, n_negatives, neg_rate)`` —
    deterministic hash-based negative sampling for implicit-feedback
    training: each customer draws ``k`` candidate products via
    ``md5(customer:slot) mod |parts|`` over a dense product index, and a
    candidate survives as a negative iff the customer never bought it
    (LEFT ANTI against the interaction set). Per-slot stats expose the
    positive-collision rate the trainer must budget for. Ordered by slot.

    Determinism: the md5-bucket idiom of ``hash_bucket`` (same bytes
    hashed on every engine); the dense index decouples sampling from key
    gaps. Scale notes: candidates are |customers|·k rows; the dense
    product index joins broadcast; the anti-join shuffles on the same
    (customer, product) key as the interaction build. No RNG state, no
    driver loops — replays identically under speculation/retry.
    """
    orders = read_table(spark, sf_dir, "orders", ["o_orderkey", "o_custkey"])
    items = read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    inter = (
        items.join(orders, items["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
        )
        .distinct()
    )
    parts = read_table(spark, sf_dir, "part", ["p_partkey"])
    from ..operators.prefix import bucketed_row_number

    # Dense 0-based product index via two-phase row numbering (key-range
    # buckets, operators/prefix.py) — no single-partition window over
    # the part dimension.
    pidx = bucketed_row_number(
        parts,
        bucket=F.floor(F.col("p_partkey") / 10_000),
        order=[F.col("p_partkey").asc()],
        out="rn",
    ).select((F.col("rn") - 1).alias("idx"), F.col("p_partkey"))
    n_parts = parts.agg(F.count(F.lit(1)).alias("n_parts"))
    cand = (
        inter.select("c")
        .distinct()
        .select("c", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("slot"))
        .crossJoin(F.broadcast(n_parts))
        .select(
            "c",
            "slot",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", F.col("c"), F.col("slot"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("n_parts")
            ).alias("idx"),
        )
        .join(F.broadcast(pidx), "idx")
        .select("c", "slot", F.col("p_partkey").alias("p"))
    )
    neg = cand.join(inter, ["c", "p"], "left_anti")
    cstats = cand.groupBy("slot").agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    nstats = neg.groupBy("slot").agg(F.count(F.lit(1)).cast("long").alias("n_negatives"))
    return (
        cstats.join(nstats, "slot")
        .select(
            "slot",
            "n_candidates",
            "n_negatives",
            (
                F.col("n_negatives").cast("double")
                / F.col("n_candidates").cast("double")
            ).alias("neg_rate"),
        )
        .orderBy("slot")
    )


def balanced_label_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(label, n_total, n_kept, kept_vec_id_sum)`` —
    class-balanced downsampling of the embedding corpus: every label is
    capped at the minority-class count, rows chosen by md5 order (a
    deterministic uniform shuffle), with the kept-set checksum proving
    the SELECTION (not just the count) is engine-stable. Ordered by
    label.

    Scale notes: one count agg for the cap (broadcast single row), one
    shuffle on label for the row_number window; hot labels are exactly
    the window partitions AQE-balanced elsewhere. The checksum makes the
    operator hash-verifiable without materializing the sample.
    """
    emb = read_table(spark, sf_dir, "embeddings", ["vec_id", "label"])
    from pyspark.sql import Window

    mn = emb.groupBy("label").count().agg(F.min("count").alias("cap"))
    w = Window.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    ranked = emb.select(
        "label", "vec_id", F.row_number().over(w).alias("rk")
    ).crossJoin(F.broadcast(mn))
    return (
        ranked.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.sum((F.col("rk") <= F.col("cap")).cast("long"))
            .cast("long")
            .alias("n_kept"),
            F.sum(
                F.when(F.col("rk") <= F.col("cap"), F.col("vec_id")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("kept_vec_id_sum"),
        )
        .orderBy("label")
    )
