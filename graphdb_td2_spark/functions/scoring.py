"""Model-based quality scoring [extension]: a linear classifier applied
corpus-wide as a Spark expression — the "quality classifier" stage of an
LLM data pipeline (fastText-style filtering), distilled to its Spark
shape: per-row feature extraction → dot product with broadcast weights →
threshold keep decision, all inside whole-stage codegen with zero Python.

The heuristic rule-based filter is ``text.quality_filter_stats``; this is
its learned-model counterpart. The weights here are fixed demo constants
(the operator contract is the *inference plan*, not the model fit) —
swapping in trained weights is a constant change.

Cross-engine determinism: features are exact integer counts; ratio
features use integer fixed-point division (``div``/``//`` on positive
longs — identical truncation in both engines); the logit is an integer
dot product. The only double is the final mean (one division).

Scale notes: one narrow projection over the pruned (source, text) scan +
one partial-aggregated per-source rollup — the same single-shuffle shape
as the other text-tier rollups; no joins, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import read_table
from .text import LANG_LEXICONS, tokens_col

STOPWORDS_EN = LANG_LEXICONS["en"]

FP = 1_000_000
# logit_fp = W_TTR·ttr_fp + W_STOP·stop_fp + W_MLEN·mlen_fp  (fp = ×1e6)
W_TTR = 2
W_STOP = 4
W_MLEN = -1
KEEP_THRESHOLD_FP = -3_300_000  # ≈ corpus median → a meaningful split


def quality_logit_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source classifier rollup: docs scored, docs kept, keep rate,
    mean/min/max logit (fixed-point bigints; mean is one division)."""
    docs = read_table(spark, sf_dir, "documents", ["source", "text"])
    toks = tokens_col(F.col("text"))
    feats = docs.select(
        "source",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS_EN)))
        .cast("long")
        .alias("stop_hits"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).alias("sum_len"),
    )
    scored = feats.select(
        "source",
        (
            F.lit(W_TTR) * F.expr(f"(n_distinct * {FP}) div n_tokens")
            + F.lit(W_STOP) * F.expr(f"(stop_hits * {FP}) div n_tokens")
            + F.lit(W_MLEN) * F.expr(f"(sum_len * {FP}) div n_tokens")
        ).alias("logit_fp"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                (F.col("logit_fp") >= F.lit(KEEP_THRESHOLD_FP)).cast("long")
            ).alias("n_kept"),
            F.sum("logit_fp").cast("long").alias("sum_logit_fp"),
            F.min("logit_fp").alias("min_logit_fp"),
            F.max("logit_fp").alias("max_logit_fp"),
        )
        .select(
            "source",
            "n_docs",
            "n_kept",
            (F.col("n_kept").cast("double") / F.col("n_docs").cast("double")).alias(
                "keep_rate"
            ),
            (
                F.col("sum_logit_fp").cast("double") / F.col("n_docs").cast("double")
            ).alias("mean_logit_fp"),
            "min_logit_fp",
            "max_logit_fp",
        )
        .orderBy("source")
    )


def gini_stump_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: one row ``(threshold_cents, n_left, pos_left,
    n_right, pos_right, weighted_gini)`` — a DISTRIBUTED decision-stump
    trainer: the split of ``events.value`` that best separates purchase
    from non-purchase events by weighted Gini impurity, found with ONE
    scan + one bounded window pass (no per-candidate rescan).

    The trick is the same distinct-value ECDF used by ``ks_value_drift``:
    per candidate threshold v, the left-side (n, positives) are running
    sums over the distinct-cent axis, so EVERY candidate's impurity is
    evaluated simultaneously. Squares/ratios run in IEEE double on exact
    ≤2⁵³ integer counts (identical expression tree per engine), and the
    argmin carries a (gini ASC, threshold ASC) total order.

    Scale notes: the heavy pass is the per-cent-value hash agg; the
    window ranges over the bounded distinct-value axis. This is exactly
    how large-scale tree libraries (XGBoost/LightGBM histogram mode)
    evaluate splits — pre-binned feature histograms, not sorts of raw
    rows.
    """
    from ..operators.prefix import bucketed_cumsum

    ev = read_table(spark, sf_dir, "events", ["event_type", "value"])
    per_v = (
        ev.select(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
            (F.col("event_type") == "purchase").cast("long").alias("pos"),
        )
        .groupBy("cents")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_v"),
            F.sum("pos").cast("long").alias("pos_v"),
        )
    )
    tot = per_v.agg(
        F.sum("n_v").cast("long").alias("n"), F.sum("pos_v").cast("long").alias("pos")
    )
    # Two-phase prefix sum over the cent axis (whole-currency buckets
    # are monotone in cents) — no single-partition window even when the
    # distinct-value histogram is itself huge (operators/prefix.py).
    cand = (
        bucketed_cumsum(
            per_v,
            bucket=F.floor(F.col("cents") / 100),
            order=[F.col("cents").asc()],
            sums={"nl": "n_v", "posl": "pos_v"},
        )
        .select("cents", "nl", "posl")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("nl") < F.col("n"))  # right side non-empty
    )
    negl = F.col("nl") - F.col("posl")
    nr = F.col("n") - F.col("nl")
    posr = F.col("pos") - F.col("posl")
    negr = nr - posr
    sl = (
        F.col("posl").cast("double") * F.col("posl").cast("double")
        + negl.cast("double") * negl.cast("double")
    ) / F.col("nl").cast("double")
    sr = (
        posr.cast("double") * posr.cast("double")
        + negr.cast("double") * negr.cast("double")
    ) / nr.cast("double")
    scored = cand.select(
        "cents", "nl", "posl", nr.alias("nr"), posr.alias("posr"),
        ((F.col("n").cast("double") - sl - sr) / F.col("n").cast("double")).alias(
            "weighted_gini"
        ),
    )
    # argmin via top-1 sort-limit (TakeOrderedAndProject — distributed
    # per-partition top-k then a k-row driver merge, no global window).
    best = scored.orderBy(F.asc("weighted_gini"), F.asc("cents")).limit(1)
    return best.select(
        F.col("cents").alias("threshold_cents"),
        F.col("nl").alias("n_left"),
        F.col("posl").alias("pos_left"),
        F.col("nr").alias("n_right"),
        F.col("posr").alias("pos_right"),
        "weighted_gini",
    )


PERCEPTRON_EPOCHS = 4
PERCEPTRON_FEATURES = 8


def perceptron_lang_curve(
    spark: SparkSession,
    sf_dir: str,
    epochs: int = PERCEPTRON_EPOCHS,
    n_features: int = PERCEPTRON_FEATURES,
) -> DataFrame:
    """Registry entry: ``(epoch, n_mistakes, bias, w_l1)`` — the
    per-epoch training curve of a BATCH PERCEPTRON classifying documents
    as English (``lang = 'en'`` → +1) from hashed token-count features —
    the quality-classifier training loop of a data pipeline, run
    entirely in exact integers so the DuckDB unrolled-CTE oracle
    reproduces every weight bit-for-bit.

    Per epoch: score_d = b + Σ_j w_j·x_dj; a document is a mistake when
    y·score ≤ 0; w += Σ_mistakes y·x and b += Σ_mistakes y (the batch
    update). Weights, bias, scores, and the curve stats are all BIGINT —
    no learning-rate float, which is the perceptron's gift (scale
    invariance) and what makes iterative training hash-checkable
    (the same trick as the fixed-point ALS / PageRank tiers).

    Scale notes: the model state is 9 longs (8 weights + bias) — DRIVER
    state, inlined into each epoch's expressions as literals (the r7
    verdict's fix: broadcasting a 9-long model as DataFrames bought 4
    epochs × ~6 jobs of pure trigger overhead). One build job pivots the
    corpus to a cached per-doc wide table ``(y, x0..x7)``; each epoch is
    then ONE aggregation job over it — score/mistake filter/per-feature
    deltas fused into a single scan with map-side partials, nothing but
    10 longs ever reaching the driver. This is exactly how a production
    Spark training loop handles a tiny linear model: data never moves,
    the model rides the closure.
    """
    from .hashing_tf import feature_bucket

    docs = read_table(spark, sf_dir, "documents", ["doc_id", "lang", "text"])
    feats = docs.select(
        "doc_id",
        F.when(F.col("lang") == "en", F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("y"),
        F.explode_outer(tokens_col(F.col("text"))).alias("token"),
    ).select(
        "doc_id", "y", feature_bucket(F.col("token"), n_features).alias("bucket")
    )
    wide = (
        feats.groupBy("doc_id", "y")
        .agg(
            *[
                # coalesce: a token-less doc survives explode_outer as one
                # null-bucket row whose conditional sum is NULL — its
                # feature vector is all-zeros, and it still scores b
                F.coalesce(
                    F.sum((F.col("bucket") == j).cast("long")), F.lit(0)
                )
                .cast("long")
                .alias(f"x{j}")
                for j in range(n_features)
            ]
        )
        .persist()
    )
    w = [0] * n_features
    b = 0
    rows: list[tuple[int, int, int, int]] = []
    for epoch in range(1, epochs + 1):
        score = F.lit(b)
        for j in range(n_features):
            if w[j] != 0:  # w=0 terms contribute nothing — epoch 1 is b-only
                score = score + F.lit(w[j]) * F.col(f"x{j}")
        mistake = (F.col("y") * score) <= 0
        stats = wide.agg(
            F.sum(mistake.cast("long")).cast("long").alias("n_mistakes"),
            F.sum(F.when(mistake, F.col("y")).otherwise(F.lit(0)))
            .cast("long")
            .alias("db"),
            *[
                F.sum(
                    F.when(mistake, F.col("y") * F.col(f"x{j}")).otherwise(
                        F.lit(0)
                    )
                )
                .cast("long")
                .alias(f"dw{j}")
                for j in range(n_features)
            ],
        ).collect()[0]
        for j in range(n_features):
            w[j] += stats[f"dw{j}"]
        b += stats["db"]
        rows.append((epoch, stats["n_mistakes"], b, sum(abs(x) for x in w)))
    return spark.createDataFrame(
        rows, "epoch long, n_mistakes long, bias long, w_l1 long"
    ).orderBy("epoch")
