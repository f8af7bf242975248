"""Last-touch conversion attribution — for every purchase, which event
type (view, click, …) the user did last within the attribution window.
The standard marketing/causal rollup over event streams, and the
window-family pattern the existing funnel/deltas operators don't cover:
a *conditional carry-forward* (``last(..., ignorenulls=True)`` over an
unbounded-preceding frame) instead of fixed-offset lag.

Determinism: the per-user order is ``(ts, event_id)``; the carried
struct leads with ``ts`` so "latest" is unambiguous; the window cutoff
is exact interval arithmetic on timestamps (UTC session).

Scale notes: one shuffle on user_id — the same partitioning every
window-family operator shares (sessionize, deltas, funnel), so on a
pre-bucketed events lake they all pipeline over one exchange. The
attribution rollup output is |event_type|-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..io import read_table

ATTRIBUTION_WINDOW = "1 hour"
CONVERSION = "purchase"


def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(attributed_type, n_purchases)`` — purchases
    credited to the user's latest non-purchase event within 1 hour
    before the purchase ('none' when there is no such touch), ordered by
    attributed_type."""
    ev = read_table(
        spark, sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]
    )
    seq = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(
            F.col("event_type") != CONVERSION,
            F.struct(F.col("ts").alias("t_ts"), F.col("event_type").alias("t_type")),
        ),
        ignorenulls=True,
    ).over(seq)
    return (
        ev.withColumn("touch", touch)
        .filter(F.col("event_type") == CONVERSION)
        .select(
            F.when(
                F.col("touch").isNotNull()
                & (
                    F.col("touch.t_ts")
                    >= F.col("ts") - F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}")
                ),
                F.col("touch.t_type"),
            )
            .otherwise(F.lit("none"))
            .alias("attributed_type")
        )
        .groupBy("attributed_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_purchases"))
        .orderBy("attributed_type")
    )


def ushape_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(event_type, credit_bp, n_touches)`` — U-shaped
    (position-based) multi-touch attribution: every purchase distributes
    10,000 basis points over its non-purchase touches within the 1-hour
    window — 40% to the first touch, 40% to the last, 20% split over the
    middles — summed per touch type, ordered by event_type.

    Exact-integer credit split: middles get ``2000 DIV m`` bp each and
    the integer-division remainder rides on the LAST touch, so every
    attributed purchase contributes exactly 10,000 bp (2 touches →
    5000/5000, 1 touch → 10000). Purchases with no in-window touch are
    excluded (the last-touch rollup above already counts them as
    'none').

    Scale notes: the (purchase × touch) pair generation is an equi-join
    on user_id with a time-band predicate — the same banded shape as
    ``event_burst_pairs``, pair count bounded by per-user activity per
    window; ranking first/last touches is one window partitioned by
    purchase. Output is |event_type|-bounded.
    """
    ev = read_table(
        spark, sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]
    )
    purchases = ev.filter(F.col("event_type") == CONVERSION).select(
        F.col("user_id").alias("u"),
        F.col("ts").alias("pts"),
        F.col("event_id").alias("pid"),
    )
    touches = ev.filter(F.col("event_type") != CONVERSION)
    pairs = touches.join(
        purchases,
        (F.col("user_id") == F.col("u"))
        & (F.col("ts") < F.col("pts"))
        & (F.col("ts") >= F.col("pts") - F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}")),
    )
    w = Window.partitionBy("pid").orderBy(F.asc("ts"), F.asc("event_id"))
    ranked = pairs.select(
        "pid",
        "event_type",
        F.row_number().over(w).alias("pos"),
        F.count(F.lit(1)).over(Window.partitionBy("pid")).alias("k"),
    )
    mid_share = F.expr("2000 DIV (k - 2)")
    credit = (
        F.when(F.col("k") == 1, F.lit(10000))
        .when(F.col("k") == 2, F.lit(5000))
        .when(F.col("pos") == 1, F.lit(4000))
        .when(
            F.col("pos") == F.col("k"),
            F.lit(4000) + F.lit(2000) - (F.col("k") - 2) * mid_share,
        )
        .otherwise(mid_share)
    )
    return (
        ranked.select("event_type", credit.cast("long").alias("credit"))
        .groupBy("event_type")
        .agg(
            F.sum("credit").cast("long").alias("credit_bp"),
            F.count(F.lit(1)).cast("long").alias("n_touches"),
        )
        .orderBy("event_type")
    )


def conversion_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(first_touch_type, n_purchases, p50_latency_s,
    p90_latency_s)`` — time-to-convert distribution: for every purchase
    with at least one in-window touch, latency from the FIRST touch to
    the purchase, quantiled per first-touch type. Ordered by type.

    Determinism: the first touch is the ``min_by`` over the total
    (ts, event_id) order; latencies are exact integer seconds
    (microsecond difference DIV 1e6 — micros are non-negative so DIV's
    truncation matches DuckDB's ``//``); quantiles are the exact
    linear-interpolation percentile already parity-pinned by
    ``value_percentiles``.

    Scale notes: the pair join is the same banded user/time shape as
    ``ushape_attribution``; per-purchase reduction is a map-side-partial
    ``min_by`` hash agg (no window); output is |event_type|-bounded.
    """
    ev = read_table(
        spark, sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]
    )
    purchases = ev.filter(F.col("event_type") == CONVERSION).select(
        F.col("user_id").alias("u"),
        F.col("ts").alias("pts"),
        F.col("event_id").alias("pid"),
    )
    touches = ev.filter(F.col("event_type") != CONVERSION)
    pairs = touches.join(
        purchases,
        (F.col("user_id") == F.col("u"))
        & (F.col("ts") < F.col("pts"))
        & (F.col("ts") >= F.col("pts") - F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}")),
    )
    first = pairs.groupBy("pid").agg(
        F.min_by(
            F.struct(F.col("event_type"), F.col("ts")),
            F.struct(F.col("ts"), F.col("event_id")),
        ).alias("ft"),
        F.first("pts").alias("pts"),
    )
    lat = first.select(
        F.col("ft.event_type").alias("first_touch_type"),
        F.expr("(unix_micros(pts) - unix_micros(ft.ts)) DIV 1000000").alias(
            "latency_s"
        ),
    )
    from .percentiles import as_value, percentile_numerators

    pf = percentile_numerators(
        lat, ["first_touch_type"], "latency_s",
        [(1, 2, "p50n"), (9, 10, "p90n")],
    )
    return pf.select(
        "first_touch_type",
        F.col("n").alias("n_purchases"),
        as_value(F.col("p50n"), 2).alias("p50_latency_s"),
        as_value(F.col("p90n"), 10).alias("p90_latency_s"),
    ).orderBy("first_touch_type")


# --- Markov removal-effect attribution ------------------------------------

MARKOV_SCALE = 1_000_000  # absorption probabilities in micro units
MARKOV_ITERS = 16  # fixed value-iteration unroll (geometric convergence)
_TRANSIENT = ("click", "error", "signup", "view")  # corpus journey states
_DSTS = _TRANSIENT + ("purchase", "end")


def _journey_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact journey transition counts ``(src, dst, n)``: per user in
    (ts, event_id) order each event's source is its predecessor's type —
    or START when there is none or the predecessor converted (a purchase
    closes the journey, the next event opens a new one); a user's final
    non-purchase event additionally transitions to END; purchases have
    no outgoing edges."""
    ev = read_table(
        spark, sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]
    )
    seq = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    typed = ev.select(
        "event_type",
        F.lag("event_type").over(seq).alias("prev_type"),
        F.lead("event_type").over(seq).alias("next_type"),
    )
    src = F.when(
        F.col("prev_type").isNull() | (F.col("prev_type") == CONVERSION),
        F.lit("start"),
    ).otherwise(F.col("prev_type"))
    forward = typed.select(src.alias("src"), F.col("event_type").alias("dst"))
    terminal = typed.filter(
        F.col("next_type").isNull() & (F.col("event_type") != CONVERSION)
    ).select(F.col("event_type").alias("src"), F.lit("end").alias("dst"))
    return (
        forward.unionByName(terminal)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def markov_removal_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(event_type, base_p_fp, removed_p_fp,
    removal_effect_fp, share_pm)`` — Markov-chain (removal-effect)
    attribution over user journeys, the standard third member next to
    last-touch and U-shape: model journeys as a first-order chain
    (START → … → PURCHASE | END), compute the chain's conversion
    probability by value iteration, then re-compute it with each
    channel REMOVED (its inbound transitions divert to END); a
    channel's credit is how much conversion probability disappears
    without it. ``*_fp`` are micro-probabilities (``MARKOV_SCALE``);
    ``share_pm`` is the per-mille normalized credit. Ordered by
    event_type.

    Determinism: transition counts are exact longs; value iteration is
    a FIXED ``MARKOV_ITERS``-step unroll of
    ``p(s) ← (Σ_t n(s→t)·p(t) + n(s→PURCHASE)·SCALE) div n_out(s)``
    — integer floor arithmetic, so both engines walk the identical
    recurrence (per-step downward bias ≤ 1/SCALE; path mass beyond 16
    hops is geometrically negligible and equally absent in both).

    Scale notes: the corpus-sized work is ONE lag-window pass (the
    shared sessionize shuffle) and a |types|²-bounded hash agg; the
    five scenarios × 16 iterations are narrow integer projections over
    a FIVE-ROW frame (the state space is a fixed enum, so
    probabilities ride as columns — no joins, no shuffles). Each
    iteration is lineage-truncated: without the cut, projection
    collapse would inline p_{k-1} into every p_k term and the folded
    expression tree grows 4^16 — the 5-row checkpoint is the cheap
    antidote. The model fit is a constant-size epilogue to one
    aggregation, which is the right shape at 100 TB.
    """
    from ..graph.checkpointing import truncate_lineage

    counts = _journey_transition_counts(spark, sf_dir)
    # _TRANSIENT hardcodes the journey-state enum; a corpus gaining a new
    # event type would otherwise silently drop its transitions from n_out
    # in BOTH engines identically — fail loudly instead (ADVICE-r9). The
    # collect is |types|²-bounded and doubles as the materialization the
    # five broadcast scenarios reuse (one corpus pass, not two).
    counts_rows = counts.collect()
    unknown = sorted(
        ({r["src"] for r in counts_rows} - {"start", *_TRANSIENT})
        | ({r["dst"] for r in counts_rows} - set(_DSTS))
    )
    if unknown:
        raise ValueError(
            "markov_removal_attribution: journey states "
            f"{unknown} are not in the modeled enum {_DSTS}; extend "
            "_TRANSIENT (and the oracle twin) before trusting the fit"
        )
    counts = spark.createDataFrame(counts_rows, counts.schema)
    scenarios = spark.createDataFrame(
        [("none",)] + [(t,) for t in _TRANSIENT], "removed string"
    )
    # channel removal: transitions INTO the removed state divert to END
    adjusted = scenarios.join(F.broadcast(counts)).select(
        "removed",
        "src",
        F.when(F.col("dst") == F.col("removed"), F.lit("end"))
        .otherwise(F.col("dst"))
        .alias("dst"),
        "n",
    )
    srcs = ("start",) + _TRANSIENT
    n_cols = [f"n_{s}_{d}" for s in srcs for d in _DSTS]
    wide = adjusted.groupBy("removed").agg(
        *[
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("src") == s) & (F.col("dst") == d), F.col("n")
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias(f"n_{s}_{d}")
            for s in srcs
            for d in _DSTS
        ]
    )

    def num_sql(s: str) -> str:
        terms = [f"n_{s}_{t} * p_{t}" for t in _TRANSIENT]
        terms.append(f"n_{s}_purchase * {MARKOV_SCALE}")
        return " + ".join(terms)

    def out_sql(s: str) -> str:
        return " + ".join(f"n_{s}_{d}" for d in _DSTS)

    state = wide.select(
        "removed",
        *n_cols,
        *[F.lit(0).cast("long").alias(f"p_{t}") for t in _TRANSIENT],
    )
    for _ in range(MARKOV_ITERS):
        state = state.select(
            "removed",
            *n_cols,
            *[
                F.coalesce(
                    F.expr(
                        f"({num_sql(s)}) div nullif({out_sql(s)}, 0)"
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias(f"p_{s}")
                for s in _TRANSIENT
            ],
        ).transform(truncate_lineage)
    scored = state.select(
        "removed",
        F.coalesce(
            F.expr(f"({num_sql('start')}) div nullif({out_sql('start')}, 0)"),
            F.lit(0),
        )
        .cast("long")
        .alias("p_start"),
    )
    base = scored.filter(F.col("removed") == "none").select(
        F.col("p_start").alias("base_p_fp")
    )
    effects = (
        scored.filter(F.col("removed") != "none")
        .select(
            F.col("removed").alias("event_type"),
            F.col("p_start").alias("removed_p_fp"),
        )
        .crossJoin(F.broadcast(base))
        .select(
            "event_type",
            "base_p_fp",
            "removed_p_fp",
            F.greatest(F.col("base_p_fp") - F.col("removed_p_fp"), F.lit(0))
            .cast("long")
            .alias("removal_effect_fp"),
        )
    )
    total = effects.agg(
        F.sum("removal_effect_fp").cast("long").alias("total_effect")
    )
    return (
        effects.crossJoin(F.broadcast(total))
        .select(
            "event_type",
            "base_p_fp",
            "removed_p_fp",
            "removal_effect_fp",
            F.coalesce(
                F.expr(
                    "(1000 * removal_effect_fp) div nullif(total_effect, 0)"
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("share_pm"),
        )
        .orderBy("event_type")
    )
