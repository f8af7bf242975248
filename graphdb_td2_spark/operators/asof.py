"""As-of (temporal) join [extension] — match each left row to the most
recent right row at-or-before its timestamp, per key.

The reference has no temporal operators (its only joins are id equi-joins,
SURVEY.md §2.C), but a behavioral-events pipeline needs this constantly
("which order was active when this event fired?"). Spark has no built-in
as-of join; the scalable shape is the **union + window** plan rather than a
range join:

1. tag left rows 1 and right rows 0, union on aligned schemas;
2. one shuffle: window partitioned by key, ordered by (ts, tag);
3. ``last(right_payload, ignorenulls=True)`` over rows-unbounded-preceding
   carries the latest right values forward;
4. keep tag-1 rows.

Cost: a single hash shuffle + one sort — O(n log n) per key group, versus
the quadratic blowup of an inequality range join. Right rows sort before
left rows at equal ``ts`` (tag 0 < 1), giving inclusive at-or-before
semantics, the same as DuckDB's ``ASOF JOIN … ON l.ts >= r.ts`` oracle.

Scale notes: the union shuffles once on the key; skewed keys fall to AQE.
State per row is the carried right payload only. For a sorted/bucketed
lake layout both sides can arrive pre-partitioned and the exchange drops
out entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..io import read_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tolerance_secs: int | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the ``right_payload``
    columns of the latest ``right`` row with ``right_ts <= left_ts`` on the
    same ``on`` keys (nulls when none exists).

    ``tolerance_secs`` (pandas ``merge_asof``-style): a match further than
    this behind the left timestamp is treated as no match (payload nulls) —
    the 'state too stale to use' semantics of feature-store lookups. The
    bound is applied to the carried match, so it costs no extra join.

    ``right`` must be unique per (on, right_ts) — pre-aggregate it if not,
    or the carried row among ties is unspecified.
    """
    lcols = [c for c in left.columns if c not in on and c != left_ts]
    # The matched row travels as ONE struct (timestamp + payloads), so a
    # NULL payload on the latest right row stays NULL instead of falling
    # back to an older row's value — and the tolerance check below judges
    # the very row the payload came from (merge_asof row semantics).
    r_struct = F.struct(
        F.col("__ts").alias("__match_ts"),
        *[F.col(f"__r_{c}").alias(c) for c in right_payload],
    )
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_payload],
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        *on,
        "__ts",
        "__tag",
        *lcols,
        F.last(F.when(F.col("__tag") == 0, r_struct), ignorenulls=True)
        .over(w)
        .alias("__m"),
    )
    out = carried.filter(F.col("__tag") == 1).drop("__tag")
    keep = F.col("__m").isNotNull()
    if tolerance_secs is not None:
        keep = keep & (
            F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__m.__match_ts"))
            <= tolerance_secs * 1_000_000
        )
    out = out.select(
        *on,
        "__ts",
        *lcols,
        *[
            F.when(keep, F.col(f"__m.{c}")).otherwise(F.lit(None)).alias(c)
            for c in right_payload
        ],
    )
    return out.withColumnRenamed("__ts", left_ts)


def events_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract query: each event joined as-of to the user's most
    recent order at the event time. Ties among same-timestamp orders are
    resolved deterministically (max orderkey) before the join so the
    DuckDB ``ASOF JOIN`` oracle is exact."""
    events = read_table(spark, sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = (
        read_table(spark, sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderkey"])
        .groupBy(F.col("o_custkey").alias("user_id"), F.col("o_orderdate"))
        .agg(F.max("o_orderkey").alias("last_order_key"))
    )
    joined = asof_join(
        events,
        orders,
        on=["user_id"],
        left_ts="ts",
        right_ts="o_orderdate",
        right_payload=["last_order_key"],
    )
    return joined.select("event_id", "user_id", "ts", "last_order_key").orderBy(
        "event_id"
    )


def pit_training_set_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(label_day, n_labels, n_with_features,
    n_leaky, sum_feat_events)`` — POINT-IN-TIME training-set assembly
    (the feature-store correctness pattern): each purchase label joins
    the user's daily-activity feature row as of the PREVIOUS day —
    strictly before the label's day, so no feature can contain the
    label's own outcome (leakage). ``n_leaky`` counts violations of the
    strictness invariant and must be 0 by construction. Ordered by
    label_day.

    Mechanics: features = per (user, day) event counts, valid FROM the
    next day (``feature_as_of = day + 1``); the as-of join is the
    engine's union+window carry-forward (one shuffle on user, no range
    join). Determinism: pure integer counts; the carried struct leads
    with the as-of day so "latest" is total-ordered.

    Scale notes: identical cost envelope to ``events_asof_last_order``;
    the feature build is one partial-agged rollup of the same events
    scan.
    """
    ev = read_table(spark, sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    feats = (
        ev.groupBy(
            "user_id", F.date_trunc("day", "ts").alias("day")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("feat_events"))
        .select(
            "user_id",
            (F.col("day") + F.expr("INTERVAL 1 DAY")).alias("as_of"),
            F.col("day").alias("feat_day"),
            "feat_events",
        )
    )
    labels = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("label_ts"), "event_id"
    )
    joined = asof_join(
        labels,
        feats,
        on=["user_id"],
        left_ts="label_ts",
        right_ts="as_of",
        right_payload=["feat_day", "feat_events"],
    )
    label_day = F.date_trunc("day", "label_ts")
    return (
        joined.groupBy(label_day.alias("label_day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_labels"),
            F.sum(F.col("feat_events").isNotNull().cast("long"))
            .cast("long")
            .alias("n_with_features"),
            F.sum(
                F.coalesce(
                    (F.col("feat_day") >= F.date_trunc("day", "label_ts")).cast(
                        "long"
                    ),
                    F.lit(0),
                )
            )
            .cast("long")
            .alias("n_leaky"),
            F.sum(F.coalesce("feat_events", F.lit(0))).cast("long").alias(
                "sum_feat_events"
            ),
        )
        .orderBy("label_day")
    )
