"""Session-depth conversion profile — do longer sessions convert more?
The product-analytics rollup joining the engine's sessionization
(``operators/windows.py:sessionize`` — same gap rule, same canonical
(ts, event_id) order) with conversion outcome, bucketed by session
depth.

Exactness: session assignment is the integer gap rule; depth buckets
are integer breakpoints; the conversion rate is the single IEEE
division of two exact longs.

Scale notes: one window shuffle on user_id (shared with the whole
window family), one (user, session) hash aggregate, then a 4-row depth
rollup — the corpus-sized state is the per-session frame, which a
production pipeline materializes once per day anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..io import read_table
from .windows import SESSION_GAP_MINUTES

DEPTH_BREAKS = (1, 3, 7)  # events per session: 1 / 2-3 / 4-7 / 8+
CONVERSION = "purchase"


def session_conversion_stats(
    spark: SparkSession, sf_dir: str, gap_minutes: int = SESSION_GAP_MINUTES
) -> DataFrame:
    """Registry entry: ``(depth_bucket, n_sessions, n_converting,
    conversion_rate)`` per session-depth bucket, ordered by bucket."""
    events = read_table(
        spark, sf_dir, "events", ["user_id", "ts", "event_id", "event_type"]
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    gap = micros - F.lag(micros).over(w)
    with_sessions = events.withColumn(
        "new_session",
        F.when(
            gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn("session_id", F.sum("new_session").over(w))
    per_session = with_sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max((F.col("event_type") == CONVERSION).cast("long")).alias("converted"),
    )
    bucket = F.lit(len(DEPTH_BREAKS)).cast("long")
    for i, b in sorted(enumerate(DEPTH_BREAKS), reverse=True):
        bucket = F.when(F.col("n_events") <= b, F.lit(i).cast("long")).otherwise(
            bucket
        )
    return (
        per_session.groupBy(bucket.alias("depth_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("converted").cast("long").alias("n_converting"),
        )
        .withColumn(
            "conversion_rate",
            F.col("n_converting").cast("double") / F.col("n_sessions").cast("double"),
        )
        .orderBy("depth_bucket")
    )


def channel_bounce_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(channel, n_sessions, n_bounces, bounce_rate)``
    — single-event-session (bounce) share per session ENTRY channel
    (the session's first event type) — the engagement diagnostic next
    to the depth-bucketed conversion profile. Ordered by channel.

    Determinism: sessionize's integer gap rule; the entry channel is
    the first event under the total (ts, event_id) order; one division.
    Scale: the same single user_id window shuffle as the session
    family, then a (user, session) rollup and a |channel|-bounded agg.
    """
    from pyspark.sql import Window

    events = read_table(
        spark, sf_dir, "events", ["user_id", "ts", "event_id", "event_type"]
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    gap = micros - F.lag(micros).over(w)
    sessions = (
        events.withColumn(
            "new_session",
            F.when(
                gap.isNull() | (gap > SESSION_GAP_MINUTES * 60 * 1_000_000),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("session_id", F.sum("new_session").over(w))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min_by(
                F.col("event_type"), F.struct(F.col("ts"), F.col("event_id"))
            ).alias("channel"),
        )
    )
    return (
        sessions.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum((F.col("n_events") == 1).cast("long")).cast("long").alias("n_bounces"),
        )
        .select(
            "channel",
            "n_sessions",
            "n_bounces",
            (
                F.col("n_bounces").cast("double") / F.col("n_sessions").cast("double")
            ).alias("bounce_rate"),
        )
        .orderBy("channel")
    )


FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_WINDOW_HOURS = 24


def conversion_funnel_steps(
    spark: SparkSession,
    sf_dir: str,
    steps: tuple[str, ...] = FUNNEL_STEPS,
    window_hours: int = FUNNEL_WINDOW_HOURS,
) -> DataFrame:
    """Registry entry: ``(step, step_type, n_users, share_of_start)`` —
    the windowed conversion funnel: per user, step k is reached when the
    EARLIEST qualifying step-k event occurs at-or-after the user's
    step-(k−1) time and within ``window_hours`` of the user's funnel
    start (the earliest step-1 event). Ordered by step.

    Semantics note (documented, deterministic): the funnel anchors at
    each user's EARLIEST step-1 event — the greedy-from-first-touch
    definition. A user whose first view never converts but whose later
    view does is counted by the start that actually anchors analytics
    dashboards ("of users who first saw X, how many bought within a
    day"). All step times are exact microsecond minima, so the whole
    funnel is integer comparisons until the one share division.

    Scale notes: k sequential (filter → user-keyed min) aggregates, each
    partial-agged and joined user-keyed to the previous step's 2-column
    frame — no window function, no per-event chain search, state is
    |users reaching step| rows per step.
    """
    ev = read_table(spark, sf_dir, "events", ["user_id", "ts", "event_type"])
    us = ev.select("user_id", F.unix_micros("ts").alias("us"), "event_type")
    win = window_hours * 3600 * 1_000_000
    reached = []  # per step: DataFrame (user_id, t_k)
    for i, step in enumerate(steps):
        cand = us.filter(F.col("event_type") == step)
        if i == 0:
            cur = cand.groupBy("user_id").agg(F.min("us").alias("t"))
            start = cur.select("user_id", F.col("t").alias("t0"))
        else:
            cur = (
                cand.join(reached[-1].select("user_id", "t"), "user_id")
                .join(start, "user_id")
                .filter(
                    (F.col("us") >= F.col("t"))
                    & (F.col("us") <= F.col("t0") + F.lit(win))
                )
                .groupBy("user_id")
                .agg(F.min("us").alias("t"))
            )
        reached.append(cur)
    counts = [
        r.agg(F.count(F.lit(1)).cast("long").alias(f"n{i}"))
        for i, r in enumerate(reached)
    ]
    wide = counts[0]
    for c in counts[1:]:
        wide = wide.crossJoin(F.broadcast(c))
    rows = [
        wide.select(
            F.lit(i + 1).cast("long").alias("step"),
            F.lit(step).alias("step_type"),
            F.col(f"n{i}").alias("n_users"),
            # no step-1 events at all → share is 0 by convention, not 0/0
            # (NaN vs engine-dependent — ADVICE r7); mirrored in the oracle
            F.when(F.col("n0") == 0, F.lit(0.0))
            .otherwise(
                F.col(f"n{i}").cast("double") / F.col("n0").cast("double")
            )
            .alias("share_of_start"),
        )
        for i, step in enumerate(steps)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("step")
