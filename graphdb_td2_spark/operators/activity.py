"""Activity analytics over the event stream: rolling distinct-user
windows and peak-concurrency sweep lines (SURVEY.md §2.I extension —
the ops a usage dashboard derives from the reference's `events` table,
whose timestamps the reference's ETL discards, app/etl.py:161-164).

**Rolling active users** — exact 7-day rolling distinct users per day.
Spark windows cannot express COUNT(DISTINCT) over a RANGE frame, so the
operator uses the *cover-explosion* identity: a user active on day d is
"7-day active" on every day in [d, d+6], so explode each distinct
(day, user) row into its ≤7 covering days and count distinct users per
cover day. One distinct shuffle + a 7×-bounded explode + one
count-distinct shuffle — no range join, no per-day rescan, and the
blowup constant is the window length, independent of corpus size.

**Peak concurrent sessions** — classic interval sweep line: each
session contributes (+1 at start, -1 at end); the running sum is the
number of open sessions, and its daily max is the peak. A global
running sum would serialize onto one partition, so sessions are first
CLIPPED to day boundaries (explode over the ≤2 days a 30-min-gap
session can touch) and the sweep runs per-day — `partitionBy(day)`
keeps every window partition-parallel. Boundary ties order +1 before
-1 (delta DESC), making the daily max well-defined: within a same-sign
tie block the prefix sum is monotone, so the block-edge value — which
is permutation-invariant — is the only max candidate.

Cross-engine determinism: pure integer arithmetic throughout (counts,
+1/-1 sums); timestamps clip with exact microsecond arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..io import read_table
from .windows import SESSION_GAP_MINUTES

ROLLING_DAYS = 7


def rolling_active_users(
    spark: SparkSession, sf_dir: str, window_days: int = ROLLING_DAYS
) -> DataFrame:
    """Registry entry: ``(day, active_1d, active_7d)`` — distinct users
    that day and over the trailing ``window_days`` window, for every day
    in the corpus span (gap days included), ordered by day."""
    events = read_table(spark, sf_dir, "events", ["ts", "user_id"])
    daily = events.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    bounds = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    axis = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    cover = daily.select(
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr(f"INTERVAL {window_days - 1} DAY"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
        "user_id",
    )
    rolling = cover.groupBy("day").agg(
        F.countDistinct("user_id").alias("active_7d")
    )
    one_day = daily.groupBy("day").agg(F.countDistinct("user_id").alias("active_1d"))
    return (
        axis.join(one_day, "day", "left")
        .join(rolling, "day", "left")
        .select(
            "day",
            F.coalesce("active_1d", F.lit(0)).cast("long").alias("active_1d"),
            F.coalesce("active_7d", F.lit(0)).cast("long").alias("active_7d"),
        )
        .orderBy("day")
    )


def _session_intervals(
    spark: SparkSession, sf_dir: str, gap_minutes: int
) -> DataFrame:
    """(user_id, session start ts, session end ts) via the engine's
    standard lag/flag-sum sessionization (operators/windows.py)."""
    events = read_table(spark, sf_dir, "events", ["user_id", "ts", "event_id"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    gap = micros - F.lag(micros).over(w)
    with_sessions = events.withColumn(
        "new_session",
        F.when(
            gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn("session_id", F.sum("new_session").over(w))
    return with_sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )


def concurrent_sessions(
    spark: SparkSession, sf_dir: str, gap_minutes: int = SESSION_GAP_MINUTES
) -> DataFrame:
    """Registry entry: ``(day, n_sessions, peak_concurrent)`` — sessions
    open during each day (clipped at midnight) and the day's sweep-line
    peak of simultaneously-open sessions, ordered by day."""
    sessions = _session_intervals(spark, sf_dir, gap_minutes)
    clipped = sessions.select(
        F.explode(
            F.sequence(
                F.date_trunc("day", "s"),
                F.date_trunc("day", "e"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
        "s",
        "e",
    ).select(
        "day",
        F.greatest(F.col("s"), F.col("day")).alias("cs"),
        F.least(
            F.col("e"),
            F.col("day") + F.expr("INTERVAL 1 DAY") - F.expr("INTERVAL 1 MICROSECOND"),
        ).alias("ce"),
    )
    points = clipped.select(
        "day", F.col("cs").alias("t"), F.lit(1).alias("delta")
    ).unionByName(
        clipped.select("day", F.col("ce").alias("t"), F.lit(-1).alias("delta"))
    )
    sweep = Window.partitionBy("day").orderBy(
        F.asc("t"), F.desc("delta")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        points.withColumn("open", F.sum("delta").over(sweep))
        .groupBy("day")
        .agg(
            (F.count(F.lit(1)) / 2).cast("long").alias("n_sessions"),
            F.max("open").cast("long").alias("peak_concurrent"),
        )
        .orderBy("day")
    )


def user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(streak_days, n_users)`` — histogram of each
    user's LONGEST run of consecutive active days, via the gaps-and-
    islands identity: within a user's distinct active days ordered by
    day, ``day − row_number·1day`` is constant exactly along a
    consecutive run, so grouping on that anchor yields the islands.
    Ordered by streak_days descending.

    Scale notes: distinct-day dedup and the row_number window share one
    shuffle on user_id (per-user day counts are time-range-bounded);
    the island/max/histogram rollups are partial-aggregated. All
    integer arithmetic.
    """
    events = read_table(spark, sf_dir, "events", ["ts", "user_id"])
    daily = events.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    islands = daily.select(
        "user_id",
        F.expr("day - make_interval(0, 0, 0, row_number() OVER "
               "(PARTITION BY user_id ORDER BY day))").alias("anchor"),
    )
    streaks = islands.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).cast("long").alias("len")
    )
    longest = streaks.groupBy("user_id").agg(F.max("len").alias("streak_days"))
    return (
        longest.groupBy("streak_days")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy(F.desc("streak_days"))
    )


def user_event_bitmaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(bitmap, n_users, example_types)`` — users
    grouped by WHICH event types they have ever performed, encoded as a
    bitmask over the alphabetical event-type index (``bit_or`` of
    ``1 << idx``): the compact behavioral-segment representation a
    feature store keeps instead of |types| boolean columns. Ordered by
    bitmap.

    Determinism: the type→bit assignment is the alphabetical
    row_number over the distinct types (a |types|-row window);
    ``bit_or`` is associative/commutative so the per-user mask is
    partition-order-free. ``example_types`` decodes the mask back via
    sorted array_agg of the member types — pure integers + sorted
    strings. Scale: one broadcast of the tiny type-index dim, one
    partial-agged bit_or per user, one |2^types|-bounded rollup.
    """
    ev = read_table(spark, sf_dir, "events", ["user_id", "event_type"])
    idx = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            (
                F.row_number().over(Window.orderBy("event_type")) - 1
            ).alias("idx"),
        )
    )
    tagged = ev.join(F.broadcast(idx), "event_type").select(
        "user_id", F.expr("shiftleft(CAST(1 AS BIGINT), idx)").alias("bit")
    )
    masks = tagged.groupBy("user_id").agg(
        F.expr("bit_or(bit)").cast("long").alias("bitmap")
    )
    decode = (
        masks.groupBy("bitmap")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .join(
            F.broadcast(idx),
            F.expr("shiftright(bitmap, idx) % 2 = 1"),
        )
        .groupBy("bitmap", "n_users")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("event_type"))).alias(
                "example_types"
            )
        )
    )
    return decode.orderBy("bitmap")
