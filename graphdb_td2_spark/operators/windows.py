"""Window-function operators over the ``events`` stream table
(SURVEY.md §2.I [extension]).

The reference discards ``events.ts`` at extraction (``app/etl.py:161-164``);
the rebuild restores it and exposes the per-user ordered analyses the data
naturally supports: sessionization (lag + cumulative flag sum), per-group
top-k (row_number), running totals.

Determinism: every window carries a total order (``ts`` then ``event_id`` —
event_id is unique), so frames are identical across engines. Running sums of
doubles accumulate left-to-right in both Spark and DuckDB; values carry ≤2
decimals, and the cumulative-sum query still casts to exact decimal to be
safe against engine-specific accumulation tricks.

Scale notes: one shuffle partitioned by ``user_id`` serves every window;
whole-stage codegen covers the lag/row_number/sum frames. Hot users are
bounded (per-user event counts), so no salting is needed; if a pathological
key appeared, AQE skew handling applies to the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..io import read_table

SESSION_GAP_MINUTES = 30


def sessionize(spark: SparkSession, sf_dir: str, gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """Sessionization: a new session starts when the gap to the previous
    event of the same user exceeds ``gap_minutes``. Returns per-user session
    stats (all integer arithmetic → engine-exact)."""
    events = read_table(spark, sf_dir, "events", ["user_id", "ts", "event_id"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    gap = micros - F.lag(micros).over(w)
    with_sessions = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)).otherwise(
            F.lit(0)
        ),
    ).withColumn("session_id", F.sum("new_session").over(w))
    return (
        with_sessions.groupBy("user_id")
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumn(
            "avg_events_per_session",
            F.col("n_events").cast("double") / F.col("n_sessions"),
        )
        .orderBy("user_id")
    )


def top_events_per_user(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Per-group top-k via row_number over (value DESC, event_id ASC) —
    the windowed generalization of F1's top-k."""
    events = read_table(spark, sf_dir, "events", ["user_id", "event_id", "event_type", "value"])
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("user_id", "rn", "event_id", "event_type", "value")
        .orderBy("user_id", "rn")
    )


def user_running_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user total of ``value`` in event-time order (cumulative
    frame), computed on exact decimals and emitted as double."""
    events = read_table(spark, sf_dir, "events", ["user_id", "event_id", "ts", "value"])
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.withColumn(
            "running_value",
            F.sum(F.col("value").cast("decimal(12,2)")).over(w).cast("double"),
        )
        .select("user_id", "event_id", "value", "running_value")
        .orderBy("user_id", "event_id")
    )


def user_event_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event timing: lag/lead navigation over the event-time
    order — seconds since the user's previous event and until the next one
    (integer microsecond arithmetic → engine-exact)."""
    events = read_table(spark, sf_dir, "events", ["user_id", "ts", "event_id"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    return (
        events.select(
            "user_id",
            "event_id",
            ((micros - F.lag(micros).over(w)) / F.lit(1_000_000)).alias(
                "secs_since_prev"
            ),
            ((F.lead(micros).over(w) - micros) / F.lit(1_000_000)).alias(
                "secs_until_next"
            ),
            F.ntile(4).over(w).cast("long").alias("time_quartile"),
        )
        .orderBy("user_id", "event_id")
    )


def event_value_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family over one window (per-type events
    ordered by value): rank / dense_rank / percent_rank / cume_dist.
    percent_rank ((rank−1)/(n−1)) and cume_dist (peers/n) are single exact
    integer divisions — engine-portable. Top-3 by rank per type keeps the
    output bounded at any corpus scale."""
    events = read_table(spark, sf_dir, "events", ["event_id", "event_type", "value"])
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        events.select(
            "event_type",
            "event_id",
            "value",
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("dense_rnk"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
        .filter(F.col("rnk") <= 3)
        .orderBy("event_type", "rnk", "event_id")
    )


def event_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(event_type, decile, n_events, min_value,
    max_value)`` — ``ntile(10)`` equal-frequency binning of values per
    event type (the quantile-transform the feature pipeline applies
    before training), ordered by (event_type, decile).

    Determinism: the ntile order is total (value, event_id), and ntile's
    floor/ceil bucket-size rule is the SQL-standard one both engines
    implement. Scale: one shuffle on event_type for the window; min/max
    per bucket fold into one hash agg."""
    events = read_table(spark, sf_dir, "events", ["event_id", "event_type", "value"])
    w = Window.partitionBy("event_type").orderBy(F.asc("value"), F.asc("event_id"))
    return (
        events.select(
            "event_type", "value", F.ntile(10).over(w).cast("int").alias("decile")
        )
        .groupBy("event_type", "decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("event_type", "decile")
    )


TRAILING_WINDOW_SECS = 3600


def user_trailing_value(
    spark: SparkSession, sf_dir: str, window_secs: int = TRAILING_WINDOW_SECS
) -> DataFrame:
    """Time-RANGE window frame: per event, the trailing 1-hour sum and
    count of the same user's activity — the 'recent activity' feature a
    real-time scorer computes. Distinct from the ROWS frames elsewhere:
    the frame is bounded by a time interval (``rangeBetween`` over epoch
    micros), so simultaneous events are frame peers regardless of row
    order and the result is total-order-free deterministic.

    Scale: the same single user_id-partitioned shuffle as every window
    here; the range frame is a sliding two-pointer over the sorted
    partition (O(n) per user)."""
    events = read_table(spark, sf_dir, "events", ["user_id", "ts", "event_id", "value"])
    micros = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(micros)
        .rangeBetween(-window_secs * 1_000_000, 0)
    )
    return (
        events.select(
            "user_id",
            "event_id",
            F.sum(F.col("value").cast("decimal(12,2)"))
            .over(w)
            .cast("double")
            .alias("trailing_value"),
            F.count(F.lit(1)).over(w).cast("long").alias("n_trailing"),
        )
        .orderBy("user_id", "event_id")
    )


def customer_order_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2-shaped validity intervals: each customer's order stream turned
    into half-open [valid_from, valid_to) rows via ``lead`` — the
    dimension-history build every warehouse runs (the current row gets a
    NULL valid_to). A point-in-time lookup then joins
    ``valid_from <= ts < valid_to`` instead of an as-of window.

    Determinism: same-date orders are ordered by orderkey, so intervals
    (possibly empty, from == to) are identical cross-engine. One
    user-partitioned shuffle; codegen window."""
    orders = read_table(
        spark, sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate"]
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("valid_from"),
            F.lead("o_orderdate").over(w).alias("valid_to"),
            F.row_number().over(w).cast("long").alias("version"),
        )
        .orderBy("custkey", "version")
    )


FUNNEL_STAGES = ("view", "click", "purchase")


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern (funnel) analysis: how many users progress
    view → click → purchase in strict timestamp order — each stage's
    anchor is the EARLIEST qualifying event after the previous stage's
    anchor (the standard product-analytics funnel; no lookback).

    Implementation is three chained conditional aggregations (one hash
    agg per stage over the user-partitioned events — no self-joins): the
    stage anchor t_{k} = min(ts | type=stage_k, ts > t_{k-1}) per user.
    Ties inside a user's stream resolve by the strict '>' itself:
    same-timestamp events cannot advance the funnel, identically in both
    engines. Output: one row per stage with the user count reaching it.
    """
    events = read_table(spark, sf_dir, "events", ["user_id", "event_type", "ts"])
    t1 = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == FUNNEL_STAGES[0], F.col("ts"))).alias("t1")
    )
    t2 = (
        events.join(t1, "user_id")
        .groupBy("user_id")
        .agg(
            F.first("t1").alias("t1"),
            F.min(
                F.when(
                    (F.col("event_type") == FUNNEL_STAGES[1])
                    & (F.col("ts") > F.col("t1")),
                    F.col("ts"),
                )
            ).alias("t2"),
        )
    )
    t3 = (
        events.join(t2, "user_id")
        .groupBy("user_id")
        .agg(
            F.first("t1").alias("t1"),
            F.first("t2").alias("t2"),
            F.min(
                F.when(
                    (F.col("event_type") == FUNNEL_STAGES[2])
                    & (F.col("ts") > F.col("t2")),
                    F.col("ts"),
                )
            ).alias("t3"),
        )
    )
    return t3.agg(
        F.count(F.when(F.col("t1").isNotNull(), 1)).alias("n_view"),
        F.count(F.when(F.col("t2").isNotNull(), 1)).alias("n_view_click"),
        F.count(F.when(F.col("t3").isNotNull(), 1)).alias("n_view_click_purchase"),
    )


def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, counted in
    each subsequent week they were active — the (cohort_week,
    week_offset, n_users) long-form of the classic retention triangle.

    Determinism: weeks are UTC Monday-truncated in both engines, and the
    offset is an exact integer division of epoch-second deltas (truncated
    timestamps differ by multiples of 7 days under UTC — no DST shifts).
    Two hash aggregations + a user-keyed join; the cohort dimension is
    weeks — dimension-sized at any corpus scale."""
    events = read_table(spark, sf_dir, "events", ["user_id", "ts"])
    # DATE-typed weeks (DuckDB's date_trunc('week') is DATE-typed; Spark's
    # is timestamp — normalize so the typed value-hash agrees)
    weekly = events.select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("week")
    ).distinct()
    cohorts = weekly.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        weekly.join(cohorts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.expr("datediff(week, cohort_week) div 7").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def channel_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(channel, week_offset, n_users, retention)`` —
    retention by ACQUISITION CHANNEL: users cohorted by the event type
    of their very first event (the "how did they arrive" dimension),
    counted in each subsequent active week, with retention as the share
    of the channel's week-0 cohort. Ordered by (channel, week_offset).

    Determinism: the first event is the ``min_by`` over the total
    (ts, event_id) order; weeks/offsets follow
    ``weekly_cohort_retention``'s UTC-Monday integer arithmetic;
    retention is one integer/integer IEEE division. Scale: two
    user-keyed hash aggs + one user join — the same envelope as the
    week-cohort rollup, output |channel|·weeks-bounded.
    """
    events = read_table(spark, sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    first = events.groupBy("user_id").agg(
        F.min_by(
            F.col("event_type"), F.struct(F.col("ts"), F.col("event_id"))
        ).alias("channel"),
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week"),
    )
    weekly = events.select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("week")
    ).distinct()
    offsets = (
        weekly.join(first, "user_id")
        .select(
            "channel",
            F.expr("datediff(week, cohort_week) div 7").alias("week_offset"),
            "user_id",
        )
        .groupBy("channel", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    base = offsets.filter(F.col("week_offset") == 0).select(
        "channel", F.col("n_users").alias("n_base")
    )
    return (
        offsets.join(F.broadcast(base), "channel")
        .select(
            "channel",
            "week_offset",
            "n_users",
            (
                F.col("n_users").cast("double") / F.col("n_base").cast("double")
            ).alias("retention"),
        )
        .orderBy("channel", "week_offset")
    )


def cohort_ltv_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(cohort_month, month_offset, n_active_customers,
    revenue_cents, cum_revenue_cents, ltv_per_customer_cents)`` — the
    customer-lifetime-value triangle [extension]: customers cohorted by
    first-order month, each cohort's order revenue tracked by month
    offset with the running total and the per-customer LTV every
    subscription/commerce dashboard plots.

    The money companion of ``weekly_cohort_retention``: retention says
    WHO comes back, this says what their return is WORTH — the number a
    training-data budget for a recommender is justified against.

    Determinism: months are UTC-truncated DATEs in both engines; the
    offset is exact integer month arithmetic ((Δyear)·12 + Δmonth, no
    months_between float); revenue flows through exact DECIMAL cents;
    per-customer LTV is a truncating integer division by the cohort-0
    size. The cumulative window partitions by cohort and orders over the
    bounded month axis (≤ corpus months — the calendar-axis dispensation,
    never corpus-sized).

    Scale notes: one customer-grain min-aggregate, one broadcast-able
    cohort join (customer-dimension-sized), one (cohort, offset) hash
    agg; output is months²/2-bounded.
    """
    orders = read_table(
        spark, sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"]
    )
    month = F.to_date(F.date_trunc("month", F.col("o_orderdate")))
    cents = F.expr("cast(cast(o_totalprice as decimal(14,2)) * 100 as bigint)")
    per_order = orders.select(
        F.col("o_custkey").alias("customer_id"),
        month.alias("month"),
        cents.alias("cents"),
    )
    cohorts = per_order.groupBy("customer_id").agg(
        F.min("month").alias("cohort_month")
    )
    sizes = cohorts.groupBy("cohort_month").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    offs = (
        per_order.join(cohorts, "customer_id")
        .withColumn(
            "month_offset",
            F.expr(
                "cast((year(month) - year(cohort_month)) * 12"
                " + (month(month) - month(cohort_month)) as bigint)"
            ),
        )
    )
    cell = offs.groupBy("cohort_month", "month_offset").agg(
        F.count_distinct("customer_id").cast("long").alias("n_active_customers"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )
    w = (
        Window.partitionBy("cohort_month")
        .orderBy("month_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cell.withColumn(
            "cum_revenue_cents", F.sum("revenue_cents").over(w).cast("long")
        )
        .join(sizes, "cohort_month")
        .select(
            "cohort_month",
            "month_offset",
            "n_active_customers",
            "revenue_cents",
            "cum_revenue_cents",
            F.expr("cum_revenue_cents div cohort_size").alias(
                "ltv_per_customer_cents"
            ),
        )
        .orderBy("cohort_month", "month_offset")
    )


CENSOR_MONTHS = 3


def churn_hazard_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(tenure_month, n_at_risk, n_churned, hazard)``
    — discrete-time churn hazard [extension], the survival-analysis
    member of the lifecycle family (``segment_churn_rates`` gives the
    point-in-time split; this gives the WHEN): among customers who
    reached tenure month t, the share whose LAST order fell in t.

    Censoring: a customer whose last order lands within CENSOR_MONTHS of
    the corpus end is censored (we cannot know they churned — the corpus
    simply ends); censored customers count in ``n_at_risk`` for the
    months they are observed but never in ``n_churned``, the standard
    right-censoring rule.

    Exactness: tenure is exact integer month arithmetic (the
    ``cohort_ltv_curves`` construction); n_at_risk(t) = customers with
    observed tenure ≥ t is a suffix sum over the bounded month axis;
    hazard is one IEEE division. Scale: one customer-grain min/max agg,
    one months-bounded rollup + suffix window.
    """
    orders = read_table(spark, sf_dir, "orders", ["o_custkey", "o_orderdate"])
    month = F.to_date(F.date_trunc("month", F.col("o_orderdate")))
    per_cust = orders.select(
        F.col("o_custkey").alias("customer_id"), month.alias("m")
    ).groupBy("customer_id").agg(
        F.min("m").alias("first_m"), F.max("m").alias("last_m")
    )
    end_row = orders.agg(F.max(month).alias("end_m")).first()
    end_m = end_row["end_m"]
    if end_m is None:  # degenerate empty-orders input: empty result, not
        # a date'None' AnalysisException (shingle_novelty_curve pattern)
        return spark.createDataFrame(
            [],
            "tenure_month bigint, n_at_risk bigint, n_churned bigint,"
            " hazard double",
        )
    mdiff = (
        "cast((year({a}) - year({b})) * 12 + (month({a}) - month({b})) as bigint)"
    )
    per_cust = per_cust.select(
        "customer_id",
        F.expr(mdiff.format(a="last_m", b="first_m")).alias("tenure_month"),
        (
            F.expr(mdiff.format(a=f"date'{end_m}'", b="last_m"))
            < F.lit(CENSOR_MONTHS)
        ).alias("censored"),
    )
    cell = per_cust.groupBy("tenure_month").agg(
        F.count(F.lit(1)).cast("long").alias("n_ending"),
        F.sum(F.when(~F.col("censored"), 1).otherwise(0))
        .cast("long")
        .alias("n_churned"),
    )
    # suffix sum over the bounded month axis (calendar-axis dispensation)
    w = Window.orderBy(F.desc("tenure_month")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        cell.withColumn("n_at_risk", F.sum("n_ending").over(w).cast("long"))
        .select(
            "tenure_month",
            "n_at_risk",
            "n_churned",
            (
                F.col("n_churned").cast("double") / F.col("n_at_risk").cast("double")
            ).alias("hazard"),
        )
        .orderBy("tenure_month")
    )
