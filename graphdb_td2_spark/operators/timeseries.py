"""Hypertable-style time-series rollup with gap filling [extension].

A continuous-aggregate / ``time_bucket_gapfill`` pattern: bucket events
into fixed intervals, then densify against the full bucket axis so empty
buckets appear explicitly (count 0, null sum) — the shape a downstream
dashboard or forecasting job expects.

Shape: the bucket axis is generated from the corpus time bounds with
``sequence``/``explode`` (a few thousand rows per year at hourly grain —
driver-side-free, broadcast-sized at any corpus scale, since the axis
grows with the TIME RANGE, not the row count), cross-joined with the
observed dimension values, then left-joined to the rolled-up facts.
The rollup itself is one partial-aggregated hash agg over the fact scan.
Money sums go through DECIMAL(12,2) (cross-engine exact; see
``operators/relational.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..io import read_table


def gapfill_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    dim_col: str = "event_type",
    value_col: str = "value",
    grain: str = "hour",
    step: str = "INTERVAL 1 HOUR",
) -> DataFrame:
    """Dense (bucket × dim) rollup of ``events``: every bucket in
    [min, max] appears for every observed dim value; gaps carry
    ``n_events = 0`` and a null sum."""
    bucket = F.date_trunc(grain, F.col(ts_col))
    roll = (
        events.select(
            bucket.alias("bucket_start"),
            F.col(dim_col).alias("dim"),
            F.col(value_col).cast("decimal(12,2)").alias("v"),
        )
        .groupBy("bucket_start", "dim")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("v").alias("sum_v"))
    )
    axis = (
        events.agg(
            F.date_trunc(grain, F.min(ts_col)).alias("lo"),
            F.date_trunc(grain, F.max(ts_col)).alias("hi"),
        )
        .select(
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr(step))
            ).alias("bucket_start")
        )
    )
    dims = events.select(F.col(dim_col).alias("dim")).distinct()
    return (
        axis.crossJoin(dims)
        .join(roll, ["bucket_start", "dim"], "left")
        .select(
            "bucket_start",
            F.col("dim").alias(dim_col),
            F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
            F.col("sum_v").cast("double").alias("sum_value"),
        )
        .orderBy("bucket_start", dim_col)
    )


def hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry: gap-filled hourly rollup of ``events`` per
    event type."""
    events = read_table(spark, sf_dir, "events", ["ts", "event_type", "value"])
    return gapfill_rollup(events)


def interpolated_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(day, n_events, value_cents, interpolated)`` —
    daily sum of ``events.value`` on a dense day axis, with gap days
    LINEARLY INTERPOLATED between their observed neighbors (the
    ``time_bucket_gapfill(..., interpolate(...))`` pattern), ordered by
    day.

    Determinism: daily sums go through exact DECIMAL cents (≤2-dp
    corpus values), and the interpolation is pure integer arithmetic —
    ``prev + trunc((next-prev)·k / gap)`` with the division done in
    IEEE double on ≤2⁵³ integers (exact) and truncated identically in
    both engines (Spark's integer ``div`` truncates while DuckDB's
    ``//`` floors, so neither is used on signed values).

    Scale notes: one hash agg to daily grain (axis-bounded output),
    then two windows over the GLOBAL day ordering — safe precisely
    because the day axis grows with the time range, not the corpus row
    count (a century is ~37k rows); the heavy lifting stays in the
    partial-aggregated daily rollup.
    """
    events = read_table(spark, sf_dir, "events", ["ts", "value"])
    daily = (
        events.select(
            F.date_trunc("day", "ts").alias("day"),
            F.col("value").cast("decimal(14,2)").alias("v"),
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            (F.sum("v") * 100).cast("long").alias("cents"),
        )
    )
    axis = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi")).select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    dense = axis.join(daily, "day", "left")
    from pyspark.sql import Window

    w_prev = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    w_next = Window.orderBy("day").rowsBetween(0, Window.unboundedFollowing)
    filled = dense.select(
        "day",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        "cents",
        F.last("cents", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(F.when(F.col("cents").isNotNull(), F.col("day")), ignorenulls=True)
        .over(w_prev)
        .alias("pd"),
        F.first("cents", ignorenulls=True).over(w_next).alias("nv"),
        F.first(F.when(F.col("cents").isNotNull(), F.col("day")), ignorenulls=True)
        .over(w_next)
        .alias("nd"),
    )
    # Spark's double→BIGINT cast truncates toward zero (ANSI off); the
    # oracle spells the same thing as TRUNC()+CAST in DuckDB, whose bare
    # CAST would round instead.
    interp = F.col("pv") + F.expr(
        "CAST(CAST((nv - pv) * datediff(day, pd) AS DOUBLE)"
        " / datediff(nd, pd) AS BIGINT)"
    )
    return filled.select(
        "day",
        "n_events",
        F.coalesce("cents", interp).cast("long").alias("value_cents"),
        F.col("cents").isNull().alias("interpolated"),
    ).orderBy("day")


def value_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(event_type, n_events, slope_cpd, intercept_c)``
    — per-type ordinary-least-squares fit of event value (cents) against
    time (days since the corpus start): the trend line a monitoring
    dashboard draws, ordered by event_type.

    Determinism: the five OLS sufficient statistics (n, Σx, Σy, Σxy,
    Σx²) are exact integers (x = day offset from the global min day,
    y = exact cents), and slope/intercept are each ONE IEEE division of
    integer-valued closed-form numerators —
    ``slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²)`` and
    ``intercept = (ΣyΣx² − ΣxΣxy)/(nΣx² − (Σx)²)`` — no iterative
    solver, no float accumulation. Anchoring x at the corpus min keeps
    every product inside int64 for century-scale spans.

    Scale notes: one broadcast of the 1-row min-day scalar, one
    map-side-partial hash agg per type, constant-size output.
    """
    events = read_table(spark, sf_dir, "events", ["ts", "event_type", "value"])
    lo = events.agg(F.date_trunc("day", F.min("ts")).alias("lo"))
    xy = events.crossJoin(F.broadcast(lo)).select(
        "event_type",
        F.datediff(F.col("ts"), F.col("lo")).cast("long").alias("x"),
        (F.col("value").cast("decimal(14,2)") * 100).cast("long").alias("y"),
    )
    stats = xy.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    det = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return stats.select(
        "event_type",
        F.col("n").alias("n_events"),
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / det.cast("double")
        ).alias("slope_cpd"),
        (
            (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")).cast("double")
            / det.cast("double")
        ).alias("intercept_c"),
    ).orderBy("event_type")


def running_revenue_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(day, cents, running_cents)`` — lifetime running
    revenue per order day, computed with the TWO-PHASE distributed
    prefix sum instead of a global window: within-month running sums use
    a window PARTITIONED by month (parallel), and each month adds the
    broadcast cumulative total of all prior months. Only the
    |months|-row offset table ever crosses a global order — a
    single-partition window over the full fact table (what the naive
    ``Window.orderBy(day)`` compiles to) never exists in the plan.

    This is the canonical fix for Spark's "No Partition Defined for
    Window operation" hazard, applied to a corpus-sized running total;
    the bounded-axis day-spine operators above don't need it, a 100 TB
    fact table does. Exact cents throughout; ordered by day.

    (tests/test_gram_interp.py pins bit-equality against the naive
    global-window formulation.)
    """
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    daily = (
        orders.select(
            F.date_trunc("day", "o_orderdate").alias("day"),
            F.col("o_totalprice").cast("decimal(14,2)").alias("p"),
        )
        .groupBy("day")
        .agg((F.sum("p") * 100).cast("long").alias("cents"))
    )
    month = F.date_trunc("month", F.col("day"))
    w_in = (
        Window.partitionBy("month")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = daily.withColumn("month", month).withColumn(
        "within", F.sum("cents").over(w_in).cast("long")
    )
    month_totals = (
        daily.groupBy(month.alias("month"))
        .agg(F.sum("cents").cast("long").alias("m_total"))
    )
    w_prior = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, -1)
    offsets = month_totals.select(
        "month",
        F.coalesce(F.sum("m_total").over(w_prior), F.lit(0))
        .cast("long")
        .alias("offset"),
    )
    return (
        within.join(F.broadcast(offsets), "month")
        .select(
            "day",
            "cents",
            (F.col("within") + F.col("offset")).cast("long").alias("running_cents"),
        )
        .orderBy("day")
    )


EWMA_LAGS = 8  # kernel length; weights 2^(EWMA_LAGS-1) ... 2^0


def smoothed_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(day, cents, smoothed_cents)`` — the daily order
    revenue series convolved with a truncated exponential kernel
    (weights 2⁷…2⁰ over the trailing 8 days, integer DIV by the weight
    mass actually present) — the EWMA control-chart line computed as a
    FIXED FIR filter, so it is windowed (parallel, replayable) instead
    of recursive (sequential, state-carrying). Ordered by day.

    Determinism: pure integer arithmetic — power-of-two weights, one
    flooring division per row (operands non-negative, so Spark's DIV
    and DuckDB's // agree); partial windows at the series head use
    exactly the weights present (no padding bias). Scale: dense
    day-axis lags after one partial-agged rollup.
    """
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    daily = (
        orders.select(
            F.date_trunc("day", "o_orderdate").alias("day"),
            F.col("o_totalprice").cast("decimal(14,2)").alias("p"),
        )
        .groupBy("day")
        .agg((F.sum("p") * 100).cast("long").alias("cents"))
    )
    axis = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi")).select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    dense = axis.join(daily, "day", "left").select(
        "day", F.coalesce("cents", F.lit(0)).cast("long").alias("cents")
    )
    ow = Window.orderBy("day")
    num = F.lit(0).cast("long")
    den = F.lit(0).cast("long")
    for j in range(EWMA_LAGS):
        weight = 1 << (EWMA_LAGS - 1 - j)
        c = F.lag("cents", j).over(ow)
        num = num + F.coalesce(c, F.lit(0)) * F.lit(weight)
        den = den + F.when(c.isNotNull(), F.lit(weight)).otherwise(F.lit(0))
    return (
        dense.withColumn("num_", num.cast("long"))
        .withColumn("den_", den.cast("long"))
        .select(
            "day",
            "cents",
            F.expr("CAST(num_ DIV den_ AS BIGINT)").alias("smoothed_cents"),
        )
        .orderBy("day")
    )


def daily_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(day, n_events, p10, p50, p90)`` — per-day
    percentile envelope of event values (the anomaly-band chart the
    daily dashboards draw around the median). Ordered by day.

    Exact-interpolation percentiles, computed WITHOUT the engine's
    percentile aggregate: Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` interpolate through different IEEE expression
    trees, which diverges in the last ulp once a day group's size hits
    the wrong fraction (a volume-dependent hash mismatch first seen at
    sf0.1). Instead the 2-decimal values go through exact cents into a
    per-(day, cents) histogram; the bounding ranks are integer
    arithmetic (pos = p·(n−1) as floor + exact rational fraction), the
    straddling cent values come from a day-partitioned cumulative count
    (no single-partition window), and the one float expression
    ``(lo + (hi−lo)·f)/100`` is evaluated identically on both engines.
    The histogram also removes any per-day memory blowup: state is
    |distinct cents| per day, not |events|."""
    from pyspark.sql import Window

    events = read_table(spark, sf_dir, "events", ["ts", "value"])
    per_vc = (
        events.select(
            F.date_trunc("day", "ts").alias("day"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .groupBy("day", "cents")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = (
        Window.partitionBy("day")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = per_vc.select(
        "day", "cents", F.sum("c").over(w).cast("long").alias("cum")
    )
    stats = per_vc.groupBy("day").agg(F.sum("c").cast("long").alias("n"))
    j = cum.join(stats, "day")

    def band(num_mult: int, den: int, name: str):
        # pos = num/den with num = num_mult·(n−1); lo rank = num div den,
        # hi rank = lo + (1 if num % den else 0); f = (num % den)/den
        num = F.lit(num_mult) * (F.col("n") - 1)
        rem = num % den
        # integer rank thresholds (den·__cum vs num−rem+den) — no double
        # quotient in the rank path (ADVICE r7; see operators/percentiles.py)
        lo_thresh = num - rem + F.lit(den)
        hi_thresh = lo_thresh + (rem > 0).cast("long") * F.lit(den)
        lo_c = F.min(F.when(F.col("cum") * den >= lo_thresh, F.col("cents")))
        hi_c = F.min(F.when(F.col("cum") * den >= hi_thresh, F.col("cents")))
        frac = rem.cast("double") / F.lit(float(den))
        return (
            (
                lo_c.cast("double")
                + (hi_c - lo_c).cast("double") * F.max(frac)
            )
            / F.lit(100.0)
        ).alias(name)

    return (
        j.groupBy("day")
        .agg(
            F.max("n").alias("n_events"),
            band(1, 10, "p10"),
            band(1, 2, "p50"),
            band(9, 10, "p90"),
        )
        .orderBy("day")
    )


def diurnal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(hour_of_day, n_events, share)`` — the 24-row
    diurnal activity curve (all days folded onto one clock), the load
    profile capacity planning reads. Integer counts, one division.
    Ordered by hour."""
    events = read_table(spark, sf_dir, "events", ["ts"])
    counts = events.groupBy(F.hour("ts").cast("int").alias("hour_of_day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    total = counts.agg(F.sum("n_events").cast("long").alias("t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "hour_of_day",
            "n_events",
            (F.col("n_events").cast("double") / F.col("t").cast("double")).alias(
                "share"
            ),
        )
        .orderBy("hour_of_day")
    )


def monthly_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(month_of_year, n_orders, revenue_cents,
    seasonal_index)`` — calendar-month revenue seasonality [extension]:
    each month-of-year's revenue against the uniform-month expectation
    (index 1.0 = no seasonality), the yearly companion of the diurnal
    and day-of-week profiles.

    Exactness: exact-cents sums; the index is ONE IEEE division of
    integer values — ``12·month_revenue / total_revenue`` — mirrored
    verbatim in the oracle. Scale: one partial-aggregated 12-group hash
    agg over the orders scan; constant-size output.
    """
    orders = read_table(spark, sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    cents = F.expr("cast(cast(o_totalprice as decimal(14,2)) * 100 as bigint)")
    per_month = orders.groupBy(
        F.month("o_orderdate").cast("long").alias("month_of_year")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(cents).cast("long").alias("revenue_cents"),
    )
    total = per_month.agg(F.sum("revenue_cents").cast("long").alias("t"))
    return (
        per_month.crossJoin(F.broadcast(total))
        .select(
            "month_of_year",
            "n_orders",
            "revenue_cents",
            (
                (F.col("revenue_cents") * 12).cast("double")
                / F.col("t").cast("double")
            ).alias("seasonal_index"),
        )
        .orderBy("month_of_year")
    )


SEASONAL_LAG_DAYS = 7  # weekly seasonality: forecast(t) = actual(t-7)


def seasonal_naive_forecast_error(
    spark: SparkSession, sf_dir: str, lag_days: int = SEASONAL_LAG_DAYS
) -> DataFrame:
    """Registry entry: ``(month, n_days, sum_actual_cents,
    sum_abs_err_cents, mae_cents, wape)`` — walk-forward backtest of the
    seasonal-naive forecaster (predict each day's order revenue with the
    revenue exactly one week earlier) over the dense daily axis, rolled
    up per calendar month. The standard forecasting baseline every
    fancier model must beat; ``wape`` = Σ|err| / Σactual is the
    scale-free headline. Days before the first possible forecast
    (min_day + ``lag_days``) are excluded. Ordered by month.

    No reference counterpart [extension]; forecasting-eval twin of
    ``revenue_changepoint`` / ``smoothed_daily_revenue``.

    Shape: one hash agg over the orders scan (exact cents through
    DECIMAL(14,2)), densified against the sequence-generated day axis
    (time-range-sized, not corpus-sized — broadcast-scale at any SF),
    one lag window over that axis (single ordered pass over a few
    thousand rows), then a months-sized rollup. The only divisions are
    the two final per-month doubles; everything upstream is exact
    integers, so the error accounting is cross-engine exact.
    """
    orders = read_table(spark, sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(14,2)")) * 100)
        .cast("long")
        .alias("cents")
    )
    axis = (
        daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias(
                "day"
            )
        )
    )
    dense = axis.join(daily, "day", "left").select(
        "day", F.coalesce("cents", F.lit(0)).cast("long").alias("cents")
    )
    w = Window.orderBy("day")
    scored = dense.select(
        "day",
        "cents",
        F.lag("cents", lag_days).over(w).alias("forecast"),
    ).filter(F.col("forecast").isNotNull())
    return (
        scored.groupBy(F.date_trunc("month", F.col("day")).alias("month"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("cents").cast("long").alias("sum_actual_cents"),
            F.sum(F.abs(F.col("cents") - F.col("forecast")))
            .cast("long")
            .alias("sum_abs_err_cents"),
        )
        .select(
            "month",
            "n_days",
            "sum_actual_cents",
            "sum_abs_err_cents",
            (F.col("sum_abs_err_cents").cast("double") / F.col("n_days")).alias(
                "mae_cents"
            ),
            # zero-denominator guard (ADVICE-r9): an all-zero month is
            # NULL in Spark but inf in DuckDB — make both engines NULL
            F.when(
                F.col("sum_actual_cents") > 0,
                F.col("sum_abs_err_cents").cast("double")
                / F.col("sum_actual_cents"),
            ).alias("wape"),
        )
        .orderBy("month")
    )
