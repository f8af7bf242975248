"""Two-sample distribution-drift testing — exact Kolmogorov-Smirnov
statistic between event-value distributions, the gate a data pipeline
runs before accepting a new batch ("does today's value distribution
match yesterday's?"). Here the two samples are the two
lexicographically-first event types, a deterministic stand-in for
batch-vs-batch.

Exactness: the KS statistic sup|F_A − F_B| is computed WITHOUT floats —
ECDF comparisons cross-multiply to integers: at every observed value v,
``|n_B·cum_A(v) − n_A·cum_B(v)|`` is an exact BIGINT, its max divided
ONCE by ``n_A·n_B`` at the end. No per-point float ECDFs, no summation
order anywhere.

Scale notes: values aggregate to per-distinct-value counts first, so
the ECDF window ranges over the DISTINCT value axis (2-decimal corpus
values → bounded), not the row count; the heavy pass is one hash agg.
At a truly unbounded value domain the production variant buckets
through the GK quantile sketch (functions/sketches.py) first — same
plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..io import read_table
from .prefix import bucketed_cumsum


def ks_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: one row ``(type_a, type_b, n_a, n_b, ks_num, ks)``
    — exact KS distance between the value distributions of the two
    lexicographically-first event types; ``ks = ks_num / (n_a·n_b)``."""
    ev = read_table(spark, sf_dir, "events", ["event_type", "value"])
    t = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.row_number()
            .over(Window.orderBy("event_type"))
            .alias("rn"),
        )
        .filter(F.col("rn") <= 2)
    )
    tagged = ev.join(F.broadcast(t), "event_type")
    per_value = tagged.groupBy("value").agg(
        F.sum((F.col("rn") == 1).cast("long")).alias("a_cnt"),
        F.sum((F.col("rn") == 2).cast("long")).alias("b_cnt"),
    )
    # Two-phase prefix sum: floor(value) buckets are monotone in the
    # value order, so the ECDF never funnels through one partition
    # (operators/prefix.py; bit-identical to the naive global window).
    cums = bucketed_cumsum(
        per_value,
        bucket=F.floor("value"),
        order=[F.col("value").asc()],
        sums={"cum_a": "a_cnt", "cum_b": "b_cnt"},
    ).select("cum_a", "cum_b")
    totals = per_value.agg(
        F.sum("a_cnt").cast("long").alias("n_a"),
        F.sum("b_cnt").cast("long").alias("n_b"),
    )
    names = t.groupBy().agg(
        F.min(F.when(F.col("rn") == 1, F.col("event_type"))).alias("type_a"),
        F.min(F.when(F.col("rn") == 2, F.col("event_type"))).alias("type_b"),
    )
    ks_num = (
        cums.crossJoin(F.broadcast(totals))
        .select(
            F.abs(
                F.col("n_b") * F.col("cum_a") - F.col("n_a") * F.col("cum_b")
            ).alias("d")
        )
        .agg(F.max("d").cast("long").alias("ks_num"))
    )
    return (
        names.crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(ks_num))
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "ks_num",
            (
                F.col("ks_num").cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("ks"),
        )
    )


ROLL_CORR_DAYS = 7


def rolling_type_correlation(
    spark: SparkSession, sf_dir: str, window_days: int = ROLL_CORR_DAYS
) -> DataFrame:
    """Registry entry: ``(day, n_days, corr)`` — trailing 7-day Pearson
    correlation between the DAILY EVENT COUNTS of the two
    lexicographically-first event types (the co-movement monitor a
    pipeline dashboard plots next to the KS drift gate). Ordered by day;
    emitted once the full window is available.

    Determinism: per-day counts are exact integers; each window's five
    sufficient statistics are exact integer SLIDING sums over the
    bounded day axis, and r is the same closed-form / IEEE-double
    combination as ``degree_assortativity``. Windows with zero variance
    on either side yield NULL (0/0), identically in both engines.

    Scale notes: the heavy pass is the per-(day, type) count rollup;
    all windows range over the day axis (time-bounded, not
    corpus-bounded).
    """
    ev = read_table(spark, sf_dir, "events", ["ts", "event_type"])
    t = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.row_number().over(Window.orderBy("event_type")).alias("rn"),
        )
        .filter(F.col("rn") <= 2)
    )
    daily = (
        ev.join(F.broadcast(t), "event_type")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.sum((F.col("rn") == 1).cast("long")).alias("x"),
            F.sum((F.col("rn") == 2).cast("long")).alias("y"),
        )
    )
    axis = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi")).select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    dense = axis.join(daily, "day", "left").select(
        "day",
        F.coalesce("x", F.lit(0)).cast("long").alias("x"),
        F.coalesce("y", F.lit(0)).cast("long").alias("y"),
    )
    w = Window.orderBy("day").rowsBetween(-(window_days - 1), 0)
    stats = dense.select(
        "day",
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
        F.sum("x").over(w).cast("long").alias("sx"),
        F.sum("y").over(w).cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).cast("long").alias("syy"),
    ).filter(F.col("n") == window_days)
    n_d, sx_d, sy_d = (F.col(c).cast("double") for c in ("n", "sx", "sy"))
    sxy_d, sxx_d, syy_d = (F.col(c).cast("double") for c in ("sxy", "sxx", "syy"))
    corr = (n_d * sxy_d - sx_d * sy_d) / (
        F.sqrt(n_d * sxx_d - sx_d * sx_d) * F.sqrt(n_d * syy_d - sy_d * sy_d)
    )
    return stats.select(
        "day", F.col("n").alias("n_days"), corr.alias("corr")
    ).orderBy("day")


def daily_count_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(lag_days, n_pairs, autocorr)`` — lag-1 and
    lag-7 Pearson autocorrelation of the daily event count series (is
    activity momentum daily or weekly-seasonal?). Ordered by lag.

    Determinism: (x, y) pairs come from an exact self-join of the dense
    daily counts at the two offsets; the five sufficient statistics are
    exact integers and the correlation is the same fixed double
    combination as ``degree_assortativity``. Scale: the series is the
    bounded day axis — every stage after the daily rollup is
    axis-sized.
    """
    ev = read_table(spark, sf_dir, "events", ["ts"])
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    axis = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi")).select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    dense = axis.join(daily, "day", "left").select(
        "day", F.coalesce("c", F.lit(0)).cast("long").alias("c")
    )
    out = None
    for lag in (1, 7):
        a = dense.select(F.col("day"), F.col("c").alias("x"))
        b = dense.select(
            (F.col("day") - F.expr(f"INTERVAL {lag} DAY")).alias("day"),
            F.col("c").alias("y"),
        )
        stats = (
            a.join(b, "day")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("x").cast("long").alias("sx"),
                F.sum("y").cast("long").alias("sy"),
                F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
                F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
                F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
            )
        )
        n_d, sx_d, sy_d = (F.col(c).cast("double") for c in ("n", "sx", "sy"))
        sxy_d, sxx_d, syy_d = (
            F.col(c).cast("double") for c in ("sxy", "sxx", "syy")
        )
        corr = (n_d * sxy_d - sx_d * sy_d) / (
            F.sqrt(n_d * sxx_d - sx_d * sx_d) * F.sqrt(n_d * syy_d - sy_d * sy_d)
        )
        row = stats.select(
            F.lit(lag).cast("int").alias("lag_days"),
            F.col("n").alias("n_pairs"),
            corr.alias("autocorr"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("lag_days")


def revenue_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: one row ``(split_day, n_left, n_right, mean_left,
    mean_right, score)`` — offline change-point detection on the daily
    revenue series: the day boundary maximizing the between-segment
    variance ``nL·nR/(nL+nR) · (meanL − meanR)²`` (the two-segment
    least-squares split — CUSUM's batch equivalent, but windowable:
    every candidate split is scored from PREFIX SUMS in one pass, the
    same trick as the Gini stump).

    Determinism: prefix sums of exact cents over the bounded day axis;
    the score is a fixed double combination of int64 values with a
    (score DESC, day ASC) total-order argmax; means are single
    divisions.
    """
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
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    tot = dense.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    cand = (
        dense.select(
            "day",
            F.count(F.lit(1)).over(w).cast("long").alias("nl"),
            F.sum("cents").over(w).cast("long").alias("sl"),
        )
        .crossJoin(F.broadcast(tot))
        .filter(F.col("nl") < F.col("n"))
    )
    nl_d = F.col("nl").cast("double")
    nr = F.col("n") - F.col("nl")
    nr_d = nr.cast("double")
    ml = F.col("sl").cast("double") / nl_d
    mr = (F.col("s") - F.col("sl")).cast("double") / nr_d
    score = nl_d * nr_d / (nl_d + nr_d) * ((ml - mr) * (ml - mr))
    best = (
        cand.select(
            "day",
            "nl",
            nr.cast("long").alias("nr"),
            ml.alias("mean_left"),
            mr.alias("mean_right"),
            score.alias("score"),
        )
        .withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.desc("score"), F.asc("day"))),
        )
        .filter(F.col("rk") == 1)
    )
    return best.select(
        F.col("day").alias("split_day"),
        F.col("nl").alias("n_left"),
        F.col("nr").alias("n_right"),
        "mean_left",
        "mean_right",
        "score",
    )


def event_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(event_type, n_days, n_events, dispersion)`` —
    the index of dispersion (variance-to-mean ratio, Fano factor) of
    each type's DAILY event counts over the days the type occurred:
    ≈1 is Poisson-like traffic, ≫1 is bursty — the load-shape signal a
    capacity planner reads next to the diurnal profile. Ordered by
    event_type.

    Determinism: with n day-counts c_i, population variance/mean reduces
    to ``(n·Σc² − (Σc)²) / (n·Σc)`` — exact BIGINTs divided ONCE.
    Days without events for a type are (documentedly) not part of that
    type's axis. Scale: one (type, day) rollup then a |types|-row
    moment aggregate — two partial-agged shuffles, no windows.
    """
    ev = read_table(spark, sf_dir, "events", ["event_type", "ts"])
    daily = (
        ev.select("event_type", F.date_trunc("day", "ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("c").cast("long").alias("s1"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
        )
        .select(
            "event_type",
            "n_days",
            F.col("s1").alias("n_events"),
            (
                (F.col("n_days") * F.col("s2") - F.col("s1") * F.col("s1"))
                .cast("double")
                / (F.col("n_days") * F.col("s1")).cast("double")
            ).alias("dispersion"),
        )
        .orderBy("event_type")
    )
