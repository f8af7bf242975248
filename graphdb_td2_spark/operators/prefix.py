"""Two-phase distributed prefix sums — the scale-safe replacement for
``Window.orderBy(...)`` with no ``partitionBy`` (Spark's "No Partition
Defined for Window operation" hazard: the whole axis funnels through ONE
task).

Pattern (same as ``operators/timeseries.py:running_revenue_distributed``,
generalized): pick a BUCKET that is a monotone function of the window's
primary order key. Within-bucket running sums use a window PARTITIONED
by bucket (parallel); each bucket then adds the broadcast cumulative
total of all PRIOR buckets. Only the |buckets|-row offset table ever
crosses a global order — the full axis never sits in one partition.

Correctness requirement: ``bucket`` must be monotone non-decreasing in
the order's primary key (non-increasing when the primary key is DESC and
``bucket_desc=True``), and rows that tie on the primary key must share a
bucket (guaranteed when bucket is a function of the primary key alone).
Results are bit-identical to the naive global window — integer sums are
associative, so the two-phase split changes the plan, not the values.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

_B = "__pfx_bucket"


def bucketed_cumsum(
    df: DataFrame,
    bucket: Column,
    order: Sequence[Column],
    sums: dict[str, str],
    bucket_desc: bool = False,
) -> DataFrame:
    """Add running-sum columns over the total order ``order`` without a
    single-partition window.

    ``sums`` maps output column name -> input column name; each output
    is ``SUM(input) OVER (ORDER BY order ROWS UNBOUNDED PRECEDING..CURRENT)``
    cast to long. ``bucket`` must be monotone in the primary order key
    (see module doc); ``bucket_desc=True`` when the primary key is DESC.
    """
    tagged = df.withColumn(_B, bucket)
    w_in = (
        Window.partitionBy(_B)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = tagged
    for out, src in sums.items():
        within = within.withColumn(out, F.sum(src).over(w_in).cast("long"))
    totals = tagged.groupBy(_B).agg(
        *[F.sum(src).cast("long").alias(f"__t_{out}") for out, src in sums.items()]
    )
    b_order = F.col(_B).desc() if bucket_desc else F.col(_B).asc()
    w_prior = Window.orderBy(b_order).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        _B,
        *[
            F.coalesce(F.sum(f"__t_{out}").over(w_prior), F.lit(0))
            .cast("long")
            .alias(f"__o_{out}")
            for out in sums
        ],
    )
    joined = within.join(F.broadcast(offsets), _B)
    for out in sums:
        joined = joined.withColumn(
            out, (F.col(out) + F.col(f"__o_{out}")).cast("long")
        )
    return joined.drop(_B, *[f"__o_{out}" for out in sums])


def bucketed_row_number(
    df: DataFrame,
    bucket: Column,
    order: Sequence[Column],
    out: str = "rn",
) -> DataFrame:
    """Add a 1-based dense global row number over ``order`` without a
    single-partition window: within-bucket ``row_number`` plus the
    broadcast count of all prior buckets. Same monotone-bucket
    requirement as :func:`bucketed_cumsum`."""
    tagged = df.withColumn(_B, bucket)
    w_in = Window.partitionBy(_B).orderBy(*order)
    within = tagged.withColumn(out, F.row_number().over(w_in).cast("long"))
    counts = tagged.groupBy(_B).agg(F.count(F.lit(1)).cast("long").alias("__t_n"))
    w_prior = Window.orderBy(F.col(_B).asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        _B,
        F.coalesce(F.sum("__t_n").over(w_prior), F.lit(0))
        .cast("long")
        .alias("__o_n"),
    )
    return (
        within.join(F.broadcast(offsets), _B)
        .withColumn(out, (F.col(out) + F.col("__o_n")).cast("long"))
        .drop(_B, "__o_n")
    )
