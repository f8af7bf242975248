"""Engine-exact interpolated percentiles over integral values.

Spark's ``percentile`` and DuckDB's ``quantile_cont`` implement the same
textbook definition (pos = p·(n−1); lo=sorted[⌊pos⌋]; hi=sorted[⌈pos⌉];
result = lo + (hi−lo)·frac) but through DIFFERENT float expression
trees, so their outputs can differ in the last ulp for the wrong group
size — a volume-dependent hash mismatch (first seen on
``daily_value_bands`` at sf0.1). This module removes the float path
entirely: the caller quantizes values to an integral unit (cents, days,
seconds, fixed-point), percentiles are located by INTEGER ranks over a
per-(group, value) histogram with a group-partitioned cumulative count,
and each band is returned as the exact integer NUMERATOR

    num = den·lo + (hi − lo)·rem        (pos = (num_mult·(n−1))/den,
                                         rem = (num_mult·(n−1)) mod den)

so the true percentile is ``num / (den · unit_scale)`` — ONE division,
written identically in the Spark query and the DuckDB oracle.

Scale: state is |distinct values| per group (a histogram), never the row
list — no ``collect_list`` of a 100 TB group. The cumulative window is
partitioned by the group columns; for GLOBAL percentiles pass a monotone
``global_bucket`` of the value so the prefix sum runs two-phase
(operators/prefix.py) instead of single-partition.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

Band = tuple[int, int, str]  # (num_mult, den, out_name)

MEDIAN: Band = (1, 2, "median_num")


def percentile_numerators(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    bands: Sequence[Band],
    global_bucket: Column | None = None,
) -> DataFrame:
    """Per-group exact percentile numerators over the integral
    ``value_col``. Returns ``group_cols + [n] + [name for each band]``
    where ``name`` is the BIGINT numerator (divide by ``den·unit_scale``
    for the float percentile) and ``n`` is the group row count.

    With empty ``group_cols``, pass ``global_bucket`` (a monotone
    function of ``value_col``) so the rank scan stays distributed; the
    result is one row.
    """
    group_cols = list(group_cols)
    per_v = df.groupBy(*group_cols, value_col).agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    if group_cols:
        w = (
            Window.partitionBy(*group_cols)
            .orderBy(value_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = per_v.withColumn("__cum", F.sum("__c").over(w).cast("long"))
    else:
        from .prefix import bucketed_cumsum

        if global_bucket is None:
            raise ValueError(
                "global percentiles need a monotone global_bucket so the "
                "cumulative rank scan is not a single-partition window"
            )
        cum = bucketed_cumsum(
            per_v,
            bucket=global_bucket,
            order=[F.col(value_col).asc()],
            sums={"__cum": "__c"},
        )
    stats = per_v.groupBy(*group_cols).agg(F.sum("__c").cast("long").alias("n"))
    j = cum.join(stats, group_cols) if group_cols else cum.crossJoin(
        F.broadcast(stats)
    )
    v = F.col(value_col)
    aggs = [F.max("n").cast("long").alias("n")]
    for num_mult, den, name in bands:
        num = F.lit(num_mult) * (F.col("n") - 1)
        rem = num % den
        # rank thresholds scaled through by den so the whole rank path
        # stays in BIGINT: __cum ≥ lo_rk+1  ⇔  den·__cum ≥ num−rem+den
        # (num−rem = den·lo_rk). floor(num/den) went through a double
        # quotient that can mis-round near 2^53 (ADVICE r7).
        lo_thresh = num - rem + F.lit(den)
        hi_thresh = lo_thresh + (rem > 0).cast("long") * F.lit(den)
        lo = F.min(F.when(F.col("__cum") * den >= lo_thresh, v))
        hi = F.min(F.when(F.col("__cum") * den >= hi_thresh, v))
        aggs.append(
            (F.lit(den) * lo + (hi - lo) * F.max(rem)).cast("long").alias(name)
        )
    out = j.groupBy(*group_cols).agg(*aggs) if group_cols else j.agg(*aggs)
    return out


def as_value(numerator: Column, den: int, unit_scale: float = 1.0) -> Column:
    """The float percentile from a band numerator — the ONE shared float
    expression: CAST(num AS DOUBLE) / (den·unit_scale)."""
    return numerator.cast("double") / F.lit(float(den) * unit_scale)
