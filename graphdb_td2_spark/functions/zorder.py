"""Z-order (Morton) interleaving [extension] — the multi-column locality
key behind lake-table Z-ORDER layouts: sorting files by the interleaved
bits of two columns keeps BOTH columns' min/max ranges tight per file, so
parquet footer stats prune scans filtered on either column (a plain sort
only tightens its leading column).

Pure bit arithmetic via built-ins (shiftright/and/shiftleft folded with
bitwise OR) — JVM-side, whole-stage-codegen-able, deterministic.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_BITS = 21  # 2x21 = 42-bit key, safely inside a long


def morton_key(x: Column, y: Column, bits: int = DEFAULT_BITS) -> Column:
    """Interleave the low ``bits`` of two non-negative longs: bit i of x
    lands at position 2i, bit i of y at 2i+1."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda a, b: a.bitwiseOR(b), terms).cast("long")


def write_zordered(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    bits: int = DEFAULT_BITS,
    n_files: int = 8,
    normalize: bool = True,
) -> None:
    """Write parquet laid out by the Z-curve over (x, y): range-partition
    on the morton key (so files own contiguous curve segments), sort
    within partitions, drop the key. Downstream filters on EITHER column
    prune via footer min/max stats.

    ``normalize`` (default on) rescales each column to the full
    ``2^bits`` domain from its observed min/max first. This is
    load-bearing for pruning: raw values with unequal magnitudes (say a
    20-bit order key against a 14-bit part key) leave the part key's high
    interleaved bits constantly zero, so curve splits degrade to an
    order-key-only sort and filters on the smaller column stop pruning.
    Normalization costs one min/max aggregate over the frame (driver
    scalars, single pass — the same stats a lake format's OPTIMIZE
    collects anyway)."""
    xs, ys = F.col(x).cast("double"), F.col(y).cast("double")
    if normalize:
        lo_x, hi_x, lo_y, hi_y = df.agg(
            F.min(xs), F.max(xs), F.min(ys), F.max(ys)
        ).first()
        top = float((1 << bits) - 1)

        def scale(c, lo, hi):
            if lo is None or hi is None or hi == lo:
                return F.lit(0).cast("long")
            return ((c - F.lit(float(lo))) / F.lit((hi - lo) / top)).cast("long")

        zx, zy = scale(xs, lo_x, hi_x), scale(ys, lo_y, hi_y)
    else:
        zx, zy = F.col(x), F.col(y)
    keyed = df.withColumn("__z", morton_key(zx, zy, bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
