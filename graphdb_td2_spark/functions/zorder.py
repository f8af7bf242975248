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
    df: DataFrame, path: str, x: str, y: str, bits: int = DEFAULT_BITS, n_files: int = 8
) -> None:
    """Write parquet laid out by the Z-curve over (x, y): range-partition
    on the morton key (so files own contiguous curve segments), sort
    within partitions, drop the key. Downstream filters on EITHER column
    prune via footer min/max stats."""
    keyed = df.withColumn("__z", morton_key(F.col(x), F.col(y), bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
