"""Skew-mitigation utilities [extension] — the 100 TB posture item from
PLANS.md made concrete.

AQE's skew-join splitting (enabled in ``session.py``) handles most hot
keys at runtime; ``salted_join`` is the explicit fallback for the cases
AQE cannot fix — e.g. a hash-aggregate or join where ONE key holds a
double-digit percentage of all rows (the hyper-popular product in an
un-seeded co-occurrence join).

Mechanics: the skewed (big) side gets a uniform random-free salt derived
from a stable row expression (md5-based, deterministic — no ``rand()``,
so retries/speculative tasks agree); the small side is exploded
``n_salts`` ways. The join key becomes (key, salt): the hot key's rows
spread over ``n_salts`` partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _salt_of(expr: Column, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts): md5 of a distinguishing row
    expression (NOT rand() — speculative re-execution must agree)."""
    return (
        F.conv(F.substring(F.md5(expr.cast("string")), 1, 8), 16, 10).cast("long")
        % n_salts
    ).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int,
    big_salt_expr: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the big side salted
    ``n_salts`` ways. ``big_salt_expr`` must distinguish rows within a hot
    key (any other column works). The small side is replicated
    ``n_salts``× — keep it dimension-sized.
    """
    b = big.withColumn("__salt", _salt_of(big_salt_expr, n_salts))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return b.join(s, [on, "__salt"], how).drop("__salt")
