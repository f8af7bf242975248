"""Bloom-filter semi-join pruning [extension] — the runtime-filter pattern
as an explicit, reusable artifact.

Catalyst already injects bloom filters into shuffle joins on its own
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, default-on in this
Spark); this module covers the cases the optimizer can't: pre-filtering a
STREAM against a static key set, shipping a filter artifact across jobs
(build once, probe in many pipelines), or pruning before an expensive
Python/Arrow stage rather than before a join.

Shape: the build side aggregates k md5-derived bit positions per key into
an ``m/64``-word bit array via partial-agged ``bit_or`` — the shuffle
carries at most m/64 rows regardless of key count — and the probe
is a narrow per-row expression over the broadcast word array (8 KiB at the
default m = 2^16). No false negatives by construction (tested); false
positives only cost probe-side work, never correctness — callers follow the
bloom pre-filter with the exact join, so results are byte-identical with
the filter on or off (which is also why the DuckDB oracle is the plain
semi-join).

All hashes are md5-hex-prefix arithmetic — the same engine-portable
primitive as sampling/minhash — so a DuckDB/Trino pipeline could build a
bit-identical filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..io import read_table

M_BITS = 1 << 16  # filter size: 8 KiB of bits
K_HASHES = 4


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k md5-uniform bit positions of a key (15 hex digits < 2^60, exact
    BIGINT arithmetic)."""
    return [
        F.conv(
            F.substring(F.md5(F.concat(key.cast("string"), F.lit(f"#{i}"))), 1, 15),
            16,
            10,
        ).cast("long")
        % m_bits
        for i in range(k)
    ]


def build_bloom(
    keys: DataFrame, key_col: str, m_bits: int = M_BITS, k: int = K_HASHES
) -> list[int]:
    """Distributed build: explode each key's k positions, partial-agg
    ``bit_or`` per 64-bit word, collect the (≤ m/64)-row result. Returns
    the dense word array (length m/64) for broadcast into probes."""
    n_words = m_bits // 64
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("pos")
    )
    words = (
        pos.select(
            (F.col("pos") / 64).cast("long").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    dense = [0] * n_words
    for r in words:
        dense[int(r["w"])] = int(r["bits"])
    return dense


def might_contain(
    key: Column, bloom: list[int], m_bits: int = M_BITS, k: int = K_HASHES
) -> Column:
    """Narrow probe predicate: all k bits set in the broadcast word array.
    True for every key that was in the build set (no false negatives);
    spuriously true with probability ~(1-e^{-kn/m})^k."""
    bits = F.lit(bloom)
    pred = None
    for pos in _positions(key, m_bits, k):
        word = F.element_at(bits, (pos / 64).cast("int") + 1)
        test = F.getbit(word, (pos % 64).cast("int")) == 1
        pred = test if pred is None else (pred & test)
    return pred


def bloom_urgent_order_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: per-type counts of events by users who placed an
    URGENT order — the fact stream is bloom-PRE-FILTERED against the
    urgent-customer key set, then exactly semi-joined (so the bloom's
    false positives never reach the output and the oracle is the plain
    semi-join). The plan shows the md5 filter BELOW the join: at 100 TB
    this is the knob that keeps a 99%-selective join from shuffling the
    full fact table."""
    urgent = (
        read_table(spark, sf_dir, "orders", ["o_custkey", "o_orderpriority"])
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    bloom = build_bloom(urgent, "o_custkey")
    events = read_table(spark, sf_dir, "events", ["user_id", "event_type"])
    prefiltered = events.filter(might_contain(F.col("user_id"), bloom))
    exact = prefiltered.join(
        F.broadcast(urgent),
        prefiltered.user_id == urgent.o_custkey,
        "left_semi",
    )
    return (
        exact.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .orderBy("event_type")
    )
