"""CDC changelog application — collapse an insert/update/delete change
stream to its final table state (the read side of a lakehouse MERGE; the
batch twin of the streaming ``foreachBatch`` merge in
``streaming/core.py`` and the at-rest ``merge_upsert_parquet`` in
``sources/sinks.py``, completing D4/D5 with delete tombstones).

Semantics: for each key, the change with the highest ``version`` wins
(last-write-wins under a total per-key order — the change producer's
commit LSN); a winning ``D`` is a tombstone and the key is absent from
the final state. Arrival order is irrelevant by construction — ``max_by``
over the version is associative and partial-aggregated map-side, so the
result is identical under any partitioning, shuffle, or replay — the
property that makes the operator safe for speculative execution and
exactly-once-less ingestion at 100 TB.

Scale notes: one hash aggregate on the key — no window, no sort, no
join. The per-key payload travels once (inside the ``max_by`` struct).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..io import read_table


def apply_changelog(
    changes: DataFrame,
    key_cols: list[str],
    version_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Final state of ``changes``: per key the highest-``version`` row's
    payload, dropped if that row is a delete (``op = 'D'``).

    ``version`` must totally order each key's changes (ties are broken by
    ``op`` descending so the result is still deterministic if a producer
    emits a duplicate version, but producers should not)."""
    payload = [
        c for c in changes.columns if c not in (*key_cols, version_col, op_col)
    ]
    order: Column = F.struct(F.col(version_col), F.col(op_col))
    last = changes.groupBy(*key_cols).agg(
        F.max_by(F.struct(F.col(op_col).alias(op_col), *payload), order).alias("__w"),
        F.max(version_col).alias(version_col),
    )
    return (
        last.filter(F.col(f"__w.{op_col}") != "D")
        .select(
            *key_cols,
            version_col,
            F.col(f"__w.{op_col}").alias(op_col),
            *[F.col(f"__w.{c}").alias(c) for c in payload],
        )
    )


_OP_FOR_STATUS = {"O": "I", "F": "U", "P": "D"}


def orders_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A deterministic changelog derived from ``orders``: key =
    ``o_custkey``, version = ``o_orderkey`` (globally unique → total
    per-key order), op from the order status (O→insert, F→update,
    P→delete), payload = priority + exact integer cents."""
    ops = F.create_map(
        *[x for k, v in _OP_FOR_STATUS.items() for x in (F.lit(k), F.lit(v))]
    )
    return read_table(
        spark,
        sf_dir,
        "orders",
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"],
    ).select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderkey").alias("version"),
        ops[F.col("o_orderstatus")].alias("op"),
        F.col("o_orderpriority").alias("priority"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )


def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: the slowly-changing-dimension type-2 MATERIALIZATION
    of the same changelog ``apply_changelog`` collapses — every change
    becomes a validity interval ``[valid_from, valid_to)`` in version
    space, ``valid_to`` null for the key's latest change, ``is_current``
    true only when that latest change is not a delete tombstone.

    This is the warehouse-history twin of CDC apply: apply gives "state
    now", SCD2 gives "state as of any version" — the standard dimension-
    table pattern a lakehouse derives from the identical change stream.

    Scale notes: one shuffle on the key serving a single ``lead`` window
    (per-key change counts are bounded); no joins. Output is one row per
    change — written partitioned by key range in production, returned
    whole here for the oracle hash. Deliberately NO global sort: the
    oracle compare is order-insensitive, and a total order over an
    unbounded history table is pure cost at scale.
    """
    from pyspark.sql import Window

    ch = orders_changelog(spark, sf_dir)
    w = Window.partitionBy("key").orderBy("version")
    return ch.select(
        "key",
        F.col("version").alias("valid_from"),
        F.lead("version").over(w).alias("valid_to"),
        "op",
        "priority",
        "price_cents",
    ).withColumn("is_current", F.col("valid_to").isNull() & (F.col("op") != "D"))


def cdc_customer_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: apply the orders changelog and profile the final
    state — ``(op, n_keys, total_cents)`` per surviving op, ordered by op
    (deleted keys are absent; all-integer output)."""
    state = apply_changelog(
        orders_changelog(spark, sf_dir), ["key"], "version", "op"
    )
    return (
        state.groupBy("op")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("price_cents").cast("long").alias("total_cents"),
        )
        .orderBy("op")
    )
