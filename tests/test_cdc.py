"""CDC changelog apply (operators/cdc.py): LWW-by-version semantics,
tombstones, arrival-order invariance, idempotence."""

from __future__ import annotations

from graphdb_td2_spark.operators.cdc import apply_changelog, cdc_customer_state

SCHEMA = "key long, version long, op string, val string"

CHANGES = [
    # key 1: insert, update — final state = v2 update
    (1, 1, "I", "a"),
    (1, 2, "U", "b"),
    # key 2: insert then delete — absent
    (2, 1, "I", "x"),
    (2, 5, "D", None),
    # key 3: delete then re-insert at a higher version — resurrected
    (3, 2, "D", None),
    (3, 7, "I", "z"),
    # key 4: single insert
    (4, 1, "I", "q"),
]

WANT = {(1, 2, "U", "b"), (3, 7, "I", "z"), (4, 1, "I", "q")}


def _state(df):
    return {tuple(r) for r in df.select("key", "version", "op", "val").collect()}


def test_lww_tombstones_and_order_invariance(spark):
    df = spark.createDataFrame(CHANGES, SCHEMA)
    assert _state(apply_changelog(df, ["key"], "version")) == WANT
    # reversed arrival order and adversarial partitioning change nothing
    rev = spark.createDataFrame(list(reversed(CHANGES)), SCHEMA).repartition(7)
    assert _state(apply_changelog(rev, ["key"], "version")) == WANT


def test_apply_is_idempotent_over_replay(spark):
    # replaying the full changelog twice (at-least-once delivery) is a no-op
    df = spark.createDataFrame(CHANGES + CHANGES, SCHEMA)
    assert _state(apply_changelog(df, ["key"], "version")) == WANT


def test_corpus_state_profile_shape(spark, sf_dir):
    rows = cdc_customer_state(spark, sf_dir).collect()
    assert rows
    assert all(r["op"] in ("I", "U") for r in rows)
    assert all(r["n_keys"] > 0 for r in rows)
