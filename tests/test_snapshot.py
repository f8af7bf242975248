"""Snapshot diff (operators/snapshot.py): four-status fixture and
corpus accounting laws."""

from __future__ import annotations

from graphdb_td2_spark.io import read_table
from graphdb_td2_spark.operators.snapshot import (
    PREV_DROP_MOD,
    PREV_GONE_MOD,
    snapshot_diff,
    snapshot_diff_stats,
)

DOC = "doc_id long, source string, text string"


def test_all_four_statuses_on_fixture(spark):
    new = spark.createDataFrame(
        [
            (1, "web", "alpha"),
            (2, "web", "beta EDITED"),
            (3, "web", "Gamma  text"),  # reformat only → unchanged
            (5, "web", "brand new"),
        ],
        DOC,
    )
    prev = spark.createDataFrame(
        [
            (1, "web", "alpha"),
            (2, "web", "beta"),
            (3, "web", "gamma text"),
            (4, "web", "deleted doc"),
        ],
        DOC,
    )
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(new, prev).collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "unchanged",
        4: "removed",
        5: "added",
    }


def test_corpus_stats_accounting(spark, sf_dir):
    rows = snapshot_diff_stats(spark, sf_dir).collect()
    assert rows
    docs = read_table(spark, sf_dir, "documents", ["doc_id"]).collect()
    ids = [r["doc_id"] for r in docs]
    # added = docs dropped from prev; removed = the shifted-id copies
    assert sum(r["n_added"] for r in rows) == sum(
        1 for i in ids if i % PREV_DROP_MOD == 0
    )
    assert sum(r["n_removed"] for r in rows) == sum(
        1 for i in ids if i % PREV_GONE_MOD == 0
    )
    total = sum(
        r["n_added"] + r["n_removed"] + r["n_changed"] + r["n_unchanged"]
        for r in rows
    )
    assert total == len(ids) + sum(1 for i in ids if i % PREV_GONE_MOD == 0)
