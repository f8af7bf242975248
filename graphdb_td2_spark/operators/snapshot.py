"""Corpus snapshot diff — classify every document as added / removed /
changed / unchanged between two corpus snapshots by key + content
digest. This is the detect-changes primitive of incremental processing:
a nightly 100 TB pipeline diffs today's crawl against yesterday's and
re-runs dedup/quality/indexing only on the (tiny) changed partition,
exactly the delta the IVM tier (``streaming/ivm.py``) and CDC apply
(``operators/cdc.py``) consume downstream.

Digest = the dedup tier's ``content_digest`` (normalized md5), so "same
modulo reformatting" here agrees with what exact dedup collapses.

Scale notes: one full-outer join on the key (both sides shuffle-
partition on doc_id — at 100 TB both snapshots are key-partitioned lake
tables, making the join exchange-free) carrying only (key, source,
digest) — 3 narrow columns, never the text; the per-source rollup is a
partial-aggregated conditional-sum pass. Diff output cardinality is the
change rate, not the corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..dedup.exact import content_digest
from ..io import read_table


def snapshot_diff(new: DataFrame, prev: DataFrame) -> DataFrame:
    """Per-document diff of two ``(doc_id, source, text)`` snapshots:
    ``(doc_id, source, status)`` with status in
    added / removed / changed / unchanged."""

    def keyed(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            "doc_id",
            F.col("source").alias(f"{side}_source"),
            content_digest(F.col("text")).alias(f"{side}_dg"),
        )

    joined = keyed(new, "new").join(keyed(prev, "prev"), "doc_id", "full_outer")
    status = (
        F.when(F.col("prev_dg").isNull(), F.lit("added"))
        .when(F.col("new_dg").isNull(), F.lit("removed"))
        .when(F.col("new_dg") != F.col("prev_dg"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        "doc_id",
        F.coalesce(F.col("new_source"), F.col("prev_source")).alias("source"),
        status.alias("status"),
    )


# Synthetic prior snapshot derived deterministically from the corpus (the
# driver testdata ships one snapshot): drop every 7th doc (those become
# "added" in the current snapshot), append a revision marker to every
# 11th doc's text (digest moves → "changed"), and include a shifted-id
# copy of every 13th doc (keys absent from the current snapshot →
# "removed"). Documented constants so the oracle replays the same prior
# snapshot.
PREV_DROP_MOD = 7
PREV_EDIT_MOD = 11
PREV_GONE_MOD = 13
PREV_GONE_OFFSET = 1_000_000_000
PREV_EDIT_SUFFIX = " rev2"


def _synthetic_prev(docs: DataFrame) -> DataFrame:
    kept = docs.filter(F.col("doc_id") % PREV_DROP_MOD != 0).select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % PREV_EDIT_MOD == 0,
            F.concat(F.col("text"), F.lit(PREV_EDIT_SUFFIX)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    gone = docs.filter(F.col("doc_id") % PREV_GONE_MOD == 0).select(
        (F.col("doc_id") + PREV_GONE_OFFSET).alias("doc_id"), "source", "text"
    )
    return kept.unionByName(gone)


def snapshot_diff_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: per-source diff profile against the synthetic
    prior snapshot — ``(source, n_added, n_removed, n_changed,
    n_unchanged)``, ordered by source."""
    docs = read_table(spark, sf_dir, "documents", ["doc_id", "source", "text"])
    diff = snapshot_diff(docs, _synthetic_prev(docs))
    flag = lambda s: F.sum((F.col("status") == s).cast("long")).cast("long")  # noqa: E731
    return (
        diff.groupBy("source")
        .agg(
            flag("added").alias("n_added"),
            flag("removed").alias("n_removed"),
            flag("changed").alias("n_changed"),
            flag("unchanged").alias("n_unchanged"),
        )
        .orderBy("source")
    )
