"""Incremental MinHash maintenance: streaming the documents corpus in
micro-batches must yield EXACTLY the uncapped batch pair set — including
pairs whose two documents arrive in different batches (the cross-batch
join term) — and replays must not duplicate pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_td2_spark.dedup.minhash import band_buckets, minhash_signatures
from graphdb_td2_spark.io import read_table
from graphdb_td2_spark.streaming.dedup_stream import (
    apply_minhash_delta,
    maintained_pairs,
    run_incremental_minhash,
)

SF_DIR = "/root/testdata/sf0.001"


def _batch_pairs(docs):
    b = band_buckets(minhash_signatures(docs))
    x, y = b.alias("x"), b.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .groupBy(
            F.col("x.doc_id").alias("doc_id_a"),
            F.col("y.doc_id").alias("doc_id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def test_incremental_matches_batch_recompute(spark, tmp_path):
    docs = read_table(spark, SF_DIR, "documents")
    stream_dir = str(tmp_path / "stream")
    # hash-partitioned fragments scatter near-dup pairs across batches,
    # forcing the cross-batch join term
    docs.repartition(4).write.parquet(stream_dir)
    state_dir = str(tmp_path / "state")
    run_incremental_minhash(spark, stream_dir, state_dir)

    got = sorted(map(tuple, maintained_pairs(spark, state_dir).collect()))
    want = sorted(map(tuple, _batch_pairs(docs.select("doc_id", "text")).collect()))
    assert got == want
    assert len(got) > 0  # the corpus really contains near-dups


def test_replayed_batch_rewrites_identically(spark, tmp_path):
    """At-least-once replay: re-applying a batch (same id, same rows)
    against the same state leaves the pair set unchanged — the state read
    excludes partitions >= the replayed id, so the batch never joins
    against its own leftovers."""
    state = str(tmp_path / "st")
    b0 = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(3, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    apply_minhash_delta(spark, b0, 0, state)
    apply_minhash_delta(spark, b1, 1, state)
    before = sorted(map(tuple, maintained_pairs(spark, state).collect()))
    apply_minhash_delta(spark, b1, 1, state)  # replay
    after = sorted(map(tuple, maintained_pairs(spark, state).collect()))
    assert before == after
    # docs 1 and 2 are identical → all 4 bands collide
    assert (1, 2, 4) in after
