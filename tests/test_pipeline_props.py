"""Invariant tests for the round-2 pipeline operators: partition
identities for the quality filter and dataset splits, and the compaction
sink's file-count contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_td2_spark.functions.sampling import dataset_splits
from graphdb_td2_spark.functions.text import quality_filter_stats
from graphdb_td2_spark.io import read_table
from graphdb_td2_spark.sources.sinks import compact_parquet_dir


def test_quality_filter_counts_partition_n_docs(spark, sf_dir):
    for r in quality_filter_stats(spark, sf_dir).collect():
        assert (
            r["n_kept"]
            + r["n_dropped_length"]
            + r["n_dropped_shape"]
            + r["n_dropped_stopword"]
            == r["n_docs"]
        ), r
        assert 0.0 <= r["kept_share"] <= 1.0


def test_dataset_splits_partition_documents(spark, sf_dir):
    rows = dataset_splits(spark, sf_dir).collect()
    n_total = sum(r["n_docs"] for r in rows)
    assert n_total == read_table(spark, sf_dir, "documents", ["doc_id"]).count()
    by_source: dict[str, float] = {}
    for r in rows:
        by_source[r["source"]] = by_source.get(r["source"], 0.0) + r["split_share"]
    for source, share in by_source.items():
        assert abs(share - 1.0) < 1e-9, source


def test_dataset_split_is_repartition_invariant(spark, sf_dir):
    from graphdb_td2_spark.functions.sampling import dataset_split

    docs = read_table(spark, sf_dir, "documents", ["doc_id"])
    a = {
        r["doc_id"]: r["s"]
        for r in docs.select("doc_id", dataset_split(F.col("doc_id")).alias("s")).collect()
    }
    b = {
        r["doc_id"]: r["s"]
        for r in docs.repartition(13)
        .select("doc_id", dataset_split(F.col("doc_id")).alias("s"))
        .collect()
    }
    assert a == b


def test_compaction_hits_target_file_count(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    # fragment: 200 tiny files
    spark.range(20_000).repartition(200).write.parquet(src)
    n = compact_parquet_dir(spark, src, dst, target_file_bytes=64 * 1024)
    files = [p for p in __import__("pathlib").Path(dst).glob("*.parquet")]
    assert len(files) == n
    assert n < 200  # actually compacted
    # content preserved
    assert spark.read.parquet(dst).count() == 20_000
    got = spark.read.parquet(dst).agg(F.sum("id")).first()[0]
    assert got == 20_000 * 19_999 // 2


def test_compaction_can_split_few_big_files(spark, tmp_path):
    """Growing the file count (splitting oversized files) must actually
    repartition — coalesce alone cannot increase parallelism."""
    src = str(tmp_path / "one_big")
    dst = str(tmp_path / "split")
    spark.range(50_000).coalesce(1).write.parquet(src)
    n = compact_parquet_dir(spark, src, dst, target_file_bytes=16 * 1024)
    files = list(__import__("pathlib").Path(dst).glob("*.parquet"))
    assert n > 1
    assert len(files) == n
    assert spark.read.parquet(dst).count() == 50_000
