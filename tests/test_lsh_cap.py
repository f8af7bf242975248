"""Adversarial LSH bucket-cap tests: a duplicate-heavy corpus (mirrored
boilerplate — the normal case at 100 TB) must NOT make the band-bucket
self-join quadratic. ``capped_band_buckets`` drops (band, bucket) groups
above BUCKET_CAP; mass-identical members are exact-dedup's job."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_td2_spark.dedup.minhash import (
    BUCKET_CAP,
    band_buckets,
    capped_band_buckets,
    minhash_signatures,
)


def _pairs(buckets):
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
        .count()
    )


def _adversarial_docs(spark, n_dup=200):
    boiler = (
        "terms of service apply to all users of this site please read "
        "carefully before proceeding with registration and checkout"
    )
    rows = [(i, boiler) for i in range(n_dup)]
    # two genuinely-near (not identical) docs: long shared prefix, small edit
    base = "the quick brown fox jumps over the lazy dog " * 8
    rows.append((9001, base + "near the riverbank today"))
    rows.append((9002, base + "near the riverbank tonight"))
    # unrelated singletons
    rows.append((9100, "completely different text about spark partitions"))
    rows.append((9101, "yet another unrelated document on graph traversal"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_degenerate_bucket_pairs_are_bounded(spark):
    docs = _adversarial_docs(spark)
    raw = band_buckets(minhash_signatures(docs))
    capped = capped_band_buckets(raw)

    n_raw = _pairs(raw).count()
    n_capped = _pairs(capped).count()
    # uncapped: the 200 identical docs alone make C(200,2) = 19900 pairs
    assert n_raw >= 19900
    # capped: every surviving bucket has <= CAP members, so the global
    # bound is n_kept_buckets * C(cap, 2); here the degenerate cluster is
    # gone entirely and only the small clusters remain
    assert n_capped <= BUCKET_CAP * (BUCKET_CAP - 1) // 2
    assert n_capped < 100

    # the planted near-dup pair survives (its buckets are size 2)
    kept = {(r["x"], r["y"]) for r in _pairs(capped).collect()}
    assert (9001, 9002) in kept
    # no pair has both endpoints inside the degenerate cluster
    assert not any(x < 9000 and y < 9000 for x, y in kept)


def test_cap_is_noop_on_normal_buckets(spark):
    """Buckets at or below the cap pass through untouched — on the real
    corpus (max observed bucket size 4) the capped and raw candidate sets
    are identical, which is why the driver CORRECTNESS rows stay green."""
    docs = _adversarial_docs(spark, n_dup=3)  # 3 <= cap: nothing dropped
    raw = band_buckets(minhash_signatures(docs))
    capped = capped_band_buckets(raw)
    assert sorted(map(tuple, raw.collect())) == sorted(map(tuple, capped.collect()))
