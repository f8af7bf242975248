"""Multimodal plumbing tests: schema, Arrow batch shape, stub seam,
JVM-only frame sampling, and feature correctness vs direct computation."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from graphdb_td2_spark.io import read_table
from graphdb_td2_spark.multimodal import (
    FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    decode_media,
    frame_sample,
    media_features,
    multimodal_feature_stats,
    synthesize_media,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = read_table(spark, SF_DIR, "documents", ["doc_id", "text", "source", "lang"])
    return synthesize_media(docs.limit(50))


def _names_types(schema):
    return [(f.name, f.dataType) for f in schema.fields]


def test_media_schema_is_typed(media):
    assert _names_types(media.schema) == _names_types(MEDIA_SCHEMA)


def test_features_match_direct_computation(spark, media):
    feats = media_features(media)
    assert feats.schema == FEATURE_SCHEMA
    got = {r.media_id: (r.n_bytes, r.digest) for r in feats.collect()}
    for r in media.collect():
        payload = bytes(r.payload)
        assert got[r.media_id] == (len(payload), hashlib.md5(payload).hexdigest())
        assert r.meta.n_bytes == len(payload)


def test_decode_fake_is_deterministic_and_real_is_stubbed(media):
    a = {r.media_id: r.samples for r in decode_media(media).collect()}
    b = {r.media_id: r.samples for r in decode_media(media).collect()}
    assert a == b
    assert all(len(s) <= 16 and all(0.0 <= x <= 255.0 for x in s) for s in a.values())
    with pytest.raises(NotImplementedError):
        decode_media(media, fake=False)


def test_frame_sample_jvm_only(media):
    frames = frame_sample(media, frame_bytes=32, stride=32)
    rows = frames.collect()
    assert rows, "expected at least one video frame"
    by_media: dict[int, list] = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    for mid, rs in by_media.items():
        idxs = sorted(r.frame_idx for r in rs)
        assert idxs == list(range(len(idxs)))  # contiguous frame indices
        for r in rs:
            assert len(bytes(r.frame)) <= 32
            assert r.frame_digest == hashlib.md5(bytes(r.frame)).hexdigest()
    # no Python stage: the plan should not contain a PythonUDF node
    assert "Python" not in frames._jdf.queryExecution().executedPlan().toString()


def test_feature_stats_totals(spark):
    stats = multimodal_feature_stats(spark, SF_DIR).collect()
    kinds = [r.kind for r in stats]
    assert kinds == sorted(kinds) and set(kinds) == {"image", "audio", "video"}
    docs = read_table(spark, SF_DIR, "documents", ["text"])
    total = docs.select(
        F.sum(F.length(F.encode("text", "UTF-8"))).alias("s")
    ).collect()[0].s
    assert sum(r.total_bytes for r in stats) == total
    assert sum(r.n_media for r in stats) == docs.count()
