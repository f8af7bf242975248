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
    codec_available,
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


def test_decode_fake_is_deterministic_and_missing_codecs_raise(media):
    a = {r.media_id: r.samples for r in decode_media(media).collect()}
    b = {r.media_id: r.samples for r in decode_media(media).collect()}
    assert a == b
    assert all(len(s) <= 16 and all(0.0 <= x <= 255.0 for x in s) for s in a.values())
    # every known kind has a vendored baseline decoder; a kind with no
    # decoder at all still fails fast, driver-side
    assert all(codec_available(k) for k in ("image", "audio", "video"))
    with pytest.raises(NotImplementedError, match="hologram"):
        decode_media(media, fake=False, kinds=("hologram",))


def _wav_bytes(samples: list[int], width: int = 2) -> bytes:
    import io
    import struct
    import wave

    fmt = {1: "B", 2: "h", 4: "i"}
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(width)
        w.setframerate(8000)
        if width == 3:  # 24-bit: hand-packed little-endian triples
            w.writeframes(
                b"".join(v.to_bytes(3, "little", signed=True) for v in samples)
            )
        else:
            w.writeframes(struct.pack(f"<{len(samples)}{fmt[width]}", *samples))
    return buf.getvalue()


def test_real_audio_decode_via_stdlib_wave(spark):
    """The real-codec path executes for audio in ANY container: stdlib
    ``wave`` parses genuine WAV payloads and the decoded samples must be
    the PCM values that went in."""
    pcm = {1: [100, -200, 300, -400], 2: list(range(16)), 3: [0] * 20}
    rows = [
        (mid, "audio", _wav_bytes(v), (len(v) * 2, "t", "en"))
        for mid, v in pcm.items()
    ] + [(9, "image", b"\x00" * 8, (8, "t", "en"))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {
        r.media_id: r.samples
        for r in decode_media(media, fake=False, kinds=("audio",)).collect()
    }
    assert set(out) == set(pcm)  # non-audio rows filtered, not mis-decoded
    for mid, v in pcm.items():
        assert out[mid] == [float(x) for x in v[:16]]


def test_audio_decode_widths_32bit_ok_24bit_rejected():
    """Sample widths 1/2/4 decode to their true PCM values; 24-bit (width
    3) decodes to null (filtered) instead of being byte-wise mis-decoded
    or failing the whole job on one payload — the 'filtered or decoded,
    never silently wrong' contract."""
    from graphdb_td2_spark.multimodal import _decode_real

    assert _decode_real("audio", _wav_bytes([7, 250, 0], width=1)) == [
        7.0, 250.0, 0.0,
    ]
    assert _decode_real("audio", _wav_bytes([1_000_000, -2_000_000], width=4)) == [
        1_000_000.0, -2_000_000.0,
    ]
    assert _decode_real("audio", _wav_bytes([1, 2, 3], width=3)) is None


def _pgm_bytes(pixels: list[int], width: int, height: int) -> bytes:
    header = f"P5\n# test fixture\n{width} {height}\n255\n".encode()
    return header + bytes(pixels)


def test_real_image_decode_via_builtin_pgm(spark):
    """The vendored PGM/P5 decoder runs the real-codec image path on a
    bare box (no Pillow): genuine binary-PGM payloads decode to the pixel
    values that went in; 16-bit PGM is recognized-but-unsupported →
    null."""
    px = list(range(64))
    media = spark.createDataFrame(
        [
            (1, "image", _pgm_bytes(px, 8, 8), (70, "t", "en")),
            (2, "image", b"P5 2 2 65535 " + b"\x00" * 8, (21, "t", "en")),
            (3, "audio", b"\x00" * 8, (8, "t", "en")),
        ],
        MEDIA_SCHEMA,
    )
    out = {
        r.media_id: r.samples
        for r in decode_media(media, fake=False, kinds=("image",)).collect()
    }
    assert set(out) == {1, 2}  # non-image rows filtered, not mis-decoded
    assert out[1] == [float(v) for v in px[:16]]
    assert out[2] is None  # maxval > 255: filtered, never byte-mis-decoded


def _avi_bytes(frame: bytes) -> bytes:
    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + len(body).to_bytes(4, "little") + body + (
            b"\x00" if len(body) % 2 else b""
        )

    movi = chunk(b"LIST", b"movi" + chunk(b"00db", frame))
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", b"\x00" * 56))
    body = b"AVI " + hdrl + movi
    return chunk(b"RIFF", body)


def test_real_video_decode_via_builtin_avi(spark):
    """The vendored RIFF-AVI walker runs the real-codec video path on a
    bare box (no PyAV): the first raw ``00db`` frame's bytes come back as
    samples; a movi-less RIFF decodes to null."""
    frame = bytes(range(20))
    media = spark.createDataFrame(
        [
            (1, "video", _avi_bytes(frame), (len(frame), "t", "en")),
            (2, "video", b"RIFF\x04\x00\x00\x00AVI ", (4, "t", "en")),
        ],
        MEDIA_SCHEMA,
    )
    out = {
        r.media_id: r.samples
        for r in decode_media(media, fake=False, kinds=("video",)).collect()
    }
    assert out[1] == [float(v) for v in frame[:16]]
    assert out[2] is None


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


def test_pool_resize_matches_python_reference(spark, media):
    from graphdb_td2_spark.multimodal import N_POOLS, pool_resize

    sample = media.limit(20)
    got = {
        (r["media_id"], r["pool_idx"]): (r["n_bytes"], r["pool_mean"])
        for r in pool_resize(sample).collect()
    }
    for row in sample.collect():
        arr = bytes(row["payload"])
        n = len(arr)
        for p in range(N_POOLS):
            lo, hi = p * n // N_POOLS, (p + 1) * n // N_POOLS
            want = sum(arr[lo:hi]) // (hi - lo) if hi > lo else None
            assert got[(row["media_id"], p)] == (n, want)


def test_pool_resize_short_and_empty_payloads(spark):
    """Payloads shorter than the pool count (and empty ones) must yield
    NULL for the empty pools, not crash the reduceat path."""
    from graphdb_td2_spark.multimodal import N_POOLS, pool_resize

    rows = [(1, "image", bytearray(b"abc"), (3, "s", "en")),
            (2, "audio", bytearray(b""), (0, "s", "en"))]
    df = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, "
        "meta struct<n_bytes:long, source:string, lang:string>",
    )
    out = {(r["media_id"], r["pool_idx"]): r["pool_mean"]
           for r in pool_resize(df).collect()}
    assert len(out) == 2 * N_POOLS
    # media 1: bytes a,b,c land in pools 5,10,15 (p*3//16 boundaries)
    non_null_1 = {p for p in range(N_POOLS) if out[(1, p)] is not None}
    assert non_null_1 == {5, 10, 15}
    assert out[(1, 5)] == ord("a") and out[(1, 15)] == ord("c")
    assert all(out[(2, p)] is None for p in range(N_POOLS))


def test_media_inventory_partitions_docs(spark, sf_dir):
    from graphdb_td2_spark.io import read_table
    from graphdb_td2_spark.multimodal import media_inventory

    rows = media_inventory(spark, sf_dir).collect()
    assert {r["kind"] for r in rows} == {"image", "audio", "video"}
    n_docs = read_table(spark, sf_dir, "documents", ["doc_id"]).count()
    assert sum(r["n_items"] for r in rows) == n_docs
    for r in rows:
        assert r["min_bytes"] <= r["max_bytes"] <= r["total_bytes"]
