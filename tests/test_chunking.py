"""Overlapping-window chunking (functions/chunking.py): span laws checked
against a pure-Python reference on the real corpus, plus fingerprint
integrity (the md5 covers chunk CONTENT, so reconstruction is testable)."""

from __future__ import annotations

import hashlib

import pytest

from graphdb_td2_spark.functions.chunking import CHUNK_STRIDE, CHUNK_TOKENS, doc_chunks
from graphdb_td2_spark.io import read_table


def _reference_chunks(text: str, w: int, s: int):
    toks = text.strip().lower().split()
    n = len(toks)
    n_chunks = 1 if n <= w else (n - w + s - 1) // s + 1
    out = []
    for i in range(n_chunks):
        start = i * s + 1
        end = min(start + w - 1, n)
        span = " ".join(toks[start - 1 : end])
        out.append(
            (i, start, end, end - start + 1, hashlib.md5(span.encode()).hexdigest())
        )
    return out


def test_chunks_match_python_reference(spark, sf_dir):
    docs = {
        r["doc_id"]: r["text"]
        for r in read_table(spark, sf_dir, "documents", ["doc_id", "text"]).collect()
    }
    got: dict[int, list] = {}
    for r in doc_chunks(spark, sf_dir).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["start_tok"], r["end_tok"], r["n_chunk_tokens"], r["chunk_md5"])
        )
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        assert got[doc_id] == _reference_chunks(text, CHUNK_TOKENS, CHUNK_STRIDE), doc_id


def test_chunk_tiling_laws(spark, sf_dir):
    """Chunks tile the token sequence: first starts at 1, consecutive starts
    differ by the stride, the last chunk ends at the final token, and every
    boundary gap is covered by the overlap."""
    rows = doc_chunks(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        assert chunks[0]["start_tok"] == 1
        for a, b in zip(chunks, chunks[1:]):
            assert b["start_tok"] - a["start_tok"] == CHUNK_STRIDE
            # overlap: next chunk starts before (or right after) this one ends
            assert b["start_tok"] <= a["end_tok"] + 1
        for c in chunks:
            assert c["n_chunk_tokens"] == c["end_tok"] - c["start_tok"] + 1
            assert c["n_chunk_tokens"] <= CHUNK_TOKENS
        # the only chunk allowed to not span a full window is the last one
        for c in chunks[:-1]:
            assert c["n_chunk_tokens"] == CHUNK_TOKENS or len(chunks) == 1


def test_invalid_window_rejected(spark, sf_dir):
    with pytest.raises(ValueError):
        doc_chunks(spark, sf_dir, window=32, stride=0)
    with pytest.raises(ValueError):
        doc_chunks(spark, sf_dir, window=32, stride=33)


def test_span_corruption_rate_and_span_math(spark, sf_dir):
    from graphdb_td2_spark.functions.chunking import (
        SPAN_LEN,
        span_corruption_stats,
    )

    rows = span_corruption_stats(spark, sf_dir).collect()
    assert rows
    total = sum(r["n_tokens"] for r in rows)
    masked = sum(r["n_masked"] for r in rows)
    # md5 uniformity: corpus-level mask rate within 2 points of 15%
    assert abs(masked / total - 0.15) < 0.02
    for r in rows:
        # every span contributes at most SPAN_LEN masked tokens
        assert r["n_masked"] <= r["n_spans"] * SPAN_LEN
        assert r["n_spans"] <= r["n_masked"]  # and at least 1 each
