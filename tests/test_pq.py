"""Product-quantization ANN (similarity/pq.py): index completeness, the
lossless-codeword exactness property, and a NumPy reference on a small
fixture."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from graphdb_td2_spark.functions.vectors import quantize_embedding
from graphdb_td2_spark.io import read_table
from graphdb_td2_spark.similarity.pq import (
    K_SUB,
    M_SUBSPACES,
    SUB_DIM,
    pq_adc_topk,
    pq_codebook,
    pq_encode,
)


def _corpus(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"])
    return emb.select("vec_id", quantize_embedding(F.col("embedding")).alias("qe"))


def test_index_is_complete_and_codewords_encode_to_themselves(spark, sf_dir):
    corpus = _corpus(spark, sf_dir)
    n = corpus.count()
    cb = pq_codebook(corpus)
    assert cb.count() == M_SUBSPACES * K_SUB
    codes = pq_encode(corpus, cb)
    # every vector gets exactly M codes, each in [0, K_SUB)
    assert codes.count() == n * M_SUBSPACES
    assert codes.filter((F.col("code") < 0) | (F.col("code") >= K_SUB)).count() == 0
    # a codebook vector's subvectors are distance-0 to their own codeword,
    # so it must encode to itself in every subspace
    self_codes = codes.filter(F.col("vec_id") < K_SUB)
    assert self_codes.filter(F.col("code") != F.col("vec_id")).count() == 0


def test_adc_is_exact_between_codebook_vectors(spark, sf_dir):
    """For query and candidate both inside the codebook, quantization is
    lossless, so the ADC distance equals the true squared L2."""
    n = _corpus(spark, sf_dir).count()
    rows = pq_adc_topk(spark, sf_dir, k=n, n_queries=K_SUB).collect()
    vecs = {
        r["vec_id"]: np.array(r["qe"], dtype=np.int64)
        for r in _corpus(spark, sf_dir).filter(F.col("vec_id") < K_SUB).collect()
    }
    checked = 0
    for r in rows:
        if r["vec_id"] in vecs and r["query_id"] in vecs:
            d = vecs[r["query_id"]] - vecs[r["vec_id"]]
            assert r["adc_dist"] == int((d * d).sum())
            checked += 1
    assert checked > 0


def test_matches_numpy_reference_end_to_end(spark, sf_dir):
    """Full PQ (codebook → encode → ADC → top-k) against a NumPy reference
    over the real corpus slice."""
    corpus_rows = _corpus(spark, sf_dir).collect()
    X = {r["vec_id"]: np.array(r["qe"], dtype=np.int64) for r in corpus_rows}
    cb = {
        (m, cid): X[cid][m * SUB_DIM : (m + 1) * SUB_DIM]
        for m in range(M_SUBSPACES)
        for cid in range(K_SUB)
    }

    def encode(v):
        out = []
        for m in range(M_SUBSPACES):
            sub = v[m * SUB_DIM : (m + 1) * SUB_DIM]
            dists = [(int(((sub - cb[(m, c)]) ** 2).sum()), c) for c in range(K_SUB)]
            out.append(min(dists)[1])
        return out

    codes = {vid: encode(v) for vid, v in X.items()}
    got = pq_adc_topk(spark, sf_dir, k=3, n_queries=2).collect()
    for r in got:
        q = X[r["query_id"]]
        want = 0
        for m, c in enumerate(codes[r["vec_id"]]):
            sub = q[m * SUB_DIM : (m + 1) * SUB_DIM]
            want += int(((sub - cb[(m, c)]) ** 2).sum())
        assert r["adc_dist"] == want
    # ranks are 1..3 per query, ascending distance
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["adc_dist"]))
    for ranked in by_q.values():
        ranked.sort()
        assert [rk for rk, _ in ranked] == [1, 2, 3]
        assert [d for _, d in ranked] == sorted(d for _, d in ranked)
