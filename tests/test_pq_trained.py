"""Trained-PQ codebook proof (VERDICT r11 task 5).

Same honesty frame as ``test_ann_trained.py``: the corpus embeddings are
isotropic, so no codebook can systematically beat another there — the
falsifiable claim lives on a synthetic clustered fixture where the
id-codebook is adversarial (ids 0..k_sub-1 all drawn from ONE cluster,
so its codewords waste capacity on one region) and per-subspace k-means
must recover the real structure. Claims:

1. distortion: the trained codebook's total encode distortion (the
   quantity Lloyd minimizes) is far below the id-codebook's on the
   clustered fixture;
2. recall: ADC ranking under the trained codebook recalls more of the
   exact top-k than under the id-codebook, for queries outside the
   id seed set;
3. determinism: training twice yields bit-identical codebooks, dense
   code ids, and correct shapes;
4. report: the registry entry's row is internally consistent
   (delta = trained − id, bounds hold).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphdb_td2_spark.functions.vectors import cosine_similarity_q
from graphdb_td2_spark.similarity.ann import _topk
from graphdb_td2_spark.similarity.pq import (
    K_SUB,
    M_SUBSPACES,
    SUB_DIM,
    _adc_rank,
    _adc_scored,
    _sq_l2,
    _subvectors,
    pq_codebook,
    pq_encode,
    pq_trained_recall_report,
    train_pq_codebook,
)

N_CLUSTERS = 8
DIM = M_SUBSPACES * SUB_DIM
PER_CLUSTER = 40
K = 5


@pytest.fixture(scope="module")
def clustered(spark):
    """(corpus, queries, truth): 8 direction clusters in 64-dim; ids
    0..K_SUB-1 ALL in cluster 0 (adversarial for the id-codebook);
    queries are 2 per cluster with ids disjoint from the id seeds."""
    rng = np.random.default_rng(12)
    centers = rng.normal(size=(N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for cluster in [0] * K_SUB + [
        c
        for c in range(N_CLUSTERS)
        for _ in range(PER_CLUSTER - (K_SUB if c == 0 else 0))
    ]:
        x = centers[cluster] + 0.25 * rng.normal(size=DIM)
        qe = [int(np.floor(v * 1_000_000)) for v in x]
        rows.append((vid, cluster, qe))
        vid += 1
    corpus = spark.createDataFrame(
        rows, schema="vec_id long, cluster int, qe array<long>"
    ).persist()
    qids = [
        r["vec_id"]
        for c in range(N_CLUSTERS)
        for r in corpus.filter(
            (F.col("cluster") == c) & (F.col("vec_id") >= K_SUB)
        )
        .orderBy("vec_id")
        .limit(2)
        .collect()
    ]
    queries = corpus.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("qe").alias("query_qe")
    )
    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_similarity_q(F.col("query_qe"), F.col("qe")).alias("cosine"),
        )
    )
    truth = {(r["query_id"], r["vec_id"]) for r in _topk(scored, K).collect()}
    return corpus.select("vec_id", "qe"), queries, truth


def _distortion(corpus, codebook) -> int:
    """Total exact-integer encode distortion: Σ per (vec, m) of the
    minimal squared L2 to any codeword — what Lloyd minimizes."""
    subs = _subvectors(corpus, "qe", ["vec_id"])
    return (
        subs.join(
            F.broadcast(codebook.withColumnRenamed("sub", "cw")), "m"
        )
        .select(_sq_l2(F.col("sub"), F.col("cw")).alias("d"), "vec_id", "m")
        .groupBy("vec_id", "m")
        .agg(F.min("d").alias("md"))
        .agg(F.sum("md").alias("total"))
        .collect()[0]["total"]
    )


def _adc_recall(corpus, codebook, queries, truth, k=K) -> float:
    got = {
        (r["query_id"], r["vec_id"])
        for r in _adc_rank(
            _adc_scored(corpus, codebook, 0, queries=queries), k
        ).collect()
    }
    return len(got & truth) / len(truth)


def test_trained_codebook_cuts_distortion_on_clustered_data(spark, clustered):
    corpus, _queries, _truth = clustered
    d_id = _distortion(corpus, pq_codebook(corpus))
    d_tr = _distortion(corpus, train_pq_codebook(spark, corpus))
    # the id-codebook's codewords all come from cluster 0's subvectors;
    # k-means spreads capacity across the real clusters
    assert d_tr < d_id * 0.8, f"trained={d_tr} id={d_id}"


def test_trained_codebook_beats_id_codebook_recall(spark, clustered):
    corpus, queries, truth = clustered
    r_id = _adc_recall(corpus, pq_codebook(corpus), queries, truth)
    r_tr = _adc_recall(
        corpus, train_pq_codebook(spark, corpus), queries, truth
    )
    # measured at seed 12: id 0.0875, trained 0.2625 — a 3x gap; the
    # asserted 2x margin keeps the claim falsifiable without seed-tuning.
    # Absolute recall is LOW by design: 8 codewords/subspace ADC is a
    # coarse quantizer (that's what the refine stage is for).
    assert r_tr > 2 * r_id, f"trained={r_tr:.3f} id={r_id:.3f}"
    assert r_tr >= 0.2


def test_pq_training_is_deterministic(spark, sf_dir):
    from graphdb_td2_spark.similarity.pq import _cached_corpus

    corpus = _cached_corpus(spark, sf_dir)
    a = train_pq_codebook(spark, corpus).collect()
    b = train_pq_codebook(spark, corpus).collect()
    key = lambda r: (r["m"], r["code_id"])  # noqa: E731
    assert sorted(
        [(r["m"], r["code_id"], list(r["sub"])) for r in a]
    ) == sorted([(r["m"], r["code_id"], list(r["sub"])) for r in b])
    # dense ids per subspace, correct shapes
    per_m: dict[int, list[int]] = {}
    for r in a:
        per_m.setdefault(r["m"], []).append(r["code_id"])
        assert len(r["sub"]) == SUB_DIM
    assert set(per_m) == set(range(M_SUBSPACES))
    for ids in per_m.values():
        assert sorted(ids) == list(range(K_SUB))


def test_trained_encode_covers_every_vector(spark, clustered):
    corpus, _q, _t = clustered
    cb = train_pq_codebook(spark, corpus)
    codes = pq_encode(corpus, cb)
    n_vecs = corpus.count()
    assert codes.count() == n_vecs * M_SUBSPACES
    assert (
        codes.filter(
            (F.col("code") < 0) | (F.col("code") >= K_SUB)
        ).count()
        == 0
    )


def test_pq_trained_recall_report_consistency(spark, sf_dir):
    (r,) = pq_trained_recall_report(spark, sf_dir).collect()
    assert r["n_queries"] > 0 and r["k"] == K
    assert 0 <= r["n_hits_id"] <= r["n_queries"] * r["k"]
    assert 0 <= r["n_hits_trained"] <= r["n_queries"] * r["k"]
    assert 0.0 <= r["recall_id"] <= 1.0
    assert 0.0 <= r["recall_trained"] <= 1.0
    assert abs(r["recall_delta"] - (r["recall_trained"] - r["recall_id"])) < 1e-12
