"""IVF-PQ (similarity/pq.py:ann_topk_ivfpq): cell containment and
ADC-consistency with the unpruned PQ scorer."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_td2_spark.functions.vectors import quantize_embedding
from graphdb_td2_spark.io import read_table
from graphdb_td2_spark.similarity.ann import N_CELLS, _assign_cells
from graphdb_td2_spark.similarity.pq import ann_topk_ivfpq, pq_adc_topk


def test_candidates_share_the_query_cell_and_adc_matches_pq(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding"])
    corpus = emb.select("vec_id", quantize_embedding(F.col("embedding")).alias("qe"))
    centroids = corpus.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cent_id"), F.col("qe").alias("cent_qe")
    )
    cell_of = {
        r["vec_id"]: r["cell"]
        for r in _assign_cells(corpus, centroids).select("vec_id", "cell").collect()
    }

    got = ann_topk_ivfpq(spark, sf_dir).collect()
    assert got
    for r in got:
        assert cell_of[r["vec_id"]] == cell_of[r["query_id"]]

    # the cell prune changes WHICH candidates are scored, never their ADC
    # distance: every (query, candidate) also scored by the uncapped PQ
    # ranker carries the identical integer distance
    n = corpus.count()
    pq_all = {
        (r["query_id"], r["vec_id"]): r["adc_dist"]
        for r in pq_adc_topk(spark, sf_dir, k=n).collect()
    }
    for r in got:
        assert pq_all[(r["query_id"], r["vec_id"])] == r["adc_dist"]
