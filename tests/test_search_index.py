"""Materialized search index (search/index.py): the index path must be
bit-identical to the direct path, and the landed co-bucketed tables must
join exchange-free."""

from __future__ import annotations

import pytest

from graphdb_td2_spark.search import bm25_doc_topk
from graphdb_td2_spark.search.index import (
    bm25_topk_from_index,
    build_search_index,
    drop_search_index,
)


@pytest.fixture(scope="module")
def built_index(spark, sf_dir):
    prefix = "t_search_idx"
    build_search_index(spark, sf_dir, prefix=prefix)
    yield prefix
    drop_search_index(spark, prefix)


def test_index_path_equals_direct_path(spark, sf_dir, built_index):
    direct = [tuple(r) for r in bm25_doc_topk(spark, sf_dir).collect()]
    from_idx = [tuple(r) for r in bm25_topk_from_index(spark, built_index).collect()]
    assert from_idx == direct


def test_postings_df_join_is_exchange_free(spark, built_index):
    postings = spark.table(f"{built_index}_postings")
    df_tbl = spark.table(f"{built_index}_df")
    joined = postings.join(df_tbl, "token")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan


def test_index_is_self_contained(spark, built_index):
    # the query path reads only the four index tables — re-running after a
    # second build overwrite still matches itself (idempotent build)
    first = [tuple(r) for r in bm25_topk_from_index(spark, built_index).collect()]
    second = [tuple(r) for r in bm25_topk_from_index(spark, built_index).collect()]
    assert first == second
