"""Driver-contract tests for __spark_entry__.py."""

from __future__ import annotations

import __spark_entry__ as entry_mod

def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["product_id", "score", "reason"]


def test_every_query_has_an_oracle():
    # since round 2 the iterative graph algorithms are oracle-checkable too
    # (integer fixed-point formulation, unrolled-CTE DuckDB twin)
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) == set(q)


def test_queries_run_at_smoke_sf(spark, sf_dir):
    # run a representative cross-section end-to-end (full set is covered by
    # tools/oracle_check.py and the driver's t2 harness)
    q = entry_mod.queries()
    for name in (
        "recs_product_cooccurrence",
        "graph_edge_counts",
        "pricing_summary",
        "sessionize",
        "minhash_lsh_pairs",
        "ann_topk_bruteforce",
    ):
        df = q[name](spark, sf_dir)
        assert df.count() >= 0, name
