"""Offline recommendation backtest (recs/backtest.py) — hand-computed
fixture plus corpus accounting invariants."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq

from graphdb_td2_spark.io import read_table
from graphdb_td2_spark.recs.backtest import (
    HR_FP,
    backtest_cutoff,
    recs_backtest_hitrate,
)


def _write_fixture(tmp_path):
    d = tmp_path / "bt"
    d.mkdir()
    ts = lambda day: datetime.datetime(2020, 1, 1) + datetime.timedelta(days=day)  # noqa: E731
    orders = pa.table(
        {
            "o_orderkey": [1, 2, 3, 4],
            "o_custkey": [1, 1, 2, 2],
            "o_orderdate": [ts(0), ts(1), ts(1), ts(100)],
        }
    )
    lineitem = pa.table(
        {
            "l_orderkey": [1, 1, 2, 2, 3, 4],
            "l_partkey": [101, 102, 101, 102, 101, 102],
        }
    )
    pq.write_table(orders, d / "orders.parquet")
    pq.write_table(lineitem, d / "lineitem.parquet")
    return str(d)


def test_backtest_fixture_hand_computed(spark, tmp_path):
    """Train (≤ day 80): O1,O2 teach edge (101,102) weight 2; customer 2
    owns only 101. Test: O4 buys 102 — exactly the top rec → 100%."""
    d = _write_fixture(tmp_path)
    assert backtest_cutoff(spark, d) == datetime.date(2020, 1, 1) + datetime.timedelta(days=80)
    row = recs_backtest_hitrate(spark, d).collect()[0]
    assert row["n_train_orders"] == 3
    assert row["n_test_orders"] == 1
    assert row["n_eval_customers"] == 1
    assert row["n_hit_customers"] == 1
    assert row["hit_rate_fp"] == HR_FP


def test_backtest_corpus_invariants(spark, sf_dir):
    row = recs_backtest_hitrate(spark, sf_dir).collect()[0]
    n_orders = read_table(spark, sf_dir, "orders", ["o_orderkey"]).count()
    assert row["n_train_orders"] + row["n_test_orders"] == n_orders
    assert row["n_train_orders"] > row["n_test_orders"]  # 4/5 split
    assert 0 <= row["n_hit_customers"] <= row["n_eval_customers"]
    if row["n_eval_customers"]:
        assert (
            row["hit_rate_fp"]
            == row["n_hit_customers"] * HR_FP // row["n_eval_customers"]
        )


def test_by_strategy_rows_and_cooc_consistency(spark, sf_dir):
    """5 strategies, each internally consistent; the cooccurrence row
    reproduces recs_backtest_hitrate's eval/hit counts exactly (same
    scorer, same protocol)."""
    from graphdb_td2_spark.recs.backtest import (
        recs_backtest_by_strategy,
        recs_backtest_hitrate,
    )

    rows = {r["strategy"]: r for r in recs_backtest_by_strategy(spark, sf_dir).collect()}
    assert sorted(rows) == [
        "als", "brand_fallback", "cooccurrence", "ivm_cooccurrence", "trending",
    ]
    for r in rows.values():
        assert 0 <= r["n_hit_customers"] <= r["n_eval_customers"]
        if r["n_eval_customers"]:
            assert r["hit_rate_fp"] == (
                r["n_hit_customers"] * 1_000_000 // r["n_eval_customers"]
            )
    single = recs_backtest_hitrate(spark, sf_dir).collect()[0]
    cooc = rows["cooccurrence"]
    assert cooc["n_eval_customers"] == single["n_eval_customers"]
    assert cooc["n_hit_customers"] == single["n_hit_customers"]
    assert cooc["hit_rate_fp"] == single["hit_rate_fp"]
