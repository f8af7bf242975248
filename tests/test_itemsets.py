"""A-priori frequent triples (recs/itemsets.py): hand-built baskets +
brute-force cross-check on the corpus slice."""

from __future__ import annotations

from itertools import combinations

from graphdb_td2_spark.recs.itemsets import _baskets, frequent_triples

LI = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
    "l_returnflag string, l_linestatus string, l_shipdate timestamp"
)


def test_hand_built_baskets(spark, tmp_path):
    def item(o, p):
        return (o, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", None)

    rows = []
    # {1,2,3} appears in orders 1-3 (support 3); {1,2,4} only twice
    for o in (1, 2, 3):
        rows += [item(o, 1), item(o, 2), item(o, 3)]
    for o in (4, 5):
        rows += [item(o, 1), item(o, 2), item(o, 4)]
    df = spark.createDataFrame(rows, LI)
    d = tmp_path / "fx"
    df.write.parquet(str(d / "lineitem.parquet"))
    got = [tuple(r) for r in frequent_triples(spark, str(d)).collect()]
    assert got == [(1, 2, 3, 3), (1, 2, 4, 2)]


def test_matches_bruteforce_on_corpus(spark, sf_dir):
    baskets = {}
    for r in _baskets(spark, sf_dir).collect():
        baskets.setdefault(r["order_id"], set()).add(r["item"])
    counts: dict[tuple, int] = {}
    for items in baskets.values():
        for trip in combinations(sorted(items), 3):
            counts[trip] = counts.get(trip, 0) + 1
    want = sorted(
        ((s, *t) for t, s in counts.items() if s >= 2),
        key=lambda x: (-x[0], x[1], x[2], x[3]),
    )[:20]
    got = [
        (r["support"], r["item_a"], r["item_b"], r["item_c"])
        for r in frequent_triples(spark, sf_dir).collect()
    ]
    assert got == want


def test_order_size_histogram_accounting(spark, sf_dir):
    from graphdb_td2_spark.io import read_table
    from graphdb_td2_spark.recs.itemsets import order_size_histogram

    rows = order_size_histogram(spark, sf_dir).collect()
    n_orders = (
        read_table(spark, sf_dir, "lineitem", ["l_orderkey"]).distinct().count()
    )
    assert sum(r["n_orders"] for r in rows) == n_orders
    assert all(r["n_items"] >= 1 for r in rows)


def test_repurchase_cycle_sorted(spark, sf_dir):
    from graphdb_td2_spark.recs.itemsets import repurchase_cycle_topk

    rows = repurchase_cycle_topk(spark, sf_dir).collect()
    assert rows
    p50s = [r["p50_gap_days"] for r in rows]
    assert p50s == sorted(p50s)
    assert all(r["n_gaps"] >= 2 and r["p50_gap_days"] >= 0 for r in rows)
