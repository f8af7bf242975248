"""Property-based reference models for the fifth-session operators
(SURVEY.md §5 layer): the KS drift statistic, the Gini stump split
search, and rank-1 ALS — each checked against an independent pure-Python
model over hypothesis-generated inputs. Spark examples use small budgets
(each example is a distributed job)."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from graphdb_td2_spark.functions.scoring import gini_stump_train
from graphdb_td2_spark.operators.drift import ks_value_drift
from graphdb_td2_spark.recs.als import ALS_SCALE, als_rank1_convergence

EV = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
T0 = dt.datetime(2024, 1, 1)


def _py_ks(xs, ys):
    """Exact integer-cross-multiplied two-sample KS (the operator's
    definition)."""
    values = sorted(set(xs) | set(ys))
    na, nb = len(xs), len(ys)
    best = 0
    ca = cb = 0
    for v in values:
        ca += sum(1 for x in xs if x == v)
        cb += sum(1 for y in ys if y == v)
        best = max(best, abs(nb * ca - na * cb))
    return best, na, nb


@settings(max_examples=8, deadline=None)
@given(
    xs=st.lists(st.integers(0, 5), min_size=1, max_size=12),
    ys=st.lists(st.integers(0, 5), min_size=1, max_size=12),
)
def test_ks_matches_python_model(spark, tmp_path_factory, xs, ys):
    rows = [
        (i, T0, 1, "a", float(v), "{}") for i, v in enumerate(xs)
    ] + [
        (1000 + i, T0, 1, "b", float(v), "{}") for i, v in enumerate(ys)
    ]
    d = tmp_path_factory.mktemp("ks")
    spark.createDataFrame(rows, EV).write.parquet(str(d / "events.parquet"))
    (r,) = ks_value_drift(spark, str(d)).collect()
    ks_num, na, nb = _py_ks(xs, ys)
    assert (r["n_a"], r["n_b"], r["ks_num"]) == (na, nb, ks_num)


def _py_stump(vals, labels):
    """Reference split search over distinct cents (the operator's
    objective: minimize weighted Gini, ties to the smallest threshold)."""
    pts = sorted(zip(vals, labels))
    cents = sorted({v for v, _ in pts})
    n = len(pts)
    pos = sum(labels)
    best = None
    for t in cents:
        nl = sum(1 for v, _ in pts if v <= t)
        if nl == n:
            continue
        posl = sum(lb for v, lb in pts if v <= t)
        nr, posr = n - nl, pos - posl
        negl, negr = nl - posl, nr - posr
        sl = (posl * posl + negl * negl) / nl
        sr = (posr * posr + negr * negr) / nr
        g = (n - sl - sr) / n
        key = (g, t)
        if best is None or key < best[0]:
            best = (key, t, nl, posl)
    return best


@settings(max_examples=8, deadline=None)
@given(
    data=st.lists(
        st.tuples(st.integers(0, 8), st.booleans()), min_size=2, max_size=16
    ).filter(lambda d: len({v for v, _ in d}) >= 2)
)
def test_stump_matches_python_model(spark, tmp_path_factory, data):
    rows = [
        (i, T0, 1, "purchase" if lb else "view", float(v), "{}")
        for i, (v, lb) in enumerate(data)
    ]
    d = tmp_path_factory.mktemp("stump")
    spark.createDataFrame(rows, EV).write.parquet(str(d / "events.parquet"))
    (r,) = gini_stump_train(spark, str(d)).collect()
    (_, t, nl, posl) = _py_stump([v * 100 for v, _ in data], [int(lb) for _, lb in data])
    assert r["threshold_cents"] == t
    assert (r["n_left"], r["pos_left"]) == (nl, posl)


def _py_als_rank1(ratings, iters=2, S=ALS_SCALE):
    """Pure-Python mirror of the fixed-point alternating updates."""
    s2 = S * S
    prods = sorted({p for _, p, _ in ratings})
    v = {p: S for p in prods}
    u = {}
    for _ in range(iters):
        num, den = {}, {}
        for c, p, r in ratings:
            num[c] = num.get(c, 0) + r * v[p]
            den[c] = den.get(c, 0) + v[p] * v[p]
        u = {c: (num[c] * s2) // max(den[c], 1) for c in num}
        num, den = {}, {}
        for c, p, r in ratings:
            num[p] = num.get(p, 0) + r * u[c]
            den[p] = den.get(p, 0) + u[c] * u[c]
        v = {p: (num[p] * s2) // max(den[p], 1) for p in num}
    sse = sum(
        ((r * s2 - u[c] * v[p]) ** 2) // s2 for c, p, r in ratings
    )
    return sse, len(ratings)


@settings(max_examples=6, deadline=None)
@given(
    baskets=st.lists(
        st.tuples(st.integers(1, 3), st.integers(10, 13)),
        min_size=1,
        max_size=10,
        unique=True,
    )
)
def test_als_matches_python_model(spark, tmp_path_factory, baskets):
    d = tmp_path_factory.mktemp("als")
    orders = sorted({(c * 100 + p, c) for c, p in baskets})
    spark.createDataFrame(
        [(ok, ck, "O", 1.0, T0, "1-URGENT") for ok, ck in orders],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(d / "orders.parquet"))
    spark.createDataFrame(
        [
            (c * 100 + p, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", T0)
            for c, p in baskets
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, l_quantity double, l_extendedprice double, l_discount double, l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
    ).write.parquet(str(d / "lineitem.parquet"))
    rows = als_rank1_convergence(spark, str(d)).collect()
    ratings = [(c, p, 1) for c, p in baskets]
    want_sse, want_n = _py_als_rank1(ratings)
    final = rows[-1]
    assert final["n_obs"] == want_n
    assert final["sse_fp"] == want_sse
