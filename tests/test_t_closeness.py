"""t-closeness audit (round 10): the per-QI max EMD must match an
independent pure-Python recomputation over the same band rule, and obey
the statistic's bounds (0 ≤ t_fp ≤ T_SCALE; a single-group QI would be
exactly the global distribution → 0)."""

from __future__ import annotations

from collections import Counter, defaultdict

from graphdb_td2_spark.functions.governance import (
    T_SCALE,
    t_closeness_report,
)
from graphdb_td2_spark.io import read_table


def _band(acctbal: float) -> int:
    import math

    return math.floor(math.floor(acctbal * 100 + 0.5) / 100000)


def _max_t_fp(rows, key) -> int:
    glob = Counter(_band(r["c_acctbal"]) for r in rows)
    bands = sorted(glob)
    n_all = sum(glob.values())
    groups = defaultdict(Counter)
    for r in rows:
        groups[key(r)][_band(r["c_acctbal"])] += 1
    worst = 0
    for counts in groups.values():
        n_g = sum(counts.values())
        cum_g = cum_all = sdiff = 0
        for b in bands:
            cum_g += counts.get(b, 0)
            cum_all += glob[b]
            sdiff += abs(cum_g * n_all - cum_all * n_g)
        t_fp = sdiff * T_SCALE // (n_g * n_all * max(len(bands) - 1, 1))
        worst = max(worst, t_fp)
    return worst


def test_max_t_matches_python_reference(spark, sf_dir):
    rows = read_table(
        spark, sf_dir, "customer",
        ["c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"],
    ).collect()
    got = {
        r["quasi_identifier"]: r
        for r in t_closeness_report(spark, sf_dir).collect()
    }
    expected = {
        "nation": _max_t_fp(rows, lambda r: str(r["c_nationkey"])),
        "segment": _max_t_fp(rows, lambda r: r["c_mktsegment"]),
        "nation+segment": _max_t_fp(
            rows, lambda r: (r["c_nationkey"], r["c_mktsegment"])
        ),
    }
    for qi, exp in expected.items():
        assert got[qi]["max_t_fp"] == exp
        assert 0 <= got[qi]["max_t_fp"] <= T_SCALE
        # a coarser partition can't have MORE groups than the finer one
    assert got["nation+segment"]["n_groups"] >= got["nation"]["n_groups"]
