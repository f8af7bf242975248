"""HyperBall approximate harmonic centrality (graph/hyperball.py):
rho/estimator arithmetic pins and structural laws on a known graph."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from graphdb_td2_spark.graph.hyperball import (
    ALPHA_DEN,
    EST_NUM,
    EST_SCALE,
    M_REG,
    RHO_W,
    _estimates,
    _rho_col,
    _self_sketch,
    hyperball_harmonic,
    rho_case_sql,
)


def test_rho_column_matches_case_sql_on_edge_values(spark):
    """The Spark comparison chain and the generated SQL CASE agree on the
    boundary values (0, 1, powers of two, max 32-bit)."""
    vals = [0, 1, 2, 3, 4, (1 << 31) - 1, 1 << 31, (1 << 32) - 1]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {
        r["x"]: r["rho"]
        for r in df.select("x", _rho_col(F.col("x")).alias("rho")).collect()
    }
    sql = {
        v: duckdb.sql(f"SELECT {rho_case_sql(str(v))} AS r").fetchone()[0]
        for v in vals
    }
    assert got == sql
    # leading-zero semantics: rho(0) = RHO_W, rho(2^31) = 1, rho(1) = 32
    assert got[0] == RHO_W and got[1 << 31] == 1 and got[1] == 32


def test_single_element_estimate_formula(spark):
    """est of a 1-element sketch equals the closed form
    EST_NUM div (ALPHA_DEN · (2^(RHO_W−rho) + 15·2^RHO_W)); exactly one
    of the 16 wide registers is touched."""
    state = _self_sketch(spark.createDataFrame([(7,)], "node long"))
    row = state.collect()[0]
    regs = [row[f"m{i}"] for i in range(M_REG)]
    touched = [m for m in regs if m > 0]
    assert len(touched) == 1
    est = _estimates(state).collect()[0]["est"]
    s = (1 << (RHO_W - touched[0])) + (M_REG - 1) * (1 << RHO_W)
    assert est == EST_NUM // (ALPHA_DEN * s)


def test_harmonic_monotone_and_ball_reasonable(spark):
    """On a 5-clique: registers only grow, so per-round increments are
    non-negative; after 1 round every vertex's ball is the whole clique,
    so all five final estimates are identical."""
    edges = [(a, b) for a in range(1, 6) for b in range(1, 6) if a != b]
    adj = spark.createDataFrame(edges, "src long, dst long")
    harmonic, est = hyperball_harmonic(adj, rounds=2)
    h = {r["node"]: r["harmonic_est_fp"] for r in harmonic.collect()}
    e = {r["node"]: r["est"] for r in est.collect()}
    assert set(h) == {1, 2, 3, 4, 5}
    assert all(v >= 0 for v in h.values())
    assert len(set(e.values())) == 1  # identical converged sketches
    # raw m=16 HLL on 5 elements: order of magnitude, not garbage
    assert 1 * EST_SCALE <= e[1] <= 20 * EST_SCALE


def test_error_report_entries(spark, sf_dir):
    from graphdb_td2_spark.graph.hyperball import harmonic_approx_error_report

    rows = harmonic_approx_error_report(spark, sf_dir).collect()
    assert len(rows) == 8
    for r in rows:
        assert r["true_ball"] >= 1
        assert r["abs_err_milli"] == abs(
            r["est_ball_milli"] - r["true_ball"] * EST_SCALE
        )
        assert r["rel_err_pm"] == r["abs_err_milli"] // r["true_ball"]


def test_neighborhood_function_laws(spark, sf_dir):
    """N(t) is monotone non-decreasing (registers only grow), N(0) is the
    self-ball baseline, and the p90 flag is exact-integer consistent."""
    from graphdb_td2_spark.graph.hyperball import graph_neighborhood_function

    rows = graph_neighborhood_function(spark, sf_dir).collect()
    assert [r["t"] for r in rows] == [0, 1, 2, 3, 4]
    sums = [r["sum_ball_est_milli"] for r in rows]
    assert sums == sorted(sums)
    assert rows[-1]["reaches_p90"]  # N(4) >= 0.9 N(4) always
    for r in rows:
        assert r["reaches_p90"] == (r["sum_ball_est_milli"] * 10 >= sums[-1] * 9)
