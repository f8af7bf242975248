"""Property tests for the engine-exact percentile and prefix-sum
modules: the two-phase/histogram formulations must be BIT-IDENTICAL to
their naive single-partition counterparts on arbitrary inputs — that is
the whole contract (same values, scale-safe plan)."""

from __future__ import annotations

import random

from pyspark.sql import Window, functions as F


def _pctl_reference(values: list[int], num_mult: int, den: int) -> int:
    """The exact integer numerator den·lo + (hi−lo)·rem for
    p = num_mult/den over ``values`` (the textbook interpolated
    percentile, float-free)."""
    s = sorted(values)
    n = len(s)
    num = num_mult * (n - 1)
    lo_rk, rem = divmod(num, den)
    hi_rk = lo_rk + (1 if rem else 0)
    return den * s[lo_rk] + (s[hi_rk] - s[lo_rk]) * rem


def test_percentile_numerators_match_reference(spark):
    from graphdb_td2_spark.operators.percentiles import percentile_numerators

    rng = random.Random(7)
    rows = []
    expected = {}
    for g in range(6):
        n = rng.randint(1, 40)
        vals = [rng.randint(-500, 500) for _ in range(n)]
        rows += [(g, v) for v in vals]
        expected[g] = {
            "p25n": _pctl_reference(vals, 1, 4),
            "p50n": _pctl_reference(vals, 1, 2),
            "p90n": _pctl_reference(vals, 9, 10),
            "n": n,
        }
    df = spark.createDataFrame(rows, "g int, v long")
    got = {
        r["g"]: r.asDict()
        for r in percentile_numerators(
            df, ["g"], "v", [(1, 4, "p25n"), (1, 2, "p50n"), (9, 10, "p90n")]
        ).collect()
    }
    for g, exp in expected.items():
        for k, v in exp.items():
            assert got[g][k] == v, (g, k, got[g], exp)


def test_percentile_matches_spark_builtin_as_float(spark):
    """Against Spark's own percentile: num/den must equal the builtin to
    float tolerance (the builtin's last-ulp wobble is exactly what the
    numerator formulation removes, so exact equality is NOT required)."""
    from graphdb_td2_spark.operators.percentiles import percentile_numerators

    rng = random.Random(11)
    rows = [(rng.randint(0, 3), rng.randint(0, 10_000)) for _ in range(500)]
    df = spark.createDataFrame(rows, "g int, v long")
    ours = {
        r["g"]: r["p75n"] / 4.0
        for r in percentile_numerators(df, ["g"], "v", [(3, 4, "p75n")]).collect()
    }
    builtin = {
        r["g"]: r["p"]
        for r in df.groupBy("g").agg(F.expr("percentile(v, 0.75)").alias("p")).collect()
    }
    for g in builtin:
        assert abs(ours[g] - builtin[g]) < 1e-9 * max(1.0, abs(builtin[g]))


def test_global_percentile_uses_two_phase_and_matches(spark):
    from graphdb_td2_spark.operators.percentiles import percentile_numerators

    rng = random.Random(13)
    vals = [rng.randint(-(10**9), 10**9) for _ in range(1000)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    out = percentile_numerators(
        df,
        [],
        "v",
        [(1, 2, "p50n")],
        global_bucket=F.floor(F.col("v") / F.lit(10**7)),
    )
    assert "__pfx_bucket" in out._jdf.queryExecution().executedPlan().toString()
    row = out.collect()[0]
    assert row["p50n"] == _pctl_reference(vals, 1, 2)
    assert row["n"] == len(vals)


def test_bucketed_cumsum_bit_equal_to_global_window(spark):
    from graphdb_td2_spark.operators.prefix import bucketed_cumsum

    rng = random.Random(17)
    rows = [(rng.randint(-1000, 1000), rng.randint(1, 9)) for _ in range(800)]
    # distinct keys (cumsum over a value axis assumes a per-value rollup)
    seen = {}
    for k, c in rows:
        seen[k] = c
    df = spark.createDataFrame(list(seen.items()), "k long, c long")
    naive = {
        r["k"]: r["cum"]
        for r in df.select(
            "k",
            F.sum("c")
            .over(
                Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
            )
            .cast("long")
            .alias("cum"),
        ).collect()
    }
    two_phase = {
        r["k"]: r["cum"]
        for r in bucketed_cumsum(
            df,
            bucket=F.floor(F.col("k") / 37),
            order=[F.col("k").asc()],
            sums={"cum": "c"},
        ).collect()
    }
    assert naive == two_phase


def test_bucketed_cumsum_desc_with_tiebreak(spark):
    from graphdb_td2_spark.operators.prefix import bucketed_cumsum

    rng = random.Random(19)
    rows = [
        (rng.randint(0, 50), i, rng.randint(1, 5)) for i in range(300)
    ]  # deliberate ties on the primary key
    df = spark.createDataFrame(rows, "k long, id long, c long")
    order = [F.desc("k"), F.asc("id")]
    naive = {
        (r["k"], r["id"]): r["cum"]
        for r in df.select(
            "k",
            "id",
            F.sum("c")
            .over(
                Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
            )
            .cast("long")
            .alias("cum"),
        ).collect()
    }
    two_phase = {
        (r["k"], r["id"]): r["cum"]
        for r in bucketed_cumsum(
            df,
            bucket=F.floor(F.col("k") / 7),
            order=order,
            sums={"cum": "c"},
            bucket_desc=True,
        ).collect()
    }
    assert naive == two_phase


def test_bucketed_row_number_matches_global(spark):
    from graphdb_td2_spark.operators.prefix import bucketed_row_number

    rng = random.Random(23)
    keys = rng.sample(range(100_000), 500)
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r["k"]: r["rn"]
        for r in bucketed_row_number(
            df, bucket=F.floor(F.col("k") / 1000), order=[F.col("k").asc()]
        ).collect()
    }
    for rank, k in enumerate(sorted(keys), start=1):
        assert got[k] == rank
