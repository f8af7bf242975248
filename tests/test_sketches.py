"""Error-bound units for the sketch aggregates (HLL++ distinct counts,
quantile summaries) — sketches are engine-specific so they validate
against exact aggregates, not the cross-engine oracle."""

from __future__ import annotations

from graphdb_td2_spark.functions.sketches import (
    approx_distinct_users,
    approx_value_quantiles,
)


def test_hll_distinct_within_error_envelope(spark, sf_dir):
    rows = approx_distinct_users(spark, sf_dir).collect()
    assert rows, "no event types"
    for r in rows:
        assert r["n_exact"] > 0
        # rsd=0.05; allow a generous 5-sigma-ish envelope — HLL++ bias
        # correction behaves worse on small cardinalities
        assert r["rel_error"] <= 0.25, (
            f"{r['event_type']}: approx={r['n_approx']} exact={r['n_exact']}"
        )


def test_hll_is_deterministic(spark, sf_dir):
    a = {r["event_type"]: r["n_approx"] for r in approx_distinct_users(spark, sf_dir).collect()}
    b = {r["event_type"]: r["n_approx"] for r in approx_distinct_users(spark, sf_dir).collect()}
    assert a == b


def test_quantile_sketch_rank_error(spark, sf_dir):
    """GK summaries guarantee bounded RANK error (not value error — on a
    small stratum adjacent ranks can be far apart in value), so assert
    each approximation lands inside the exact [p-2%, p+2%] quantile band."""
    from pyspark.sql import functions as F

    from graphdb_td2_spark.io import read_table

    events = read_table(spark, sf_dir, "events", ["event_type", "value"])
    bands = {
        r["event_type"]: r
        for r in events.groupBy("event_type")
        .agg(
            F.expr(
                "percentile(value, array(0.48, 0.52, 0.93, 0.97, 0.97, 1.0))"
            ).alias("b")
        )
        .collect()
    }
    for r in approx_value_quantiles(spark, sf_dir).collect():
        b = bands[r["event_type"]]["b"]
        for p, (lo, hi) in (("p50", (b[0], b[1])), ("p95", (b[2], b[3])), ("p99", (b[4], b[5]))):
            approx = r[f"{p}_approx"]
            assert lo - 1e-9 <= approx <= hi + 1e-9, (
                f"{r['event_type']} {p}: approx={approx} outside [{lo}, {hi}]"
            )


def test_cms_one_sided_error_and_tightness(spark, sf_dir):
    from graphdb_td2_spark.functions.sketches import CMS_DEPTH, CMS_WIDTH, cms_heavy_hitters

    rows = cms_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == 20
    # count-min never under-estimates
    assert all(r["cms_count"] >= r["exact_count"] for r in rows)
    # CMS error bound: overshoot ≤ (e/w)·N with prob 1 - e^-d; use the
    # deterministic worst case 4·N/w as a loose but non-vacuous ceiling
    from graphdb_td2_spark.functions.text import tokens_col
    from graphdb_td2_spark.io import read_table
    from pyspark.sql import functions as F

    n_tokens = (
        read_table(spark, sf_dir, "documents", ["text"])
        .select(F.explode(tokens_col(F.col("text"))).alias("t"))
        .count()
    )
    ceiling = 4 * n_tokens / CMS_WIDTH
    assert all(r["cms_count"] - r["exact_count"] <= ceiling for r in rows)
    assert CMS_DEPTH * CMS_WIDTH == 4096  # sketch size is corpus-independent


def test_cms_exact_on_collision_free_fixture(spark, tmp_path):
    # tiny vocabulary ⇒ no bucket collisions ⇒ estimates are exact
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, "alpha alpha beta"), (1, "alpha gamma gamma gamma")],
        "doc_id long, text string",
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("t")) \
     .withColumn("n_chars", F.length("text").cast("long"))
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from graphdb_td2_spark.functions.sketches import cms_heavy_hitters

    rows = {r["token"]: (r["exact_count"], r["cms_count"])
            for r in cms_heavy_hitters(spark, str(tmp_path)).collect()}
    assert rows == {"alpha": (3, 3), "beta": (1, 1), "gamma": (3, 3)}


def test_mergeable_rollup_merges_state_not_rows(spark, sf_dir):
    from graphdb_td2_spark.functions.sketches import mergeable_distinct_rollup

    rows = {r["event_type"]: r for r in mergeable_distinct_rollup(spark, sf_dir).collect()}
    assert "TOTAL" in rows
    for t, r in rows.items():
        # HLL at default lgK=12 is ~1.6% rsd; allow 5 sigma + small-count slack
        err = abs(r["est_distinct"] - r["exact_distinct"])
        assert err <= max(5, 0.08 * r["exact_distinct"]), (t, r)
    # the merged TOTAL must cover at least the largest single partition
    # (union can never shrink a sketch)
    biggest = max(r["est_distinct"] for t, r in rows.items() if t != "TOTAL")
    assert rows["TOTAL"]["est_distinct"] >= biggest
