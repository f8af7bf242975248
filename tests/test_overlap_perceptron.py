"""Units for the round-7 additions: cross-source shingle overlap and the
batch-perceptron training curve."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_td2_spark.dedup.overlap import source_overlap_matrix
from graphdb_td2_spark.functions.scoring import perceptron_lang_curve
from graphdb_td2_spark.io import read_table


def test_source_overlap_invariants(spark, sf_dir):
    rows = source_overlap_matrix(spark, sf_dir).collect()
    assert rows, "some source pair must share a shingle on the fixture"
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert 0 < r["n_common"] <= min(r["n_a"], r["n_b"])
        union = r["n_a"] + r["n_b"] - r["n_common"]
        assert r["jaccard"] == r["n_common"] / union
        assert 0.0 < r["jaccard"] <= 1.0
    keys = [(r["source_a"], r["source_b"]) for r in rows]
    assert keys == sorted(keys)  # deterministic matrix order


def test_perceptron_curve_semantics(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents", ["doc_id", "lang"])
    n_docs = docs.count()
    n_en = docs.filter(F.col("lang") == "en").count()
    rows = {r["epoch"]: r for r in perceptron_lang_curve(spark, sf_dir).collect()}
    assert sorted(rows) == [1, 2, 3, 4]
    # epoch 1 starts from w=0, b=0: every document scores 0 and y*0 <= 0,
    # so ALL docs are mistakes and the bias update is the label sum
    assert rows[1]["n_mistakes"] == n_docs
    assert rows[1]["bias"] == n_en - (n_docs - n_en)
    assert rows[1]["w_l1"] > 0
    # training actually reduces mistakes below the all-wrong start
    assert min(r["n_mistakes"] for r in rows.values()) < n_docs


def test_funnel_monotone_and_anchored(spark, sf_dir):
    from graphdb_td2_spark.operators.conversion import conversion_funnel_steps

    rows = {r["step"]: r for r in conversion_funnel_steps(spark, sf_dir).collect()}
    assert sorted(rows) == [1, 2, 3]
    assert rows[1]["step_type"] == "view"
    assert rows[1]["share_of_start"] == 1.0
    # funnels only narrow
    assert rows[1]["n_users"] >= rows[2]["n_users"] >= rows[3]["n_users"]
    for s in (2, 3):
        assert rows[s]["share_of_start"] == rows[s]["n_users"] / rows[1]["n_users"]


def test_top_session_paths_shape(spark, sf_dir):
    from graphdb_td2_spark.operators.transitions import top_session_paths

    rows = top_session_paths(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    counts = [r["n_sessions"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert 0 <= r["n_converting"] <= r["n_sessions"]
        parts = r["path"].split(">")
        assert 1 <= len(parts) <= 5
        assert all(p in {"view", "click", "purchase", "signup", "error"} for p in parts)
        # a path containing 'purchase' in its prefix must convert fully
        if "purchase" in parts:
            assert r["n_converting"] == r["n_sessions"]


def test_source_token_chisq_invariants(spark, sf_dir):
    from graphdb_td2_spark.functions.hashing_tf import source_token_chisq

    rows = source_token_chisq(spark, sf_dir).collect()
    assert rows
    srcs = [r["source"] for r in rows]
    assert srcs == sorted(srcs)
    total = sum(r["n_tokens"] for r in rows)
    assert total > 0
    for r in rows:
        assert r["chi2"] >= 0.0
        assert r["n_tokens"] > 0


def test_event_burstiness_matches_reference(spark, sf_dir):
    from collections import Counter

    from graphdb_td2_spark.operators.drift import event_burstiness
    from graphdb_td2_spark.io import read_table

    ev = read_table(spark, sf_dir, "events", ["event_type", "ts"]).collect()
    daily = Counter((r["event_type"], r["ts"].date()) for r in ev)
    per_type: dict[str, list[int]] = {}
    for (t, _), c in daily.items():
        per_type.setdefault(t, []).append(c)
    rows = {r["event_type"]: r for r in event_burstiness(spark, sf_dir).collect()}
    assert set(rows) == set(per_type)
    for t, cs in per_type.items():
        n, s1, s2 = len(cs), sum(cs), sum(c * c for c in cs)
        assert rows[t]["n_days"] == n
        assert rows[t]["n_events"] == s1
        assert rows[t]["dispersion"] == (n * s2 - s1 * s1) / (n * s1)
        assert rows[t]["dispersion"] >= 0.0
