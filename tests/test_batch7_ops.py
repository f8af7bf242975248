"""Readability (functions/text.py), assortativity (graph/centrality.py),
KS drift (operators/drift.py)."""

from __future__ import annotations

import datetime as dt

from graphdb_td2_spark.functions.text import readability_stats
from graphdb_td2_spark.graph.centrality import degree_assortativity
from graphdb_td2_spark.operators.drift import ks_value_drift

EV = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
DOC = "doc_id long, text string, lang string, source string, n_chars long"


def test_readability_hand_computed(spark, tmp_path):
    d = tmp_path / "fx"
    # "the cat sat." → 3 words, 3 vowel groups, 1 sentence
    spark.createDataFrame(
        [(1, "the cat sat.", "en", "web", 12)], DOC
    ).write.parquet(str(d / "documents.parquet"))
    (r,) = readability_stats(spark, str(d)).collect()
    assert (r["n_docs"], r["n_words"], r["n_sentences"], r["n_syllables"]) == (1, 3, 1, 3)
    assert abs(r["flesch"] - (206.835 - 1.015 * 3 - 84.6 * 1.0)) < 1e-9


def test_readability_corpus(spark, sf_dir):
    rows = readability_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_words"] > 0 and r["n_sentences"] >= r["n_docs"]


def test_assortativity_bounds(spark, sf_dir):
    (r,) = degree_assortativity(spark, sf_dir).collect()
    assert r["n_edges"] > 0
    assert -1.0 <= r["assortativity"] <= 1.0
    assert r["mean_src_degree"] > 0


def test_ks_identical_and_disjoint(spark, tmp_path):
    t = dt.datetime(2024, 1, 1)
    # identical distributions → ks 0; then disjoint supports → ks 1
    d1 = tmp_path / "same"
    rows = [(i, t, 1, ty, float(v), "{}") for i, (ty, v) in enumerate(
        [("a", 1), ("a", 2), ("b", 1), ("b", 2)])]
    spark.createDataFrame(rows, EV).write.parquet(str(d1 / "events.parquet"))
    (r,) = ks_value_drift(spark, str(d1)).collect()
    assert (r["type_a"], r["type_b"], r["ks_num"]) == ("a", "b", 0)
    d2 = tmp_path / "disj"
    rows = [(i, t, 1, ty, float(v), "{}") for i, (ty, v) in enumerate(
        [("a", 1), ("a", 2), ("b", 5), ("b", 6)])]
    spark.createDataFrame(rows, EV).write.parquet(str(d2 / "events.parquet"))
    (r,) = ks_value_drift(spark, str(d2)).collect()
    assert r["ks"] == 1.0


def test_ks_corpus_in_unit_interval(spark, sf_dir):
    (r,) = ks_value_drift(spark, sf_dir).collect()
    assert 0.0 <= r["ks"] <= 1.0
    assert r["n_a"] > 0 and r["n_b"] > 0


def test_rolling_correlation_bounds_and_window(spark, sf_dir):
    from graphdb_td2_spark.operators.drift import rolling_type_correlation

    rows = rolling_type_correlation(spark, sf_dir).collect()
    assert rows
    import math

    for r in rows:
        assert r["n_days"] == 7
        if r["corr"] is not None and not math.isnan(r["corr"]):
            assert -1.0 - 1e-12 <= r["corr"] <= 1.0 + 1e-12


def test_geo_rollup_shares(spark, sf_dir):
    from graphdb_td2_spark.operators.relational import geo_hierarchy_rollup

    rows = geo_hierarchy_rollup(spark, sf_dir).collect()
    assert rows
    by_region = {}
    for r in rows:
        by_region.setdefault(r["region"], []).append(r)
    region_share_total = 0.0
    for rs in by_region.values():
        assert abs(sum(r["nation_share"] for r in rs) - 1.0) < 1e-9
        region_share_total += rs[0]["region_share"]
        assert all(abs(r["region_share"] - rs[0]["region_share"]) < 1e-12 for r in rs)
    assert abs(region_share_total - 1.0) < 1e-9


def test_script_profile_partitions_chars(spark, sf_dir):
    from graphdb_td2_spark.functions.text import script_profile

    rows = script_profile(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert (
            r["n_letter"] + r["n_digit"] + r["n_space"] + r["n_punct"] + r["n_other"]
            == r["n_chars"]
        )
        assert r["n_other"] >= 0


def test_blocklist_accounting(spark, sf_dir):
    from graphdb_td2_spark.functions.text import blocklist_hit_stats

    rows = blocklist_hit_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_flagged"] <= r["n_docs"]
        assert r["total_hits"] >= r["n_flagged"]
        assert 0.0 <= r["flag_rate"] <= 1.0


def test_lang_crosstab_accounting(spark, sf_dir):
    from graphdb_td2_spark.functions.text import lang_script_crosstab
    from graphdb_td2_spark.io import read_table

    rows = lang_script_crosstab(spark, sf_dir).collect()
    n_docs = read_table(spark, sf_dir, "documents", ["doc_id"]).count()
    assert sum(r["n_docs"] for r in rows) == n_docs


def test_daily_bands_ordered(spark, sf_dir):
    from graphdb_td2_spark.operators.timeseries import daily_value_bands

    rows = daily_value_bands(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["p10"] <= r["p50"] <= r["p90"]
