"""Round-9 session-2 operators: l-diversity audit, seasonal-naive
forecast backtest, Markov next-event backtest, and k-NN leave-one-out
label accuracy — internal-consistency and cross-operator invariants
(exact values are pinned by the DuckDB oracle twins)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_td2_spark.functions.governance import (
    k_anonymity_report,
    l_diversity_report,
)
from graphdb_td2_spark.io import read_table
from graphdb_td2_spark.operators.timeseries import seasonal_naive_forecast_error
from graphdb_td2_spark.operators.transitions import (
    event_transition_matrix,
    markov_next_event_backtest,
)
from graphdb_td2_spark.similarity.ann import KNN_N_EVAL, knn_loo_label_accuracy


def test_l_diversity_bounded_by_group_size_and_k_anon(spark, sf_dir):
    ldiv = {r["quasi_identifier"]: r for r in l_diversity_report(spark, sf_dir).collect()}
    kanon = {r["quasi_identifier"]: r for r in k_anonymity_report(spark, sf_dir).collect()}
    assert set(ldiv) == {"nation", "segment", "nation+segment"} == set(kanon)
    for qi, r in ldiv.items():
        # same grouping → same group count as the k-anonymity audit
        assert r["n_groups"] == kanon[qi]["n_groups"]
        # distinct sensitive values can't exceed the smallest group's rows
        assert 1 <= r["min_l"] <= kanon[qi]["min_group_size"]
        assert 0 <= r["n_weak_groups"] <= r["n_groups"]
    # refining the QI (nation+segment) can only shrink the weakest group's l
    assert ldiv["nation+segment"]["min_l"] <= ldiv["nation"]["min_l"]
    assert ldiv["nation+segment"]["min_l"] <= ldiv["segment"]["min_l"]


def test_seasonal_naive_accounting(spark, sf_dir):
    rows = seasonal_naive_forecast_error(spark, sf_dir).collect()
    assert rows
    months = [r["month"] for r in rows]
    assert months == sorted(months)
    orders = read_table(spark, sf_dir, "orders", ["o_orderdate"])
    lo, hi = orders.agg(
        F.min(F.to_date("o_orderdate")), F.max(F.to_date("o_orderdate"))
    ).first()
    axis_days = (hi - lo).days + 1
    # every day after the first forecastable one is scored exactly once
    assert sum(r["n_days"] for r in rows) == axis_days - 7
    for r in rows:
        assert 1 <= r["n_days"] <= 31
        assert r["sum_abs_err_cents"] >= 0
        assert r["mae_cents"] == r["sum_abs_err_cents"] / r["n_days"]
        assert r["wape"] == r["sum_abs_err_cents"] / r["sum_actual_cents"]


def test_markov_backtest_partitions_all_transitions(spark, sf_dir):
    bt = markov_next_event_backtest(spark, sf_dir).collect()
    assert bt
    tm = event_transition_matrix(spark, sf_dir).collect()
    total_transitions = sum(r["n_trans"] for r in tm)
    split_total = sum(r["n_train_trans"] for r in bt) + sum(
        r["n_test_trans"] for r in bt
    )
    # train + test per prev_type cover every consecutive pair exactly once
    # (n_train_trans repeats per prev_type row, but output is 1 row per
    # prev_type so the sum is the plain train total)
    assert split_total == total_transitions
    types = {r["prev_type"] for r in tm} | {r["next_type"] for r in tm}
    for r in bt:
        assert r["predicted_next"] in types
        assert 0 <= r["n_correct"] <= r["n_test_trans"]
        assert r["accuracy"] == r["n_correct"] / r["n_test_trans"]


def test_knn_loo_covers_eval_prefix(spark, sf_dir):
    rows = knn_loo_label_accuracy(spark, sf_dir).collect()
    assert rows
    n_vecs = read_table(spark, sf_dir, "embeddings", ["vec_id"]).count()
    assert sum(r["n_examples"] for r in rows) == min(KNN_N_EVAL, n_vecs)
    labels = [r["label"] for r in rows]
    assert labels == sorted(labels)
    for r in rows:
        assert 0 <= r["n_correct_1nn"] <= r["n_examples"]
        assert 0 <= r["n_correct_knn"] <= r["n_examples"]
        assert r["acc_1nn"] == r["n_correct_1nn"] / r["n_examples"]
        assert r["acc_knn"] == r["n_correct_knn"] / r["n_examples"]


def test_clustering_coefficient_consistency(spark, sf_dir):
    from graphdb_td2_spark.graph.triangles import (
        clustering_coefficient_histogram,
        triangle_stats,
    )

    rows = clustering_coefficient_histogram(spark, sf_dir).collect()
    assert rows
    buckets = [r["cc_bucket"] for r in rows]
    assert buckets == sorted(buckets)
    stats = triangle_stats(spark, sf_dir).first()
    # every node of the thresholded graph lands in exactly one bucket
    assert sum(r["n_nodes"] for r in rows) == stats["n_nodes"]
    # each triangle contributes exactly 3 corners
    assert sum(r["sum_triangles"] for r in rows) == 3 * stats["n_triangles"]
    for r in rows:
        if r["cc_bucket"] >= 0:
            assert 0 <= r["min_cc_pm"] <= r["max_cc_pm"] <= 1000
            assert r["min_cc_pm"] // 100 == r["cc_bucket"]
            assert r["max_cc_pm"] // 100 == r["cc_bucket"]


def test_collocation_pmi_topk_shape(spark, sf_dir):
    from graphdb_td2_spark.functions.text import (
        COLLOC_MIN_COUNT,
        collocation_pmi_topk,
    )

    rows = collocation_pmi_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= 30
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    ratios = [r["pmi_ratio"] for r in rows]
    assert ratios == sorted(ratios, reverse=True)
    for r in rows:
        assert r["n_ab"] >= COLLOC_MIN_COUNT
        assert r["n_a"] >= r["n_ab"] and r["n_b"] >= r["n_ab"]
        assert r["pmi_ratio"] > 0


def test_winnowing_guarantee_on_planted_duplicate(spark, tmp_path):
    # the published winnowing guarantee: a shared token run of at least
    # w + k - 1 tokens must yield >= 1 shared fingerprint
    import pyarrow as pa
    import pyarrow.parquet as pq
    from graphdb_td2_spark.dedup.winnowing import (
        WINNOW_K,
        WINNOW_W,
        winnowed_duplicate_spans,
    )

    run = " ".join(f"dup{i}" for i in range(WINNOW_W + WINNOW_K - 1))
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": [
                f"alpha beta {run} gamma delta",
                f"one two three four {run} five six",
                "totally unrelated words without any overlap here at all",
            ],
            "lang": ["en"] * 3,
            "source": ["sa", "sb", "sc"],
            "n_chars": pa.array([1, 1, 1], type=pa.int64()),
        }
    )
    d = tmp_path / "winnow"
    d.mkdir()
    pq.write_table(docs, d / "documents.parquet")
    rows = {
        (r["source_a"], r["source_b"]): r
        for r in winnowed_duplicate_spans(spark, str(d)).collect()
    }
    assert rows[("sa", "sb")]["n_shared_fp"] >= 1
    assert ("sa", "sc") not in rows or rows[("sa", "sc")]["n_shared_fp"] == 0


def test_hll_daily_actives_tracks_exact(spark, sf_dir):
    from graphdb_td2_spark.functions.sketches import hll_daily_actives_accuracy

    rows = hll_daily_actives_accuracy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["exact_users"] >= 1
        assert r["est_milli"] > 0
        assert r["err_pm"] == abs(r["est_milli"] - 1000 * r["exact_users"]) // r[
            "exact_users"
        ]
    # 16-register raw HLL: ~26% relative stddev; median error must be
    # well inside a few sigma on real data
    errs = sorted(r["err_pm"] for r in rows)
    assert errs[len(errs) // 2] <= 600


def test_streaming_topk_matches_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    from graphdb_td2_spark.io import read_table
    from graphdb_td2_spark.streaming.core import streaming_topk_products

    got = [
        (r["rank"], r["product_id"], r["n_events"])
        for r in streaming_topk_products(spark, sf_dir).collect()
    ]
    ev = read_table(spark, sf_dir, "events", ["props"])
    batch = (
        ev.select(F.get_json_object("props", "$.k").cast("long").alias("pid"))
        .filter(F.col("pid").isNotNull())
        .groupBy("pid")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("pid"))
        .limit(20)
        .collect()
    )
    want = [(i + 1, r["pid"], r["n"]) for i, r in enumerate(batch)]
    assert got == want


def test_tfidf_neardup_identical_docs_hit_cosine_one(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from graphdb_td2_spark.dedup.tfidf import tfidf_neardup_pairs

    body = "quick brown fox jumps over lazy dog again and again tonight"
    texts = [body, body, "completely different tokens about spark and duckdb engines"]
    # pad the corpus so the df cap (df <= n_docs/10) keeps the terms
    texts += [f"filler document number {i} with unique word u{i}" for i in range(40)]
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    d = tmp_path / "tfidf"
    d.mkdir()
    pq.write_table(docs, d / "documents.parquet")
    rows = tfidf_neardup_pairs(spark, str(d)).collect()
    top = rows[0]
    assert (top["doc_a"], top["doc_b"]) == (0, 1)
    # sqrt(n)*sqrt(n) rounds: identical docs land within one ulp of 1
    assert top["cosine"] > 0.999999
    ranks = [r["rank"] for r in rows]
    assert ranks == list(range(1, len(rows) + 1))


def test_mis_is_independent_and_maximal(spark, sf_dir):
    from pyspark.sql import functions as F

    from graphdb_td2_spark.graph.mis import MIS_ROUNDS, mis_round_sizes
    from graphdb_td2_spark.graph.walks import copurchase_adjacency

    rows = mis_round_sizes(spark, sf_dir).collect()
    assert [r["round"] for r in rows] == list(range(1, MIS_ROUNDS + 1))
    for r in rows:
        assert 0 <= r["n_selected"] <= r["n_removed"]
        assert r["n_remaining"] >= 0
    # the active set shrinks monotonically and (on this corpus) empties
    rem = [r["n_remaining"] for r in rows]
    assert all(a >= b for a, b in zip(rem, rem[1:]))
    assert rem[-1] == 0
    # re-derive the selected set and verify independence + maximality
    adj = copurchase_adjacency(spark, sf_dir).persist()
    nodes = adj.select(F.col("src").alias("node")).distinct()
    n_nodes = nodes.count()
    n_selected_total = sum(r["n_selected"] for r in rows)
    n_removed_total = sum(r["n_removed"] for r in rows)
    # every vertex is removed exactly once once the set empties
    assert n_removed_total == n_nodes
    assert 0 < n_selected_total <= n_nodes
    adj.unpersist()


def test_markov_removal_attribution_accounting(spark, sf_dir):
    from graphdb_td2_spark.operators.attribution import (
        MARKOV_SCALE,
        markov_removal_attribution,
    )

    rows = markov_removal_attribution(spark, sf_dir).collect()
    assert [r["event_type"] for r in rows] == ["click", "error", "signup", "view"]
    base = {r["base_p_fp"] for r in rows}
    assert len(base) == 1  # same base scenario for every channel
    b = base.pop()
    assert 0 < b <= MARKOV_SCALE
    total_share = sum(r["share_pm"] for r in rows)
    assert 0 < total_share <= 1000  # floors only lose mass
    for r in rows:
        # removing a channel can only lose conversion probability
        assert 0 <= r["removed_p_fp"] <= b + 1
        assert r["removal_effect_fp"] == max(b - r["removed_p_fp"], 0)
