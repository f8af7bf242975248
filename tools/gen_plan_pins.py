"""Freeze physical-plan expectations for the driver head-50 into
tests/plan_pins.json (consumed by tests/test_plans.py). Run after a
deliberate plan change; the test then guards against silent regressions
(a new Cartesian product, an extra shuffle, a top-k degrading to a full
sort). Uses the same session shape as the test fixture."""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from graphdb_td2_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
HEAD = 50

# the 20 most expensive tail queries by sweep runtime (r8 verdict task 6):
# graph tier, IVM/streaming, trainers — a plan regression here is invisible
# to the head-50 pins and only shows up at the next bench otherwise
TAIL_TOP = [
    "perceptron_lang_curve",
    "streaming_minhash_pairs",
    "ivm_cooccurrence_top20",
    "lpa_community_sizes",
    "sssp_top20",
    "harmonic_centrality_top20",
    "streaming_burst_pairs",
    "semantic_dedup_stats",
    "bpe_merge_table",
    "bfs_level_sizes",
    "kcore_sizes",
    "rich_club_coefficients",
    "ann_topk_ivf_trained",
    "product_random_walks",
    "weighted_pagerank_top20",
    "bpe_encoded_stats",
    "walk_skipgram_pairs",
    "streaming_daily_actives",
    "als_rank1_convergence",
    "bloom_urgent_order_events",
    # round-8 session additions that land in the heavy tail
    "recs_backtest_hitrate",
    "pq_recall_report",
    "hits_top20",
    "pagerank_convergence_curve",
    "cohort_ltv_curves",
    "customer_revenue_concentration",
    "discount_quantity_response",
    # round-9 additions (the remaining r8 tail + this round's new entries)
    "product_skyline",
    "churn_hazard_curve",
    "frequent_event_sequences",
    "minhash_accuracy_report",
    "top_confidence_rules",
    "monthly_seasonal_index",
    "tokenizer_fertility_by_lang",
    "join_key_skew_report",
    "source_diversity_index",
    "shingle_frequency_spectrum",
    "shingle_novelty_curve",
    "harmonic_centrality_approx_top20",
    "harmonic_approx_error_report",
    "ivm_served_recs_customer",
    "recs_backtest_by_strategy",
    "ivm_served_recs_brand_fallback",
    "graph_neighborhood_function",
    # round-9 session-2 additions
    "betweenness_sample_top20",
    "knn_loo_label_accuracy",
    "markov_next_event_backtest",
    "seasonal_naive_forecast_error",
    "l_diversity_report",
    "clustering_coefficient_histogram",
    "collocation_pmi_topk",
    "winnowed_duplicate_spans",
    "hll_daily_actives_accuracy",
    "streaming_topk_products",
    "tfidf_neardup_pairs",
    "mis_round_sizes",
    "markov_removal_attribution",
    # round-10 additions
    "betweenness_approx_error_report",
    "ann_topk_ivfpq_refined",
    "pq_refine_gain_report",
    "t_closeness_report",
    # round-12: eager-materialized reports whose auto-discovery is
    # cache-order-dependent (their execution during generation warms the
    # PQ corpus cache, and their own final plan is a local scan) — pin
    # explicitly so the pin set stays stable round-over-round
    "ann_nprobe_tradeoff_report",
    "pq_trained_recall_report",
]


def _nontrivial(plan: str) -> bool:
    """Pin-worthy = the plan has a join of any kind or ≥2 exchanges;
    pure single-scan aggregations are skipped (r10 VERDICT task 6 — a
    one-shuffle groupBy has nothing to regress that the oracle sweep
    would not catch first)."""
    if re.search(r"\w*Join|CartesianProduct", plan):
        return True
    return len(re.findall(r"\bExchange\b", plan)) >= 2


def main() -> int:
    spark = get_spark("gen-plan-pins", cpus=8, shuffle_partitions=8)
    pins: dict[str, dict] = {}
    fns = entry_mod.queries()
    explicit = list(dict.fromkeys(list(fns)[:HEAD] + TAIL_TOP))
    # r11: auto-discover the rest of the registry — every entry whose
    # plan shape is non-trivial gets a pin, so a plan regression in the
    # demoted tail fails pytest instead of waiting for the round audit
    auto: list[str] = []
    skipped: list[str] = []
    for name in fns:
        if name in explicit:
            continue
        try:
            df = fns[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:
            print(f"# {name}: SKIP (compile error: {exc})")
            skipped.append(name)
            continue
        (auto if _nontrivial(plan) else skipped).append(name)
    print(f"# auto-pinned {len(auto)}, skipped {len(skipped)}: {skipped}")
    names = explicit + auto
    for name in names:
        # some queries compile differently cold vs warm (session-cached
        # graph/adjacency state): pin the MAX of both compiles so the
        # assertion holds regardless of cache order in the test session
        plans = []
        for _ in range(2):
            df = fns[name](spark, SF_DIR)
            plans.append(df._jdf.queryExecution().executedPlan().toString())
        # a plan that embeds session-cached views (InMemoryTableScan
        # inlines the full child plan, exchanges included) has a
        # cache-state-dependent exchange count — exempt it from the bound
        cache_dependent = any("InMemoryTableScan" in p for p in plans)
        pins[name] = {
            "cartesian": max(p.count("CartesianProduct") for p in plans),
            "bnlj": max(p.count("BroadcastNestedLoopJoin") for p in plans),
            "topk": all(p.count("TakeOrderedAndProject") > 0 for p in plans),
            "exchanges": (
                None
                if cache_dependent
                else max(len(re.findall(r"\bExchange\b", p)) for p in plans)
            ),
        }
        print(f"{name}: {pins[name]}")
    out = Path(__file__).resolve().parent.parent / "tests" / "plan_pins.json"
    out.write_text(json.dumps(pins, indent=1, sort_keys=True) + "\n")
    print(f"wrote {out} ({len(pins)} pins)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
