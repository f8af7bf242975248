"""Physical-plan regression tests — PLANS.md's audit, enforced.

Each assertion pins a plan property that matters at 100 TB (predicate
pushdown reaching the parquet scan, broadcast vs nested-loop choices,
top-k compilation). If a refactor silently degrades a plan (e.g. a filter
stops pushing, a banded join falls back to a nested loop), these fail
even though results stay correct.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_urgent_customers_pushdown_and_semi_join(spark):
    plan = _plan(spark, "urgent_customers")
    # the priority predicate must reach the orders parquet scan
    assert "EqualTo(o_orderpriority,1-URGENT)" in plan
    assert "LeftSemi" in plan
    assert "SortMergeJoin" not in plan  # dimension-sized sides broadcast


def test_top_price_orders_scalar_is_single_row_broadcast(spark):
    plan = _plan(spark, "top_price_orders")
    # exactly one nested loop — the 1-row scalar; anything more is a bug
    assert plan.count("BroadcastNestedLoopJoin") == 1


def test_event_burst_pairs_is_equi_join_not_nested_loop(spark):
    plan = _plan(spark, "event_burst_pairs")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_shipping_priority_pushdown_and_topk(spark):
    plan = _plan(spark, "shipping_priority")
    assert "TakeOrderedAndProject" in plan  # top-k, not a full sort
    assert "GreaterThan(l_shipdate" in plan  # pushed to lineitem scan
    assert "LessThan(o_orderdate" in plan  # pushed to orders scan


def test_recs_product_cooccurrence_seed_pushdown(spark):
    import re

    plan = _plan(spark, "recs_product_cooccurrence")
    # recs reads the persisted adjacency view, so the seed predicate must
    # reach the InMemoryTableScan (the cached-view analogue of parquet
    # pushdown); on a cold path it would be EqualTo(l_partkey,1) on the scan
    assert re.search(r"InMemoryTableScan.*\(product_id#\d+L? = 1\)", plan) or (
        "EqualTo(l_partkey,1)" in plan
    )


def test_column_pruning_reaches_scan(spark):
    plan = _plan(spark, "pricing_summary")
    # ReadSchema must not include unused wide columns
    assert "l_comment" not in plan
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "l_partkey" not in line  # 7-col projection only
            break
    else:
        pytest.fail("no ReadSchema in plan")


def test_quality_filter_stats_is_one_partial_agged_shuffle(spark):
    plan = _plan(spark, "quality_filter_stats")
    # per-document rules are a narrow project; the only data shuffle is the
    # source-keyed aggregate (plus the final presentation sort), and the
    # aggregate MUST combine map-side — at 100 TB the shuffle carries one
    # row per (partition, source), never one per document
    assert "partial_count" in plan and "partial_sum" in plan
    assert plan.count("Exchange ") <= 2
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "text" in line and "doc_id" not in line  # pruned
            break
    else:
        pytest.fail("no ReadSchema in plan")


def test_dataset_splits_narrow_assignment(spark):
    plan = _plan(spark, "dataset_splits")
    # split assignment is a pure row expression over a 2-column scan;
    # shuffles: agg exchange, source-window exchange, presentation sort
    assert "partial_count" in plan
    assert plan.count("Exchange ") <= 3
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "text" not in line  # only doc_id + source read
            break
    else:
        pytest.fail("no ReadSchema in plan")


def test_ann_join_strategies(spark):
    # brute force: broadcast nested loop (q queries x corpus) — the
    # intended embarrassingly-parallel scan; never a shuffle cartesian
    plan = _plan(spark, "ann_topk_bruteforce")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    # LSH probe: hash join on the bucket key with the query side broadcast
    plan = _plan(spark, "ann_topk_lsh")
    assert "BroadcastHashJoin [bucket" in plan
    assert "CartesianProduct" not in plan
    # IVF probe: hash join on the cell key; the only nested loop is the
    # n_cells-row centroid broadcast in assignment
    plan = _plan(spark, "ann_topk_ivf")
    assert "BroadcastHashJoin [cell" in plan
    assert "CartesianProduct" not in plan


def test_minhash_band_join_is_equi(spark):
    # the band-bucket self-join must be an equi-join on (band, bucket) —
    # BHJ locally, SMJ at scale — never a nested loop over doc pairs
    plan = _plan(spark, "minhash_lsh_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    import re

    assert re.search(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[band", plan)


def test_context_packing_single_window_shuffle(spark):
    """The packing plan needs exactly one exchange — the (source) window
    partitioning — plus the rollup's; no joins, no extra shuffles."""
    plan = _plan(spark, "context_packing_stats")
    assert "Join" not in plan
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_pii_scan_prunes_to_source_and_text(spark):
    """The PII scan must read only (source, text) — a scan dragging all
    five document columns through regex extraction is wrong."""
    plan = _plan(spark, "pii_scan_stats")
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan[:800]
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"source", "text"}


def test_source_mixing_weights_broadcasts_totals(spark):
    """The 1-row totals frame must broadcast; the corpus-sized side must
    never shuffle for it."""
    plan = _plan(spark, "source_mixing_weights")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bm25_broadcasts_query_terms_no_global_sort(spark):
    plan = _plan(spark, "bm25_doc_topk")
    # the tiny query-term table must broadcast into the corpus-sized
    # postings stream; the candidate self-product must never cartesian
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_matches_blocked_equi_join(spark):
    plan = _plan(spark, "fuzzy_part_matches")
    # blocking must compile to an equi-join on the block key — an
    # un-blocked fallback shows up as a nested loop / cartesian
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # block-size guard joins a broadcast block list
    assert "BroadcastHashJoin" in plan


def test_cms_probe_is_broadcast(spark):
    plan = _plan(spark, "cms_heavy_hitters")
    # the 20-token probe set joins the 4096-cell sketch via broadcast —
    # a shuffle join over either tiny side is a regression
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_semantic_dedup_within_cell_equi_join(spark):
    import re

    # the registry entry is eager since r12 (the ≤n_cells-row stats frame
    # is collected once and re-wrapped, so ITS plan is a local scan) —
    # pin the internal lazy computation the collect executes instead
    from graphdb_td2_spark.dedup.semantic import semantic_cells, semantic_dropped

    dropped = semantic_dropped(semantic_cells(spark, SF_DIR))
    plan = dropped._jdf.queryExecution().executedPlan().toString()
    # the quadratic term must be blocked: an equi self-join on the trained
    # cell id, compiled as a LEFT SEMI (dropped-set probe), never an
    # all-pairs product. The ONLY nested-loop join allowed is the broadcast
    # of the 8 centroids into the corpus scan (the assignment path — same
    # shape the ANN plans pin).
    assert "CartesianProduct" not in plan
    assert re.search(
        r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[cell\S*\], \[a_cell\S*\], LeftSemi",
        plan,
    ), plan[:1500]
    assert plan.count("BroadcastNestedLoopJoin") == plan.count(
        "BroadcastNestedLoopJoin BuildRight, Cross"
    )


def test_doc_chunks_is_narrow_explode(spark):
    """Chunk extraction is scan → generate — any join or aggregation in
    the plan means the shape regressed."""
    import re

    plan = _plan(spark, "doc_chunks")
    assert "Join" not in plan
    assert "HashAggregate" not in plan
    assert "Generate explode" in plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan[:800]
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"doc_id", "text"}


def test_lm_scores_broadcast_model_join(spark):
    """The bigram model is the small side at any scale — it must broadcast
    into the exploded held-out stream, and both aggregations must partial-
    agg map-side."""
    plan = _plan(spark, "lm_bigram_scores")
    assert "BroadcastHashJoin [bigram" in plan
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan


def test_pq_adc_scoring_is_broadcast_lut_join(spark):
    """PQ/ADC scans only the compressed code table; the LUT and codebook
    are broadcast — a shuffle or product on the corpus side means the
    compression shape regressed."""
    plan = _plan(spark, "pq_adc_topk")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin [m" in plan
    assert "partial_min_by" in plan or "min_by" in plan
    assert "partial_sum" in plan


def test_transition_matrix_prunes_and_partial_aggs(spark):
    plan = _plan(spark, "event_transition_matrix")
    assert "Join" not in plan  # lag + two aggs, never a self-join
    assert "partial_count" in plan
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "props" not in line and "value" not in line
            break
    else:
        raise AssertionError("no ReadSchema in plan")


def test_random_walk_steps_broadcast_the_frontier(spark):
    from graphdb_td2_spark.graph.walks import WALK_LEN

    plan = _plan(spark, "product_random_walks")
    assert "CartesianProduct" not in plan
    # each of the WALK_LEN steps joins the tiny frontier by broadcast;
    # the adjacency itself is never re-shuffled per step
    assert plan.count("BroadcastHashJoin") >= WALK_LEN


def test_cdc_apply_is_one_joinless_hash_agg(spark):
    plan = _plan(spark, "cdc_customer_state")
    assert "Join" not in plan
    assert "max_by" in plan


def test_repeated_ngrams_semi_join_no_product(spark):
    plan = _plan(spark, "repeated_ngram_stats")
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan


def test_clean_corpus_funnel_broadcasts_drop_lists(spark):
    plan = _plan(spark, "clean_corpus_stats")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


# -- two-phase prefix sums (operators/prefix.py) ------------------------
# The ECDF/rank family must never funnel its value/dimension axis
# through a single-partition window: the only unpartitioned windows
# allowed are over the |buckets|-row offset table (ordered by
# __pfx_bucket), never directly by the raw axis column.

_UNPARTITIONED_AXIS_WINDOW = (
    r"windowspecdefinition\((value|cents|l_partkey|p_partkey)#\d+"
)


@pytest.mark.parametrize(
    "name",
    [
        "ks_value_drift",
        "gini_stump_train",
        "abc_product_classes",
        "negative_sample_stats",
    ],
)
def test_prefix_family_no_single_partition_axis_window(spark, name):
    import re

    plan = _plan(spark, name)
    assert "__pfx_bucket" in plan  # two-phase path actually taken
    assert not re.search(_UNPARTITIONED_AXIS_WINDOW, plan)


def test_gini_argmin_is_topk_not_global_window(spark):
    plan = _plan(spark, "gini_stump_train")
    assert "TakeOrderedAndProject" in plan


def test_top_lift_pairs_no_forced_product_broadcast(spark):
    # the |product|-sized count tables must not carry a forced broadcast
    # hint; at sf0.001 AQE/Catalyst may still choose broadcast (fine) —
    # what we pin is the logical plan carrying no hint, via the absence
    # of a ResolvedHint surviving to the optimized plan with both
    # count-side joins present, and no cartesian anywhere.
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["top_lift_pairs"](spark, SF_DIR)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert optimized.count("ResolvedHint") == 0
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in physical


# -- lake layout (graphdb_td2_spark/lake.py) ----------------------------
# The hot self-joins must read the bucketed lake tables exchange-free:
# with broadcast disabled (the 100 TB regime), the only shuffle left is
# the pair aggregation.


@pytest.mark.parametrize(
    "name", ["top_cooccurrence_pairs", "minhash_lsh_pairs"]
)
def test_lake_self_join_is_exchange_free(spark, name):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, name)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Bucketed: true" in plan
    assert "SortMergeJoin" in plan
    # exactly one shuffle: the (product_a, product_b) / (doc_a, doc_b)
    # aggregation — the join itself rides the bucketing
    assert plan.count("Exchange hashpartitioning") == 1


# -- head-50 plan pinning (tests/plan_pins.json) ------------------------
# Every driver-gated query carries a frozen plan profile: zero Cartesian
# products, no new BroadcastNestedLoopJoins beyond the audited benign
# ones (1-row scalars / axis-sized broadcasts), top-k stays compiled to
# TakeOrderedAndProject, and the shuffle count never grows. Regenerate
# deliberately with tools/gen_plan_pins.py after an intentional change.

import json as _json

_PINS = _json.loads(
    (Path(__file__).resolve().parent / "plan_pins.json").read_text()
)


@pytest.mark.parametrize("name", sorted(_PINS))
def test_head50_plan_pinned(spark, name):
    pin = _PINS[name]
    plan = _plan(spark, name)
    assert plan.count("CartesianProduct") == 0
    assert plan.count("BroadcastNestedLoopJoin") <= pin["bnlj"]
    if pin["topk"]:
        assert "TakeOrderedAndProject" in plan
    if pin["exchanges"] is not None:  # None = cache-state-dependent plan
        import re as _re

        assert len(_re.findall(r"\bExchange\b", plan)) <= pin["exchanges"]
