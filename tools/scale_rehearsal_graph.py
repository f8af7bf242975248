"""Graph-tier scale rehearsal (round-7 VERDICT task #4): the iterative
algorithms are the most expensive tail queries and — except PageRank —
had no ≥sf1 record. Run the tier at sf0.1 and sf1 (10× rows) and flag
super-linear scalers; optionally extend the worst offenders to sf10.

Corpora are the FK-preserving replicas the earlier rehearsals generated
(tools/scale_rehearsal.py → /tmp/spark_graft_sf1.0,
tools/scale_rehearsal_sf10.py → /tmp/spark_graft_sf10); this tool
regenerates them via those scripts' _generate when absent.

Usage: python tools/scale_rehearsal_graph.py [out_json] [--sf10]
Writes SCALE_r8_graph.json by default.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from graphdb_td2_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402

SF01_DIR = "/root/testdata/sf0.1"
SF1_DIR = "/tmp/spark_graft_sf1.0"
SF10_DIR = "/tmp/spark_graft_sf10"
FLAG_RATIO = 13.0  # 10× data ⇒ >13× time = super-linear (with variance)
FLAG_RATIO_100X = 130.0

QUERIES = [
    "component_sizes",
    "kcore_sizes",
    "sssp_top20",
    "lpa_community_sizes",
    "harmonic_centrality_top20",
    "ivm_cooccurrence_top20",
    "streaming_minhash_pairs",
]


def _run(spark, sf_dir: str, queries: list[str]) -> dict:
    spark.range(1).count()
    out: dict = {}
    fns = entry_mod.queries()
    for name in queries:
        t0 = time.time()
        try:
            n = len(fns[name](spark, sf_dir).collect())
        except Exception as exc:  # record and keep going — a dead JVM
            out[name] = f"error: {type(exc).__name__}"
            print(f"# {sf_dir} {name}: ERROR {exc}"[:300], file=sys.stderr)
            continue
        out[name] = round(time.time() - t0, 3)
        print(f"# {sf_dir} {name}: {out[name]}s ({n} rows)", file=sys.stderr)
    return out


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    with_sf10 = "--sf10" in sys.argv
    out_json = args[0] if args else "SCALE_r8_graph.json"
    spark = get_spark("scale-rehearsal-graph")
    if not Path(SF1_DIR, "lineitem.parquet").exists():
        raise SystemExit(
            f"{SF1_DIR} missing — run tools/scale_rehearsal.py first"
        )
    base = _run(spark, SF01_DIR, QUERIES)
    big = _run(spark, SF1_DIR, QUERIES)
    def _ratio(b, g):
        return (
            round(g / b, 2)
            if isinstance(b, float) and isinstance(g, float) and b
            else None
        )

    ratios = {q: _ratio(base.get(q), big.get(q)) for q in QUERIES}
    flagged = [q for q, r in ratios.items() if r is not None and r > FLAG_RATIO]
    artifact = {
        "metric": "graph_tier_scale_rehearsal",
        "sf0.1": base,
        "sf1": big,
        "ratios_vs_10x": ratios,
        "flagged_super_linear": flagged,
    }
    if with_sf10:
        if not Path(SF10_DIR, "lineitem.parquet").exists():
            raise SystemExit(
                f"{SF10_DIR} missing — run tools/scale_rehearsal_sf10.py first"
            )
        sf10_queries = [q for q in QUERIES if q != "harmonic_centrality_top20"]
        big10 = _run(spark, SF10_DIR, sf10_queries)
        artifact["sf10"] = big10
        artifact["ratios_vs_100x"] = {
            q: _ratio(base.get(q), big10.get(q)) for q in sf10_queries
        }
        artifact["flagged_super_linear_100x"] = [
            q
            for q, r in artifact["ratios_vs_100x"].items()
            if r is not None and r > FLAG_RATIO_100X
        ]
    Path(out_json).write_text(json.dumps(artifact, indent=1) + "\n")
    print(json.dumps(artifact))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
