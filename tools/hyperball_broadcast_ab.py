"""Measure the r9 smallint+broadcast-state HyperBall rework at sf0.1 and
sf10 and append it to SCALE_r9_graph.json's A/B variant table.

Methodology matches the shipped-variant row: one 64 GiB-heap session,
harmonic_centrality_approx_top20 timed end-to-end including its
adjacency build (the entry's cost envelope), sf10 = the FK-preserving
/tmp/spark_graft_sf10 replica.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from graphdb_td2_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF10 = "/tmp/spark_graft_sf10"
Q = "harmonic_centrality_approx_top20"


def main() -> int:
    art_path = Path("SCALE_r9_graph.json")
    spark = get_spark("hyperball-broadcast-ab")
    spark.range(1).count()
    fn = entry_mod.queries()[Q]
    times = {}
    for sf_dir in (SF01, SF10):
        t0 = time.time()
        n = len(fn(spark, sf_dir).collect())
        times[sf_dir] = round(time.time() - t0, 3)
        print(f"# {sf_dir} {Q}: {times[sf_dir]}s ({n} rows)", file=sys.stderr)
    art = json.loads(art_path.read_text())
    art["ab_variants_sf10_harmonic_approx"][
        "wide_long_broadcast_switch_SHIPPED_r9b"
    ] = times[SF10]
    art["r9b_note"] = (
        "r9b rework: broadcast the register state into the cached "
        "adjacency ONLY below the measured 100k-vertex crossover; "
        "registers stay LONG. Two rejected A/Bs: (1) broadcasting at a "
        "pagerank-style 5M bar LOST at sf10 (676.2s vs 424.8s — state "
        "is re-collected every round, unlike a one-shot rank "
        "broadcast) while winning at sf0.1 (25.4s vs 36.0s); "
        "(2) SMALLINT registers LOST at sf10 even on the shuffle plan "
        "(633.6s idle-box vs 424.8s — the 16-way MAX re-widens every "
        "comparison, costing more than the narrower shuffle saves). "
        f"Shipped plan: sf0.1={times[SF01]}s sf10={times[SF10]}s."
    )
    art["sf10"][Q] = times[SF10]
    art["sf0.1"][Q] = times[SF01]
    art["ratios_vs_100x"][Q] = round(times[SF10] / times[SF01], 2)
    art_path.write_text(json.dumps(art, indent=1) + "\n")
    print(json.dumps({Q: times, "ratio": round(times[SF10] / times[SF01], 2)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
