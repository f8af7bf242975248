"""sf10 points for the two widened-headline graph walls (VERDICT r10
task #4): ``betweenness_sample_top20`` (48 s at sf0.1 — 43% of the bench
graph tier) and ``mis_round_sizes`` (40 s at sf1) had sf1 coverage but no
committed sf10 measurement after their r10 rework (eager lineage
truncation / eager per-round counts). Times both at sf0.1 and sf10
(100× rows, the FK-preserving explode replica from
tools/scale_rehearsal_sf10.py) and flags super-linear scalers.

Methodology matches SCALE_r9_graph.json: ONE fresh 64 GiB-heap session
per (query, scale) probe — subprocess re-exec, so a probe's session
caches and JVM heap history can't flatter or poison the next probe.

Usage: python tools/scale_r11_graph.py [out_json]   (default
SCALE_r11_graph.json; reuses /tmp/spark_graft_sf10 when present).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF01_DIR = "/root/testdata/sf0.1"
SF10_DIR = "/tmp/spark_graft_sf10"
FLAG_RATIO_100X = 130.0
QUERIES = ["mis_round_sizes", "betweenness_sample_top20"]


def _probe(name: str, sf_dir: str) -> int:
    """Child mode: run one query in this process's own session, print one
    JSON line {"sec": ..., "rows": ...}."""
    from graphdb_td2_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("scale-r11-probe")
    spark.range(1).count()
    fn = entry_mod.queries()[name]
    t0 = time.time()
    rows = len(fn(spark, sf_dir).collect())
    print(json.dumps({"sec": round(time.time() - t0, 3), "rows": rows}))
    spark.stop()
    return 0


def main() -> int:
    if len(sys.argv) >= 4 and sys.argv[1] == "--probe":
        return _probe(sys.argv[2], sys.argv[3])
    out_json = sys.argv[1] if len(sys.argv) > 1 else "SCALE_r11_graph.json"

    if not Path(SF10_DIR, "lineitem.parquet").exists():
        print("# generating sf10 replica...", file=sys.stderr)
        from graphdb_td2_spark.session import get_spark
        from tools.scale_rehearsal_sf10 import _generate

        spark = get_spark("scale-r11-gen")
        _generate(spark)
        spark.stop()

    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="64g")
    results: dict[str, dict] = {"sf0.1": {}, "sf10": {}}
    for name in QUERIES:
        for label, sf_dir in (("sf0.1", SF01_DIR), ("sf10", SF10_DIR)):
            p = subprocess.run(
                [sys.executable, __file__, "--probe", name, sf_dir],
                capture_output=True,
                text=True,
                env=env,
            )
            try:
                rec = json.loads(p.stdout.strip().splitlines()[-1])
            except Exception:
                rec = {"error": (p.stderr or p.stdout)[-300:]}
            results[label][name] = rec
            print(f"# {label} {name}: {rec}", file=sys.stderr)

    ratios = {}
    flagged = []
    for name in QUERIES:
        b = results["sf0.1"][name].get("sec")
        g = results["sf10"][name].get("sec")
        r = round(g / b, 2) if b and g else None
        ratios[name] = r
        if r is not None and r > FLAG_RATIO_100X:
            flagged.append(name)
    out = {
        "metric": "graph_tier_scale_rehearsal_r11",
        "note": (
            "r10-reworked graph walls at sf0.1 vs sf10 (100x rows; "
            "FK-preserving explode replica; one fresh 64GiB-heap session "
            "per probe via subprocess). r9 baselines: "
            "betweenness_sample_top20 sf10 402.0s (pre-r10 rework); "
            "mis_round_sizes had sf1=40.0s only."
        ),
        "sf0.1": {q: results["sf0.1"][q] for q in QUERIES},
        "sf10": {q: results["sf10"][q] for q in QUERIES},
        "ratios_vs_100x": ratios,
        "flag_ratio_100x": FLAG_RATIO_100X,
        "flagged_super_linear_100x": flagged,
    }
    Path(out_json).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
