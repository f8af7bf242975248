"""sf10 re-runs for the round-13 graph-tier changes (VERDICT r12 tasks
1-4): the broadcast-state auto-gate means component_sizes /
mis_round_sizes / betweenness_sample_top20 now take the CO-PARTITIONED
shuffle path at sf10 (18.5M vertices > the 5M bar) — the r12 runs of
those entries force-broadcast vertex-scale state, so their sf10 numbers
measured a plan that dies at the next scale-up; these are the first
honest big-graph-path points. component_sizes additionally carries the
r13 frontier-delta messages. sssp_top20's plan is unchanged (it already
gated) — its re-run replaces the probe-flagged r12 cell.

Methodology matches SCALE_r12_graph.json: ONE fresh 64 GiB-heap session
per (query, scale) probe — subprocess re-exec, so a probe's session
caches and JVM heap history can't flatter or poison the next probe.
Each child runs the JVM shuffle probe first and records
``spark_probe_ok`` (the r12 drift-marking discipline) — the r12 artifact
carried 4 probe-flagged cells; this rerun's goal is 8/8 clean.

Usage: python tools/scale_r13_graph.py [out_json]   (default
SCALE_r13_graph.json; reuses /tmp/spark_graft_sf10 when present).
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
QUERIES = [
    "betweenness_sample_top20",
    "mis_round_sizes",
    "sssp_top20",
    "component_sizes",
]
R12_SF10_SEC = {  # prior round's artifact; components/MIS/betweenness
    # cells there rode the force-broadcast plan (PERF_NOTES_r12 §13
    # errata in PERF_NOTES_r13), sssp/component cells were probe-flagged
    "betweenness_sample_top20": 119.526,
    "mis_round_sizes": 340.14,
    "sssp_top20": 423.201,
    "component_sizes": 876.867,
}


def _probe(name: str, sf_dir: str) -> int:
    """Child mode: run one query in this process's own session, print one
    JSON line {"sec": ..., "rows": ..., "spark_probe_sec": ...,
    "spark_probe_ok": ...}."""
    from graphdb_td2_spark.session import get_spark

    from bench import run_spark_probe, probe_within_tolerance

    import __spark_entry__ as entry_mod

    cal_path = Path(__file__).resolve().parent / "bench_calibration.json"
    probe_ref = json.loads(cal_path.read_text()).get("spark_probe_ref_sec")

    spark = get_spark("scale-r13-probe")
    spark.range(1).count()
    probe = run_spark_probe(spark)
    probe_ok = probe_ref is not None and probe_within_tolerance(probe, probe_ref)
    fn = entry_mod.queries()[name]
    t0 = time.time()
    rows = len(fn(spark, sf_dir).collect())
    print(
        json.dumps(
            {
                "sec": round(time.time() - t0, 3),
                "rows": rows,
                "spark_probe_sec": round(probe, 3),
                "spark_probe_ok": bool(probe_ok),
            }
        )
    )
    spark.stop()
    return 0


def main() -> int:
    if len(sys.argv) >= 4 and sys.argv[1] == "--probe":
        return _probe(sys.argv[2], sys.argv[3])
    out_json = sys.argv[1] if len(sys.argv) > 1 else "SCALE_r13_graph.json"

    if not Path(SF10_DIR, "lineitem.parquet").exists():
        print("# generating sf10 replica...", file=sys.stderr)
        from graphdb_td2_spark.session import get_spark
        from tools.scale_rehearsal_sf10 import _generate

        spark = get_spark("scale-r13-gen")
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
        "metric": "graph_tier_scale_rehearsal_r13",
        "note": (
            "round-13 broadcast-state auto-gate at sf0.1 vs sf10 (100x "
            "rows; FK-preserving explode replica; one fresh 64GiB-heap "
            "session per probe via subprocess; JVM shuffle probe recorded "
            "per child). components/MIS/betweenness run the CO-PARTITIONED "
            "big-graph path at sf10 for the first time (r12 cells rode a "
            "force-broadcast plan that hits Spark's 8GB limit at the next "
            "scale-up); component_sizes additionally carries frontier-delta "
            "messages."
        ),
        "sf0.1": {q: results["sf0.1"][q] for q in QUERIES},
        "sf10": {q: results["sf10"][q] for q in QUERIES},
        "ratios_vs_100x": ratios,
        "r12_sf10_sec": R12_SF10_SEC,
        "flag_ratio_100x": FLAG_RATIO_100X,
        "flagged_super_linear_100x": flagged,
    }
    Path(out_json).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
