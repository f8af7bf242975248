"""sf10 points for the dedup-tier walls (VERDICT r11 task #3):
``semantic_dedup_stats`` (12.0 s at sf0.1 — the tier's heaviest entry;
trained-k-means-cell blocking + LEFT SEMI keeper prune) and
``ngram_jaccard_pairs`` (the heaviest legacy-26 entry on the r11 driver
run; inverted-index candidates with df cap 100) had two-scale
(sf0.01/sf0.1) ratios only. Times both at sf0.1 and sf10 (100× rows,
the FK-preserving explode replica from tools/scale_rehearsal_sf10.py —
documents.text word-rotated per copy so cross-copy similarity stays at
background level) and flags super-linear scalers.

Expected shapes (the designs' predictions, committed before measuring):
ngram's df cap bounds candidate pairs per shingle at C(100,2) so work
grows ~linearly with rows; semantic dedup's k-means cells grow linearly
in membership so the within-cell prune grows ~quadratically PER CELL —
at fixed n_cells=8 a 100× corpus has 100× cell membership, so the
within-cell join is the honest floor unless cells are resized; the
probe records which prediction holds.

Methodology matches SCALE_r11_graph.json: ONE fresh 64 GiB-heap session
per (query, scale) probe — subprocess re-exec, so a probe's session
caches and JVM heap history can't flatter or poison the next probe.

Usage: python tools/scale_r12_dedup.py [out_json]   (default
SCALE_r12_dedup.json; reuses /tmp/spark_graft_sf10 when present).
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
QUERIES = ["semantic_dedup_stats", "ngram_jaccard_pairs"]


def _probe(name: str, sf_dir: str) -> int:
    """Child mode: run one query in this process's own session, print one
    JSON line {"sec": ..., "rows": ..., "spark_probe_sec": ...,
    "spark_probe_ok": ...}. The JVM shuffle probe runs in the SAME
    session immediately before the timed query, so a host-drift episode
    (the r12 first attempt measured 97% kernel time and 10-25x walls)
    marks the measurement instead of silently poisoning the artifact."""
    import bench
    from graphdb_td2_spark.session import get_spark

    import __spark_entry__ as entry_mod

    probe_ref = None
    if bench.CALIBRATION_REF.exists():
        probe_ref = json.loads(bench.CALIBRATION_REF.read_text()).get(
            "spark_probe_ref_sec"
        )
    spark = get_spark("scale-r12-probe")
    spark.range(1).count()
    spark_probe = bench.run_spark_probe(spark)
    fn = entry_mod.queries()[name]
    t0 = time.time()
    rows = len(fn(spark, sf_dir).collect())
    print(
        json.dumps(
            {
                "sec": round(time.time() - t0, 3),
                "rows": rows,
                "spark_probe_sec": spark_probe,
                "spark_probe_ok": bench.probe_within_tolerance(
                    spark_probe, probe_ref
                ),
            }
        )
    )
    spark.stop()
    return 0


def main() -> int:
    if len(sys.argv) >= 4 and sys.argv[1] == "--probe":
        return _probe(sys.argv[2], sys.argv[3])
    out_json = sys.argv[1] if len(sys.argv) > 1 else "SCALE_r12_dedup.json"

    if not Path(SF10_DIR, "lineitem.parquet").exists():
        print("# generating sf10 replica...", file=sys.stderr)
        from graphdb_td2_spark.session import get_spark
        from tools.scale_rehearsal_sf10 import _generate

        spark = get_spark("scale-r12-gen")
        _generate(spark)
        spark.stop()

    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="64g")
    results: dict[str, dict] = {"sf0.1": {}, "sf10": {}}
    # a point whose in-session shuffle probe is outside tolerance is
    # re-measured up to MAX_TRIES times (the box oscillates on shared
    # hosts — r12 saw probes 1.8-4.3 within 12 minutes); the first quiet
    # measurement wins, else the last attempt ships flagged
    MAX_TRIES = 3
    for name in QUERIES:
        for label, sf_dir in (("sf0.1", SF01_DIR), ("sf10", SF10_DIR)):
            for attempt in range(MAX_TRIES):
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
                rec["attempt"] = attempt + 1
                results[label][name] = rec
                print(f"# {label} {name}: {rec}", file=sys.stderr)
                if rec.get("spark_probe_ok"):
                    break

    ratios = {}
    flagged = []
    for name in QUERIES:
        b = results["sf0.1"][name].get("sec")
        g = results["sf10"][name].get("sec")
        r = round(g / b, 2) if b and g else None
        ratios[name] = r
        if r is not None and r > FLAG_RATIO_100X:
            flagged.append(name)
    all_quiet = all(
        rec.get("spark_probe_ok", False)
        for scale in results.values()
        for rec in scale.values()
    )
    out = {
        "metric": "dedup_tier_scale_rehearsal_r12",
        "all_probes_quiet": all_quiet,
        "note": (
            "dedup-tier walls at sf0.1 vs sf10 (100x rows; FK-preserving "
            "explode replica with per-copy word rotation; one fresh "
            "64GiB-heap session per probe via subprocess). Prior "
            "coverage: sf0.01/sf0.1 two-scale ratios only."
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
