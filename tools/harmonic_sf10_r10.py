"""Round-10 re-measure of HyperBall approximate harmonic at sf10 with
the free dispatch (VERDICT r9 task 6 "Done" clause: ≈425 s all-in, the
r9 number minus the ~20 s vertex-count probe). Two timings:

- stats_build_sec: one-time ``copurchase_stats`` job (lake-build cost —
  paid once per corpus, amortized across every later session), and
- query_sec: ``harmonic_centrality_approx_top20`` end-to-end with the
  sidecar warm (what every serving session pays).

Usage: SPARK_GRAFT_DRIVER_MEM=64g python tools/harmonic_sf10_r10.py
Writes HARMONIC_SF10_r10.json. Requires /tmp/spark_graft_sf10.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from tools.scale_rehearsal_sf10 import SF10_DIR  # noqa: E402

CODE = f"""
import json, sys, time
sys.path.insert(0, {str(ROOT)!r})
from graphdb_td2_spark.session import get_spark
from graphdb_td2_spark.lake import copurchase_stats
import __spark_entry__ as m
spark = get_spark("harmonic-sf10-r10")
spark.range(1).count()
t0 = time.time(); stats = copurchase_stats(spark, {SF10_DIR!r})
build = round(time.time() - t0, 1)
t0 = time.time()
rows = m.queries()["harmonic_centrality_approx_top20"](spark, {SF10_DIR!r}).collect()
q = round(time.time() - t0, 1)
print(json.dumps({{"stats_build_sec": build, "query_sec": q,
                   "n_vertices": stats["n_vertices"],
                   "n_edges": stats["n_edges"], "rows": len(rows)}}))
"""


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "HARMONIC_SF10_r10.json"
    if not Path(SF10_DIR).exists():
        raise SystemExit(f"{SF10_DIR} missing")
    proc = subprocess.run(
        [sys.executable, "-c", CODE],
        cwd=str(ROOT),
        capture_output=True,
        text=True,
        timeout=7200,
    )
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-3000:])
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    result["r9_all_in_sec"] = 444.8  # incl. ~20 s probe, SCALE_r9_graph.json
    Path(out_path).write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
