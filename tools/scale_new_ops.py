"""Cross-scale check (sf0.1 → synthetic sf1.0) for the operators added in
round 6: BM25 search + hybrid rerank, blocked fuzzy matching, weighted
SSSP, count-min sketch, forget cascade, classifier scoring. Same corpus
generator and flag threshold as tools/scale_rehearsal.py; writes
SCALE_r6_new_ops.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.scale_rehearsal import FLAG_RATIO, N_COPIES, SF1_DIR, generate  # noqa: E402

NEW_OPS = (
    "bm25_doc_topk",
    "hybrid_search_topk",
    "fuzzy_part_matches",
    "sssp_top20",
    "cms_heavy_hitters",
    "forget_customer_impact",
    "quality_logit_stats",
)


def run_at(sf_dir: str) -> dict[str, float]:
    import subprocess

    code = f"""
import json, sys, time
sys.path.insert(0, {str(Path(__file__).resolve().parent.parent)!r})
import __spark_entry__ as m
from graphdb_td2_spark.session import get_spark
spark = get_spark("scale-new-ops")
spark.range(1).count()
qs = m.queries()
out = {{}}
for name in {NEW_OPS!r}:
    t0 = time.time()
    n = len(qs[name](spark, {sf_dir!r}).collect())
    out[name] = round(time.time() - t0, 3)
    print(f"# {{name}}: {{out[name]}}s ({{n}} rows)", file=sys.stderr)
print(json.dumps(out))
"""
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=str(Path(__file__).resolve().parent.parent),
        capture_output=True,
        text=True,
        timeout=3600,
    )
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-2000:])
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALE_r6_new_ops.json"
    if not Path(SF1_DIR).exists():
        generate()
    t01 = run_at("/root/testdata/sf0.1")
    t1 = run_at(SF1_DIR)
    ratios = {q: round(t1[q] / t01[q], 2) for q in t01}
    flagged = sorted((q for q, r in ratios.items() if r > FLAG_RATIO), key=lambda q: -ratios[q])
    artifact = {
        "n_copies": N_COPIES,
        "sf1_dir": SF1_DIR,
        "sf0.1_sec": t01,
        "sf1.0_sec": t1,
        "time_ratio_sf1_over_sf01": ratios,
        "flag_threshold": FLAG_RATIO,
        "superlinear_flagged": flagged,
    }
    Path(out_path).write_text(json.dumps(artifact, indent=2) + "\n")
    print(json.dumps({"superlinear_flagged": flagged, "ratios": ratios}))


if __name__ == "__main__":
    main()
