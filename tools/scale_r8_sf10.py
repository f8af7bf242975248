"""sf10 (100× sf0.1) rehearsal for the heaviest round-8 additions —
HITS and the recommendation backtest — plus the convergence curve,
reusing the FK-preserving explode-replication corpus and ETL/serving
split of tools/scale_rehearsal_sf10.py. Writes SCALE_r8_sf10.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import tools.scale_rehearsal_sf10 as base_mod  # noqa: E402
from graphdb_td2_spark.session import get_spark  # noqa: E402

R8_QUERIES = [
    "hits_top20",
    "recs_backtest_hitrate",
    "pagerank_convergence_curve",
]


def main() -> int:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "SCALE_r8_sf10.json"
    base_mod.QUERIES = R8_QUERIES
    spark = get_spark("scale-r8-sf10")
    if not Path(base_mod.SF10_DIR, "lineitem.parquet").exists():
        t0 = time.time()
        base_mod._generate(spark)
        print(f"# corpus generated in {time.time() - t0:.0f}s", file=sys.stderr)
    base = base_mod._run(spark, base_mod.SF01_DIR)
    big = base_mod._run(spark, base_mod.SF10_DIR)
    ratios = {
        q: (
            round(big["queries"][q] / base["queries"][q], 2)
            if base["queries"].get(q)
            else None
        )
        for q in R8_QUERIES
    }
    flagged = [
        q for q, r in ratios.items() if r is not None and r > base_mod.FLAG_RATIO
    ]
    artifact = {
        "metric": "sf10_rehearsal_r8_ops",
        "n_copies": base_mod.N_COPIES,
        "sf0.1": base,
        "sf10": big,
        "ratios_vs_100x": ratios,
        "flagged_super_linear": flagged,
    }
    Path(out_json).write_text(json.dumps(artifact, indent=1) + "\n")
    print(json.dumps(artifact))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
