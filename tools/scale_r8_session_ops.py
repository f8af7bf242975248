"""Cross-scale check (sf0.1 → synthetic sf1.0) for round 8's operator
additions: HITS, the shingle spectrum/novelty statistics, the MinHash
accuracy audit, the join-key skew report, source diversity, the
PageRank convergence curve, and the recommendation backtest. Writes
SCALE_r8_session_ops.json.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.scale_new_ops import run_at  # noqa: E402
from tools.scale_rehearsal import FLAG_RATIO, N_COPIES, SF1_DIR, generate  # noqa: E402

import tools.scale_new_ops as sno  # noqa: E402

R8_OPS = (
    "hits_top20",
    "shingle_frequency_spectrum",
    "shingle_novelty_curve",
    "minhash_accuracy_report",
    "join_key_skew_report",
    "source_diversity_index",
    "pagerank_convergence_curve",
    "recs_backtest_hitrate",
)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALE_r8_session_ops.json"
    sno.NEW_OPS = R8_OPS
    if not Path(SF1_DIR).exists():
        generate()
    t01 = run_at("/root/testdata/sf0.1")
    t1 = run_at(SF1_DIR)
    ratios = {q: round(t1[q] / t01[q], 2) for q in t01}
    flagged = sorted(
        (q for q, r in ratios.items() if r > FLAG_RATIO), key=lambda q: -ratios[q]
    )
    artifact = {
        "n_copies": N_COPIES,
        "sf1_dir": SF1_DIR,
        "sf0.1_sec": t01,
        "sf1.0_sec": t1,
        "time_ratio_sf1_over_sf01": ratios,
        "flag_threshold": FLAG_RATIO,
        "superlinear_flagged": flagged,
    }
    Path(out_path).write_text(json.dumps(artifact, indent=1) + "\n")
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
