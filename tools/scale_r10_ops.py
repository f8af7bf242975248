"""Cross-scale check (sf0.1 → synthetic sf1.0, 10× rows) for the six
registry entries the r9 VERDICT flagged as having design arguments but
no measured ratio — winnowing (restructured this round), TF-IDF near-dup
(absolute df cap this round), the HLL accuracy audit, the streaming
top-k leaderboard, deterministic Luby MIS, Markov removal attribution —
plus the round-10 addition ``betweenness_approx_error_report``.
Writes SCALE_r10_ops.json.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.scale_new_ops import run_at  # noqa: E402
from tools.scale_rehearsal import FLAG_RATIO, N_COPIES, SF1_DIR, generate  # noqa: E402

import tools.scale_new_ops as sno  # noqa: E402

R10_OPS = (
    "winnowed_duplicate_spans",
    "tfidf_neardup_pairs",
    "hll_daily_actives_accuracy",
    "streaming_topk_products",
    "mis_round_sizes",
    "markov_removal_attribution",
    "betweenness_approx_error_report",
)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALE_r10_ops.json"
    sno.NEW_OPS = R10_OPS
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
        "flag_ratio": FLAG_RATIO,
        "sf0.1_sec": t01,
        "sf1_sec": t1,
        "ratio_at_10x_rows": ratios,
        "flagged_super_linear": flagged,
    }
    Path(out_path).write_text(json.dumps(artifact, indent=1) + "\n")
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
