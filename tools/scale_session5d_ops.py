"""Cross-scale check (sf0.1 → synthetic sf1.0) for the final wave of
round 6's fifth session: change-point detection, ANN recall/cell-balance,
basket histogram, repurchase cycles, media inventory, and segment churn.
Writes SCALE_r6_session5d_ops.json.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.scale_new_ops import run_at  # noqa: E402
from tools.scale_rehearsal import FLAG_RATIO, N_COPIES, SF1_DIR, generate  # noqa: E402

import tools.scale_new_ops as sno  # noqa: E402

SESSION5D_OPS = (
    "revenue_changepoint",
    "ann_recall_report",
    "ivf_cell_balance",
    "order_size_histogram",
    "repurchase_cycle_topk",
    "media_inventory",
    "segment_churn_rates",
)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALE_r6_session5d_ops.json"
    sno.NEW_OPS = SESSION5D_OPS
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
    Path(out_path).write_text(json.dumps(artifact, indent=2) + "\n")
    print(json.dumps({"superlinear_flagged": flagged, "ratios": ratios}))


if __name__ == "__main__":
    main()
