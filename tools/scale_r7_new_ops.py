"""Cross-scale check (sf0.1 → synthetic sf1.0) for round 7's additions:
cross-source overlap, batch perceptron, conversion funnel, session
paths, plus the percentile-converted daily bands. Writes
SCALE_r7_new_ops.json.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.scale_new_ops import run_at  # noqa: E402
from tools.scale_rehearsal import FLAG_RATIO, N_COPIES, SF1_DIR, generate  # noqa: E402

import tools.scale_new_ops as sno  # noqa: E402

R7_OPS = (
    "source_overlap_matrix",
    "perceptron_lang_curve",
    "conversion_funnel_steps",
    "top_session_paths",
    "daily_value_bands",
    "value_percentiles",
    "event_value_anomalies",
)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALE_r7_new_ops.json"
    sno.NEW_OPS = R7_OPS
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
