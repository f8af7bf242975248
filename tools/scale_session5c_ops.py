"""Cross-scale check (sf0.1 → synthetic sf1.0) for the third wave of
round 6's fifth session: the Q7/Q8 join shapes, distributed prefix sum,
batch recommendations, drift/series ops, training-data ops (PIT, span
corruption, dataset card, BPE encode), VARIANT profiling, streaming
actives, and the embedding/centroid audits.
Writes SCALE_r6_session5c_ops.json.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.scale_new_ops import run_at  # noqa: E402
from tools.scale_rehearsal import FLAG_RATIO, N_COPIES, SF1_DIR, generate  # noqa: E402

import tools.scale_new_ops as sno  # noqa: E402

SESSION5C_OPS = (
    "running_revenue_distributed",
    "rolling_type_correlation",
    "geo_hierarchy_rollup",
    "bpe_encoded_stats",
    "variant_props_stats",
    "pit_training_set_stats",
    "label_centroid_distances",
    "channel_cohort_retention",
    "dataset_card",
    "streaming_daily_actives",
    "span_corruption_stats",
    "shipping_latency_quantiles",
    "supplier_concentration_topk",
    "nation_trade_flows",
    "winsorized_value_stats",
    "daily_count_autocorr",
    "batch_recommendations_stats",
    "smoothed_daily_revenue",
    "weekly_product_movers",
    "script_profile",
    "brand_market_share_by_year",
    "embedding_quality_report",
)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALE_r6_session5c_ops.json"
    sno.NEW_OPS = SESSION5C_OPS
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
