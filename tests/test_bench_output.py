"""Pin the bench compact-stdout-line contract (VERDICT r10 task 1).

The driver keeps only the last 2000 chars of bench stdout; r10's single
~6.5 KB JSON line came back ``parsed: null``. ``bench.build_outputs``
now splits a compact last-line summary from a full per-query file —
these tests pin (a) the byte budget under worst-case timings and
(b) the null-not-zero semantics for totals with missing members
(ADVICE r10: ``timings.get(q, 0.0)`` made a failing query look like a
speedup).
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def _fake_run(timings):
    spread = {q: [round(v * 0.9, 3), round(v * 1.1, 3)] for q, v in timings.items()}
    return bench.build_outputs(
        timings=timings,
        spread=spread,
        errors={},
        sf=0.1,
        lake_build=11.123,
        n_runs=3,
        cal_before=0.512,
        cal_after=0.498,
        cal_ref=0.479,
        cal_ok=True,
        # max-width probe fields: the builder sets EVERY compact field, so
        # the worst-case budget test must exercise them all (ADVICE r11)
        spark_probe=99999.999,
        probe_ref=99999.999,
        probe_ok=False,
        full_name="BENCH_local_r99.json",
    )


def test_compact_line_fits_driver_tail_worst_case():
    # worst case: every headline query timed, every value max-width
    timings = {q: 99999.999 for q in bench.HEADLINE}
    compact, full = _fake_run(timings)
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) <= bench.COMPACT_LINE_BUDGET, len(line)
    # the compact line still satisfies the driver contract shape
    assert compact["metric"] == "headline_query_wall_clock_total"
    assert compact["unit"] == "sec"
    assert set(compact["queries"]) == set(bench.HEADLINE_LEGACY)
    # every field main() emits is set by the builder (ADVICE r11): the
    # probe gate fields and the full-file pointer are on the tested line
    assert compact["spark_probe_sec"] == 99999.999
    assert compact["spark_probe_ref_sec"] == 99999.999
    assert compact["spark_probe_ok"] is False
    assert compact["full"] == "BENCH_local_r99.json"
    # fit_compact_line passes the already-within-budget line through intact
    assert bench.fit_compact_line(compact) == line
    # full file keeps the complete per-query map + spreads
    assert set(full["queries"]) == set(bench.HEADLINE)
    assert set(full["spread"]) == set(bench.HEADLINE)


def test_spark_probe_gate_decision():
    """Pin the JVM-probe gate (VERDICT r11 task 1) without a JVM."""
    # informational modes never block: no reference, or probe failed
    assert bench.probe_within_tolerance(None, None)
    assert bench.probe_within_tolerance(5.0, None)
    assert bench.probe_within_tolerance(None, 5.0)
    # within ±25% passes, outside refuses — both directions
    assert bench.probe_within_tolerance(6.2, 5.0)  # +24%
    assert not bench.probe_within_tolerance(6.3, 5.0)  # +26%
    assert bench.probe_within_tolerance(3.8, 5.0)  # -24%
    assert not bench.probe_within_tolerance(3.7, 5.0)  # -26%
    # the r11 drift class (+30-45%, PERF_NOTES_r11 §9) is caught
    assert not bench.probe_within_tolerance(5.0 * 1.30, 5.0)
    assert not bench.probe_within_tolerance(5.0 * 1.45, 5.0)


def test_fit_compact_line_degrades_instead_of_raising():
    """An over-budget compact line drops optional fields in the fixed
    order and never raises (ADVICE r11: the artifact must survive its
    own size guard)."""
    timings = {q: 99999.999 for q in bench.HEADLINE}
    compact, _ = _fake_run(timings)
    # blow the budget with a field the fitter is allowed to drop
    compact["tier_totals"] = {f"tier_{i}": 99999.999 for i in range(200)}
    line = bench.fit_compact_line(compact)
    assert len(line) <= bench.COMPACT_LINE_BUDGET
    out = json.loads(line)
    assert "tier_totals" not in out
    assert "tier_totals" in out["dropped_over_budget"]
    # essentials survive the degradation
    assert out["metric"] == "headline_query_wall_clock_total"
    assert out["value"] == compact["value"]
    assert "queries" in out  # dropped only as the last resort


def test_compact_line_fits_with_errors_and_missing():
    # every query in one tier errored: totals must be null, names listed
    dead_tier = "graph_iterative"
    dead = set(bench.TIERS[dead_tier])
    timings = {q: 99999.999 for q in bench.HEADLINE if q not in dead}
    spread = {q: [v, v] for q, v in timings.items()}
    compact, full = bench.build_outputs(
        timings=timings,
        spread=spread,
        errors={q: "RuntimeError: boom" for q in sorted(dead)},
        sf=0.1,
        lake_build=None,
        n_runs=3,
        cal_before=0.9,
        cal_after=0.9,
        cal_ref=0.479,
        cal_ok=False,
    )
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) <= bench.COMPACT_LINE_BUDGET, len(line)
    assert compact["tier_totals"][dead_tier] is None
    assert full["tier_missing"][dead_tier] == bench.TIERS[dead_tier]
    # compact list is capped at 8 names + "+N more"; full is complete
    assert compact["error_queries"][:8] == sorted(dead)[:8]
    assert full["error_queries"] == sorted(dead)
    # untouched tiers still sum normally
    assert compact["tier_totals"]["multimodal"] is not None


def test_legacy_total_null_when_member_missing():
    timings = {q: 1.0 for q in bench.HEADLINE}
    del timings["sessionize"]  # a legacy-26 member
    compact, _ = _fake_run(timings)
    assert compact["legacy26_total"] is None
    assert compact["legacy26_missing"] == ["sessionize"]
    assert compact["tier_totals"]["windows_timeseries"] is None


def test_full_output_roundtrips_json():
    timings = {q: 1.234 for q in bench.HEADLINE}
    compact, full = _fake_run(timings)
    assert json.loads(json.dumps(full))["legacy26_total"] == round(
        1.234 * len(bench.HEADLINE_LEGACY), 3
    )
    assert compact["legacy26_total"] == full["legacy26_total"]


def test_compact_line_survives_catastrophic_run():
    """Every query errored: the compact line must cap its name lists
    (\"+N more\") and stay under budget instead of tripping the size
    assertion and losing the artifact."""
    compact, full = bench.build_outputs(
        timings={},
        spread={},
        errors={q: "RuntimeError: boom" for q in bench.HEADLINE},
        sf=0.1,
        lake_build=None,
        n_runs=3,
        cal_before=0.9,
        cal_after=0.9,
        cal_ref=0.479,
        cal_ok=False,
    )
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) <= bench.COMPACT_LINE_BUDGET, len(line)
    assert compact["error_queries"][-1].startswith("+")
    assert len(full["error_queries"]) == len(bench.HEADLINE)  # uncapped
    assert compact["legacy26_total"] is None
