"""Registry-wide physical-plan audit: compile EVERY ``queries()`` entry
at sf0.001 and record its join strategies, exchange count, and top-k
compilation. tests/test_plans.py asserts the load-bearing shapes for 25
queries; this artifact proves the remaining registry compiles clean too
— in particular that NO query anywhere contains a ``CartesianProduct``
(a non-broadcast product is the one plan node that cannot survive a
100 TB scale-up).

``BroadcastNestedLoopJoin`` is counted but not flagged: every instance
in this engine is a deliberate broadcast of a scalar/centroid/axis-sized
side (the 1-row scalar-subquery pattern and the k-row ANN assignment
scans), which is a filter at any scale.

Usage: python tools/plan_audit.py [--json OUT.json] [sf_dir]
"""

from __future__ import annotations

import json
import re
import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from graphdb_td2_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402

NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "TakeOrderedAndProject",
)


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = "PLAN_AUDIT_r6.json"
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"

    spark = get_spark("plan-audit")
    results: dict[str, dict] = {}
    for name, fn in entry_mod.queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            row = {n: plan.count(n) for n in NODES}
            row["exchanges"] = len(re.findall(r"\bExchange\b", plan))
            results[name] = row
        except Exception as exc:  # noqa: BLE001
            traceback.print_exc()
            results[name] = {"error": str(exc)[:300]}
    flagged = sorted(
        n
        for n, r in results.items()
        if r.get("CartesianProduct", 0) > 0 or "error" in r
    )
    artifact = {
        "sf_dir": sf_dir,
        "n_queries": len(results),
        "cartesian_or_error_flagged": flagged,
        "results": results,
    }
    Path(json_out).write_text(json.dumps(artifact, indent=1, sort_keys=True) + "\n")
    print(json.dumps({"n_queries": len(results), "flagged": flagged}))
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
