"""Dump ``explain("formatted")`` for registry queries into plans/<round>/.

Usage: python tools/dump_plans.py --out plans/r13 --suffix before \
           [--sf SF_DIR] query [query ...]

Queries that materialize eagerly (collect + createDataFrame inside the
entry, e.g. the iterative graph estimators) produce a trivial
LocalTableScan plan; for those the file still records it, and the
per-round plan shape is documented in OPTIMIZATION notes instead.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from graphdb_td2_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plan-dump")
    registry = entry_mod.queries()
    rc = 0
    for name in args.queries:
        try:
            df = registry[name](spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # keep dumping the rest
            plan = f"ERROR: {type(exc).__name__}: {exc}"
            rc = 1
        path = out_dir / f"{name}_{args.suffix}.txt"
        path.write_text(plan + "\n")
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()
    return rc


if __name__ == "__main__":
    main()
