"""Broadcast vs sort-merge A/B on the engine's dimension joins — the
optimizer-evidence artifact: the SAME logical query timed with
(a) default planning (broadcast under the 10 MB threshold) and
(b) broadcast disabled (forcing shuffle joins), at sf0.1.
Writes JOINAB_r6.json.

Usage: python tools/join_ab_bench.py [--json OUT.json] [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from graphdb_td2_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402

QUERIES = ("recs_customer_cf", "brand_revenue", "local_supplier_volume",
           "geo_hierarchy_rollup")


def run(spark, qs, sf_dir) -> dict[str, float]:
    out = {}
    for name in QUERIES:
        t0 = time.time()
        qs[name](spark, sf_dir).collect()
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = "JOINAB_r6.json"
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"

    spark = get_spark("join-ab")
    spark.range(1).count()
    qs = entry_mod.queries()
    run(spark, qs, sf_dir)  # warm the reader cache so A/B isolates the join
    default_t = run(spark, qs, sf_dir)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    no_bcast_t = run(spark, qs, sf_dir)
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    artifact = {
        "sf_dir": sf_dir,
        "default_broadcast_s": default_t,
        "broadcast_disabled_s": no_bcast_t,
        "slowdown_x": {
            q: round(no_bcast_t[q] / default_t[q], 2) for q in default_t
        },
    }
    Path(json_out).write_text(json.dumps(artifact, indent=2) + "\n")
    print(json.dumps(artifact["slowdown_x"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
