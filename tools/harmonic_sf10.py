"""Complete the graph-tier sf10 record: run harmonic_centrality_top20
(the one query SCALE_r8_graph.json excluded by time budget) at sf0.1 and
sf10 and merge the timings into that artifact.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from graphdb_td2_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF10 = "/tmp/spark_graft_sf10"
Q = "harmonic_centrality_top20"


def main() -> int:
    art_path = Path("SCALE_r8_graph.json")
    spark = get_spark("harmonic-sf10")
    spark.range(1).count()
    fn = entry_mod.queries()[Q]
    times = {}
    for sf_dir in (SF01, SF10):
        t0 = time.time()
        n = len(fn(spark, sf_dir).collect())
        times[sf_dir] = round(time.time() - t0, 3)
        print(f"# {sf_dir} {Q}: {times[sf_dir]}s ({n} rows)", file=sys.stderr)
    art = json.loads(art_path.read_text())
    art.setdefault("sf10", {})[Q] = times[SF10]
    art["sf10_harmonic_note"] = (
        f"harmonic completed post-hoc via tools/harmonic_sf10.py: "
        f"sf0.1={times[SF01]}s sf10={times[SF10]}s "
        f"ratio@100x={round(times[SF10] / times[SF01], 2)}"
    )
    art_path.write_text(json.dumps(art, indent=1) + "\n")
    print(json.dumps({Q: times, "ratio": round(times[SF10] / times[SF01], 2)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
