"""IVM per-batch cost breakdown (round-7 VERDICT task #5): how many Spark
jobs does one micro-batch cost, where does the wall-clock go, and how much
of the measured per-batch constant is the streaming trigger vs the
maintenance work itself?

Two measurements over the same single-file micro-batch split of the
sf0.01 lineitem corpus:

1. DIRECT: call ``apply_cooccurrence_delta`` per batch under a per-batch
   job group, then read the AppStatusStore for every job's description
   and duration — the true jobs-per-batch table, no streaming engine.
2. STREAMING: ``run_incremental_cooccurrence`` end-to-end (availableNow
   foreachBatch) over a fresh state dir — total wall including trigger
   scheduling, checkpoint commits, and offset log writes. The delta
   between (2) and (1) is the engine overhead no operator fusing can
   remove.

Usage: python tools/ivm_batch_profile.py [out_json]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from graphdb_td2_spark.io import read_table  # noqa: E402
from graphdb_td2_spark.session import get_spark  # noqa: E402
from graphdb_td2_spark.streaming.ivm import (  # noqa: E402
    N_BUCKETS,
    apply_cooccurrence_delta,
    maintained_counts,
    run_incremental_cooccurrence,
)

SF_DIR = "/root/testdata/sf0.01"
N_FILES = 8


def _jobs_by_group(spark) -> dict[str, list[dict]]:
    store = spark._jsparkSession.sparkContext().statusStore()
    out: dict[str, list[dict]] = defaultdict(list)
    it = store.jobsList(None).iterator()
    while it.hasNext():
        j = it.next()
        group = j.jobGroup().isDefined() and j.jobGroup().get() or None
        dur = None
        if j.submissionTime().isDefined() and j.completionTime().isDefined():
            dur = (
                j.completionTime().get().getTime()
                - j.submissionTime().get().getTime()
            ) / 1000.0
        out[group or "<none>"].append(
            {
                "job_id": j.jobId(),
                "description": str(j.name())[:120],
                "sec": dur,
                "n_stages": j.stageIds().size(),
            }
        )
    return dict(out)


def main() -> int:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "IVM_PROFILE_r8.json"
    spark = get_spark("ivm-batch-profile")
    spark.range(1).count()  # JVM warm
    li = read_table(spark, SF_DIR, "lineitem", ["l_orderkey", "l_partkey"]).select(
        F.col("l_orderkey").alias("order_id"), F.col("l_partkey").alias("product_id")
    )
    root = tempfile.mkdtemp(prefix="ivm_profile_")
    batch_dir = f"{root}/batches"
    li.repartition(N_FILES).write.parquet(batch_dir)
    files = sorted(str(p) for p in Path(batch_dir).glob("part-*.parquet"))

    # ---- 1. direct per-batch application under job groups ----
    prev = {
        k: spark.conf.get(k)
        for k in ("spark.sql.shuffle.partitions", "spark.sql.adaptive.enabled")
    }
    # mirror run_incremental_cooccurrence's per-run confs
    spark.conf.set("spark.sql.shuffle.partitions", str(N_BUCKETS))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    state_direct = f"{root}/state_direct"
    per_batch: list[dict] = []
    try:
        for bid, f in enumerate(files):
            batch = spark.read.parquet(f)
            spark.sparkContext.setJobGroup(f"ivm-b{bid}", f"IVM batch {bid}")
            t0 = time.time()
            apply_cooccurrence_delta(spark, batch, bid, state_direct)
            wall = round(time.time() - t0, 3)
            spark.sparkContext.setJobGroup(None, None)
            per_batch.append({"batch": bid, "wall_sec": wall})
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    groups = _jobs_by_group(spark)
    for rec in per_batch:
        jobs = groups.get(f"ivm-b{rec['batch']}", [])
        rec["n_jobs"] = len(jobs)
        rec["jobs_sec"] = round(sum(j["sec"] or 0 for j in jobs), 3)
        rec["jobs"] = jobs
    n_direct = maintained_counts(spark, state_direct).count()

    # ---- 2. full streaming run over a fresh state ----
    # (the stream source expects lineitem-shaped column names)
    raw = read_table(spark, SF_DIR, "lineitem", ["l_orderkey", "l_partkey"])
    stream_dir = f"{root}/stream"
    raw.repartition(N_FILES).write.parquet(stream_dir)
    state_stream = f"{root}/state_stream"
    t0 = time.time()
    run_incremental_cooccurrence(spark, stream_dir, state_stream, schema=raw.schema)
    stream_wall = round(time.time() - t0, 3)
    n_stream = maintained_counts(spark, state_stream).count()

    direct_wall = round(sum(r["wall_sec"] for r in per_batch), 3)
    artifact = {
        "metric": "ivm_batch_profile",
        "sf_dir": SF_DIR,
        "n_batches": len(files),
        "direct_total_sec": direct_wall,
        "streaming_total_sec": stream_wall,
        "trigger_overhead_sec": round(stream_wall - direct_wall, 3),
        "rows_maintained": n_direct,
        "rows_match_streaming": n_direct == n_stream,
        "per_batch": per_batch,
    }
    Path(out_json).write_text(json.dumps(artifact, indent=1) + "\n")
    print(json.dumps({k: v for k, v in artifact.items() if k != "per_batch"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
