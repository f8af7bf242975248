"""Sustained IVM micro-batch evidence (VERDICT r10 task #3): run the
cooccurrence maintenance over N≥20 micro-batches at sf0.1 and record,
per batch:

- wall_sec — end-to-end ``apply_cooccurrence_delta`` cost,
- live_state_bytes — bytes of the segment dirs the committed manifest
  actually references (the read-amplification bound),
- total_dir_bytes — everything under the state dir incl. not-yet-GC'd
  versions (the durability footprint between GC sweeps),
- n_segments / max_bucket_segments per part — LSM depth,
- compacted — whether this batch's commit included a level-merge.

This is the empirical proof of `streaming/ivm.py:15-45`'s claims: per-
batch write I/O is O(Δ) not O(state) (flat wall across batches even as
state grows), and compaction bounds per-bucket segment lists at
COMPACT_SEGMENTS+1 (max_bucket_segments never exceeds it post-commit).
The run ends with a correctness certificate: maintained counts equal a
from-scratch recompute over the full input.

Usage: python tools/ivm_sustained_profile.py [out_json] [n_batches]
(defaults IVM_BATCH_r11.json, 24).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from graphdb_td2_spark.io import read_table  # noqa: E402
from graphdb_td2_spark.session import get_spark  # noqa: E402
from graphdb_td2_spark.streaming.ivm import (  # noqa: E402
    COMPACT_SEGMENTS,
    N_BUCKETS,
    _read_manifest,
    apply_cooccurrence_delta,
    maintained_counts,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _manifest_stats(spark, state_dir: str, version: int) -> dict:
    man = _read_manifest(spark, state_dir, version)
    out = {}
    live = 0
    for part in ("items", "counts"):
        buckets = man.get(part, {})
        seg_lists = list(buckets.values())
        n_segments = sum(len(s) for s in seg_lists)
        max_bucket = max((len(s) for s in seg_lists), default=0)
        for segs in seg_lists:
            for rel in segs:
                live += _dir_bytes(f"{state_dir}/{rel}")
        out[part] = {
            "n_segments": n_segments,
            "max_bucket_segments": max_bucket,
        }
    out["live_state_bytes"] = live
    return out


def main() -> int:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "IVM_BATCH_r11.json"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    spark = get_spark("ivm-sustained-profile")
    spark.range(1).count()

    li = read_table(spark, SF_DIR, "lineitem", ["l_orderkey", "l_partkey"]).select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_partkey").alias("product_id"),
    )
    root = tempfile.mkdtemp(prefix="ivm_sustained_")
    batch_dir = f"{root}/batches"
    li.repartition(n_batches).write.parquet(batch_dir)
    files = sorted(str(p) for p in Path(batch_dir).glob("part-*.parquet"))
    state_dir = f"{root}/state"

    prev_conf = {
        k: spark.conf.get(k)
        for k in ("spark.sql.shuffle.partitions", "spark.sql.adaptive.enabled")
    }
    spark.conf.set("spark.sql.shuffle.partitions", str(N_BUCKETS))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    per_batch: list[dict] = []
    try:
        for bid, f in enumerate(files):
            batch = spark.read.parquet(f)
            n_rows = batch.count()
            t0 = time.monotonic()
            apply_cooccurrence_delta(spark, batch, bid, state_dir)
            wall = round(time.monotonic() - t0, 3)
            stats = _manifest_stats(spark, state_dir, bid)
            compacted = os.path.isdir(
                f"{state_dir}/v{bid}/items_compact"
            ) or os.path.isdir(f"{state_dir}/v{bid}/counts_compact")
            per_batch.append(
                {
                    "batch": bid,
                    "n_rows": n_rows,
                    "wall_sec": wall,
                    "compacted": compacted,
                    "live_state_bytes": stats["live_state_bytes"],
                    "total_dir_bytes": _dir_bytes(state_dir),
                    "items": stats["items"],
                    "counts": stats["counts"],
                }
            )
            print(
                f"# batch {bid}: {wall}s rows={n_rows} "
                f"live={stats['live_state_bytes'] >> 20}MiB "
                f"segs={stats['items']['n_segments']}/{stats['counts']['n_segments']}"
                f"{' COMPACT' if compacted else ''}",
                file=sys.stderr,
            )
    finally:
        for k, v in prev_conf.items():
            spark.conf.set(k, v)

    # correctness certificate: maintained view == from-scratch recompute
    maintained = maintained_counts(spark, state_dir)
    items = li.distinct()
    a, b = items.alias("a"), items.alias("b")
    scratch = (
        a.join(
            b,
            (F.col("a.order_id") == F.col("b.order_id"))
            & (F.col("a.product_id") < F.col("b.product_id")),
        )
        .groupBy(
            F.col("a.product_id").alias("product_a"),
            F.col("b.product_id").alias("product_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )
    diff = (
        maintained.exceptAll(scratch).count()
        + scratch.exceptAll(maintained).count()
    )

    walls = [r["wall_sec"] for r in per_batch]
    half = len(walls) // 2
    compact_batches = [r["batch"] for r in per_batch if r["compacted"]]
    max_bucket_ever = max(
        max(r["items"]["max_bucket_segments"], r["counts"]["max_bucket_segments"])
        for r in per_batch
    )
    out = {
        "experiment": "sustained IVM micro-batches (direct apply) at "
        + SF_DIR,
        "n_batches": len(per_batch),
        "n_buckets": N_BUCKETS,
        "compact_segments": COMPACT_SEGMENTS,
        "per_batch": per_batch,
        "wall_mean_first_half": round(sum(walls[:half]) / half, 3),
        "wall_mean_second_half": round(
            sum(walls[half:]) / (len(walls) - half), 3
        ),
        "compaction_batches": compact_batches,
        "max_bucket_segments_ever": max_bucket_ever,
        "final_live_state_mib": round(
            per_batch[-1]["live_state_bytes"] / (1 << 20), 1
        ),
        "maintained_vs_scratch_diff_rows": diff,
        "maintained_n_pairs": maintained.count(),
    }
    Path(out_json).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({k: v for k, v in out.items() if k != "per_batch"}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
