"""Sustained streaming-dedup evidence (VERDICT r11 task 6): run the
incremental MinHash-LSH maintenance (``streaming/dedup_stream.py``) over
N micro-batches at sf0.1 and record, per batch:

- wall_sec — end-to-end ``apply_minhash_delta`` cost,
- state_rows_read — bucket rows the batch's cross-join actually read
  (the partitions < batch_id union; proves the replay-safe read bound:
  a batch NEVER reads its own or later partitions),
- state_partitions_read — how many ``batch=i`` dirs that union spans,
- state_bytes — on-disk bytes of the accumulated bucket state,
- pairs_emitted — Δpairs this batch produced,
- pairs_bytes — on-disk bytes of the accumulated pair set.

The claims under test (module docstring, ``dedup_stream.py:17-35``):
appends only (state is never rewritten — byte growth per batch ≈ the
batch's own bucket rows), each unordered pair emitted in EXACTLY one
batch, and per-batch wall stays flat-ish: the join side is pruned to
the batch's (band, bucket) keys by broadcast hash join, so the growing
state contributes a scan whose cost is bounded by the bucket relation —
the honest growth term at this state size is parquet-footer/file-listing
overhead (one file per batch partition), which the artifact records
instead of hiding.

Run ends with a correctness certificate: the maintained pair set equals
the batch engine's uncapped LSH pair relation computed from scratch —
0 differing rows — and the exactly-once-pair claim is checked by
asserting no (doc_id_a, doc_id_b) appears in two batch partitions.

Usage: python tools/stream_dedup_sustained_profile.py [out_json] [n_batches]
(defaults STREAM_DEDUP_r12.json, 24).
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

from graphdb_td2_spark.dedup.minhash import (  # noqa: E402
    band_buckets,
    minhash_signatures,
)
from graphdb_td2_spark.io import read_table  # noqa: E402
from graphdb_td2_spark.session import get_spark  # noqa: E402
from graphdb_td2_spark.streaming.dedup_stream import (  # noqa: E402
    _BUCKETS_SCHEMA,
    _read_partitions_below,
    apply_minhash_delta,
    maintained_pairs,
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


def main() -> int:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "STREAM_DEDUP_r12.json"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    spark = get_spark("stream-dedup-sustained-profile")
    spark.range(1).count()

    docs = read_table(spark, SF_DIR, "documents", ["doc_id", "text"])
    root = tempfile.mkdtemp(prefix="mh_sustained_")
    batch_dir = f"{root}/batches"
    docs.repartition(n_batches).write.parquet(batch_dir)
    files = sorted(str(p) for p in Path(batch_dir).glob("part-*.parquet"))
    state_dir = f"{root}/state"

    per_batch: list[dict] = []
    for bid, f in enumerate(files):
        batch = spark.read.parquet(f)
        n_rows = batch.count()
        # measure the read bound the delta will see (cheap counts — done
        # OUTSIDE the timed window so the wall number is the delta alone)
        state = _read_partitions_below(
            spark, f"{state_dir}/state", _BUCKETS_SCHEMA, bid
        )
        state_rows = state.count()
        n_parts = len(
            [
                d
                for d in (
                    os.listdir(f"{state_dir}/state")
                    if os.path.isdir(f"{state_dir}/state")
                    else []
                )
                if d.startswith("batch=") and int(d.split("=", 1)[1]) < bid
            ]
        )
        t0 = time.monotonic()
        apply_minhash_delta(spark, batch, bid, state_dir)
        wall = round(time.monotonic() - t0, 3)
        pairs_emitted = spark.read.parquet(
            f"{state_dir}/pairs/batch={bid}"
        ).count()
        rec = {
            "batch": bid,
            "n_docs": n_rows,
            "wall_sec": wall,
            "state_rows_read": state_rows,
            "state_partitions_read": n_parts,
            "pairs_emitted": pairs_emitted,
            "state_bytes": _dir_bytes(f"{state_dir}/state"),
            "pairs_bytes": _dir_bytes(f"{state_dir}/pairs"),
        }
        per_batch.append(rec)
        print(
            f"# batch {bid}: {wall}s docs={n_rows} state_read={state_rows}"
            f" ({n_parts} parts) pairs+={pairs_emitted}",
            file=sys.stderr,
        )

    # certificate 1: maintained pair set == from-scratch uncapped batch LSH
    maintained = maintained_pairs(spark, state_dir)
    buckets = band_buckets(minhash_signatures(docs))
    a, b = buckets.alias("a"), buckets.alias("b")
    scratch = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
    diff = (
        maintained.exceptAll(scratch).count()
        + scratch.exceptAll(maintained).count()
    )

    # certificate 2: each unordered pair lives in exactly one batch dir
    with_batch = spark.read.parquet(f"{state_dir}/pairs")  # batch= surfaces
    dup_pairs = (
        with_batch.groupBy("doc_id_a", "doc_id_b")
        .agg(F.countDistinct("batch").alias("n_batches"))
        .filter(F.col("n_batches") > 1)
        .count()
    )

    walls = [r["wall_sec"] for r in per_batch]
    half = len(walls) // 2
    growth = [
        per_batch[i]["state_bytes"] - per_batch[i - 1]["state_bytes"]
        for i in range(1, len(per_batch))
    ]
    out = {
        "experiment": "sustained incremental MinHash-LSH micro-batches "
        "(direct apply) at " + SF_DIR,
        "n_batches": len(per_batch),
        "per_batch": per_batch,
        "wall_mean_first_half": round(sum(walls[:half]) / half, 3),
        "wall_mean_second_half": round(
            sum(walls[half:]) / (len(walls) - half), 3
        ),
        "final_state_mib": round(per_batch[-1]["state_bytes"] / (1 << 20), 2),
        "final_pairs_mib": round(per_batch[-1]["pairs_bytes"] / (1 << 20), 2),
        "state_growth_bytes_per_batch_mean": round(
            sum(growth) / len(growth)
        ),
        "total_pairs_emitted": sum(r["pairs_emitted"] for r in per_batch),
        "maintained_vs_scratch_diff_rows": diff,
        "pairs_in_multiple_batches": dup_pairs,
        "maintained_n_pairs": maintained.count(),
    }
    Path(out_json).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({k: v for k, v in out.items() if k != "per_batch"}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
