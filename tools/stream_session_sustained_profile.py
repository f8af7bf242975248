"""Sustained evidence for the one Python-state streaming operator
(VERDICT r12 task 5): run ``first_seen_stream`` — the
``applyInPandasWithState`` custom stateful operator at
``streaming/core.py`` — over N file-source micro-batches at sf0.1 and
record, per batch:

- wall_sec — one micro-batch end-to-end (file pickup → state update →
  memory-sink append),
- rows_in — events the batch carried,
- emitted — first-seen interactions the batch produced (update mode:
  each key is emitted in exactly one batch),
- state_rows — ``numRowsTotal`` from the query progress's state
  operator (distinct users seen so far — the operator's documented
  state bound),
- state_bytes — on-disk bytes of the checkpoint state store.

The claims under test (``first_seen_stream`` docstring): state is
bounded by |users| (the state-rows series must PLATEAU once every user
has appeared, while input keeps flowing), per-batch wall stays flat
(the Arrow batch cost rides batch size, not accumulated state), and the
operator is exactly-once per key across batches.

Run ends with two certificates:
1. no (user, product, rel_type) emitted in more than one batch;
2. the maintained output equals the from-scratch batch first-occurrence
   relation (min event_id per key over the whole corpus) — 0 differing
   rows. Batches are event_id-ordered ranges, so processing order and
   global event order agree and the equality is exact.

Usage: python tools/stream_session_sustained_profile.py [out_json]
[n_batches]   (defaults STREAM_SESSION_r13.json, 24).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from graphdb_td2_spark.io import read_table  # noqa: E402
from graphdb_td2_spark.session import get_spark  # noqa: E402
from graphdb_td2_spark.streaming.core import (  # noqa: E402
    EVENT_REL_TYPES,
    STREAM_STATE_PARTITIONS,
    first_seen_stream,
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
    out_json = sys.argv[1] if len(sys.argv) > 1 else "STREAM_SESSION_r13.json"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    spark = get_spark("stream-session-sustained-profile")
    spark.range(1).count()
    # the finite-replay state sizing (streaming/core.py): one state store
    # per shuffle partition; the profile's state is user-dimension-sized
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(STREAM_STATE_PARTITIONS)
    )

    events = read_table(
        spark, SF_DIR, "events", ["event_id", "user_id", "event_type", "props"]
    )
    root = tempfile.mkdtemp(prefix="fs_sustained_")
    staging = f"{root}/staging"
    # event_id-ordered contiguous ranges → processing order == global
    # event order, so "first seen in the stream" IS "min event_id"
    n_total = events.count()
    per = (n_total + n_batches - 1) // n_batches
    (
        events.withColumn(
            "b", ((F.col("event_id") - 1) / per).cast("int")
        )
        .repartition(1)
        .sortWithinPartitions("event_id")
        .write.partitionBy("b")
        .parquet(staging)
    )
    batch_dirs = sorted(
        (d for d in Path(staging).glob("b=*")),
        key=lambda p: int(p.name.split("=", 1)[1]),
    )

    input_dir = f"{root}/input"
    os.makedirs(input_dir)
    ckpt = f"{root}/ckpt"
    schema = spark.read.parquet(str(batch_dirs[0])).schema
    stream = spark.readStream.schema(schema).parquet(input_dir)
    q = (
        first_seen_stream(stream)
        .writeStream.format("memory")
        .queryName("fs_sustained")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )

    per_batch: list[dict] = []
    prev_sink = 0
    try:
        for bid, bdir in enumerate(batch_dirs):
            files = sorted(bdir.glob("part-*.parquet"))
            rows_in = spark.read.parquet(str(bdir)).count()
            t0 = time.monotonic()
            for i, f in enumerate(files):
                shutil.copy(f, f"{input_dir}/b{bid:03d}_{i}.parquet")
            q.processAllAvailable()
            wall = round(time.monotonic() - t0, 3)
            sink = spark.table("fs_sustained").count()
            prog = q.lastProgress or {}
            ops = prog.get("stateOperators") or []
            state_rows = ops[0].get("numRowsTotal") if ops else None
            rec = {
                "batch": bid,
                "rows_in": rows_in,
                "wall_sec": wall,
                "emitted": sink - prev_sink,
                "state_rows": state_rows,
                "state_bytes": _dir_bytes(f"{ckpt}/state"),
            }
            prev_sink = sink
            per_batch.append(rec)
            print(f"# batch {bid}: {rec}", file=sys.stderr)

        maintained = spark.table("fs_sustained").select(
            "user_id", "product_key", "rel_type", "first_event_id"
        )
        # certificate 1: exactly-once per key across the whole run
        dup_keys = (
            maintained.groupBy("user_id", "product_key", "rel_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .count()
        )
        # certificate 2: maintained == from-scratch batch first-occurrence
        rel = F.when(F.lit(False), F.lit(None))
        for k, v in EVENT_REL_TYPES.items():
            rel = rel.when(F.lower(F.col("event_type")) == k, F.lit(v))
        scratch = (
            events.select(
                "user_id",
                "event_id",
                F.get_json_object("props", "$.k").cast("long").alias(
                    "product_key"
                ),
                rel.alias("rel_type"),
            )
            .filter(
                F.col("rel_type").isNotNull()
                & F.col("product_key").isNotNull()
            )
            .groupBy("user_id", "product_key", "rel_type")
            .agg(F.min("event_id").alias("first_event_id"))
        )
        diff = (
            maintained.exceptAll(scratch).count()
            + scratch.exceptAll(maintained).count()
        )
        n_keys = scratch.count()
    finally:
        q.stop()

    walls = [r["wall_sec"] for r in per_batch]
    half = len(walls) // 2
    out = {
        "experiment": "sustained applyInPandasWithState first-seen "
        "micro-batches (file source, memory sink) at " + SF_DIR,
        "n_batches": len(per_batch),
        "per_batch": per_batch,
        "wall_mean_first_half": round(sum(walls[:half]) / half, 3),
        "wall_mean_second_half": round(
            sum(walls[half:]) / (len(walls) - half), 3
        ),
        "state_rows_final": per_batch[-1]["state_rows"],
        "state_rows_at_half": per_batch[half]["state_rows"],
        "final_state_mib": round(
            per_batch[-1]["state_bytes"] / (1 << 20), 2
        ),
        "total_emitted": sum(r["emitted"] for r in per_batch),
        "n_first_seen_keys_scratch": n_keys,
        "keys_emitted_in_multiple_batches": dup_keys,
        "maintained_vs_scratch_diff_rows": diff,
    }
    Path(out_json).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({k: v for k, v in out.items() if k != "per_batch"}))
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
