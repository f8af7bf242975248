"""Quantitative pruning micro-bench (round-2 VERDICT item 7): measure the
BYTES actually read — not just the plan shape — for

1. Z-order layout (functions/zorder.py): the same lineitem rows written
   (a) unsorted and (b) Z-ordered by (l_orderkey, l_partkey), then
   filtered on a narrow l_partkey range. Z-ordering tightens per-file and
   per-row-group min/max stats on BOTH interleaved columns, so the
   parquet reader skips row groups the unsorted layout must scan.
2. Hive partition pruning (sources/sinks.py:write_partitioned): events
   written (a) flat and (b) partitioned by event date, then filtered to
   one day. Partition pruning drops whole directories at planning time.

Bytes read come from Spark's own task input metrics (stage inputBytes via
the status REST API — real FS bytes, which is what a 100 TB scan pays),
on a dedicated UI-enabled local session. Row counts/sums are asserted
identical across layouts, so the comparison is apples-to-apples.

Usage: python tools/pruning_bench.py [sf_dir] [out_json]
Writes a JSON artifact (default PRUNING_r3.json at the repo root).
"""

from __future__ import annotations

import json
import sys
import tempfile
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from graphdb_td2_spark.functions.zorder import write_zordered  # noqa: E402
from graphdb_td2_spark.io import read_table  # noqa: E402 (nanos ts handling)
from graphdb_td2_spark.sources.sinks import write_partitioned  # noqa: E402


def _spark() -> SparkSession:
    return (
        SparkSession.builder.master("local[8]")
        .appName("pruning-bench")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def _stages(spark: SparkSession) -> dict[int, int]:
    app_id = spark.sparkContext.applicationId
    url = f"{spark.sparkContext.uiWebUrl}/api/v1/applications/{app_id}/stages"
    data = json.loads(urllib.request.urlopen(url).read())
    return {s["stageId"]: s.get("inputBytes", 0) for s in data}


def measure_bytes(spark: SparkSession, run) -> tuple[int, object]:
    """Run ``run()`` and return (bytes read by its new stages, result)."""
    before = _stages(spark)
    result = run()
    after = _stages(spark)
    new = sum(v for k, v in after.items() if k not in before)
    return new, result


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else str(
        Path(__file__).resolve().parent.parent / "PRUNING_r3.json"
    )
    spark = _spark()
    tmp = tempfile.mkdtemp(prefix="pruning_bench_")
    report: dict = {"sf_dir": sf_dir}

    # --- 1. Z-order vs unsorted: narrow l_partkey range ---------------------
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    max_part = li.agg(F.max("l_partkey")).first()[0]
    lo, hi = int(max_part * 0.40), int(max_part * 0.42)  # ~2% of the key range

    plain_dir, z_dir = f"{tmp}/li_plain", f"{tmp}/li_zorder"
    # same file count both layouts — the delta is LAYOUT, not file sizing
    # (64 files ≈ the stat granularity a big table's row groups give for
    # free; at sf0.1 each file is one row group, so files ARE the units)
    li.repartition(64).write.parquet(plain_dir)
    write_zordered(li, z_dir, "l_orderkey", "l_partkey", n_files=64)

    def q(path: str):
        return (
            spark.read.parquet(path)
            .filter(F.col("l_partkey").between(lo, hi))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("l_quantity").alias("s"),
            )
            .collect()[0]
        )

    plain_bytes, plain_row = measure_bytes(spark, lambda: q(plain_dir))
    z_bytes, z_row = measure_bytes(spark, lambda: q(z_dir))
    assert (plain_row["n"], plain_row["s"]) == (z_row["n"], z_row["s"]), (
        "layouts must return identical results"
    )
    report["zorder_rowgroup_pruning"] = {
        "filter": f"l_partkey BETWEEN {lo} AND {hi}",
        "rows_matched": plain_row["n"],
        "unsorted_bytes_read": plain_bytes,
        "zordered_bytes_read": z_bytes,
        "bytes_ratio": round(z_bytes / plain_bytes, 4) if plain_bytes else None,
    }

    # --- 2. partition pruning: one day of events ----------------------------
    ev = read_table(
        spark, sf_dir, "events", ["event_id", "user_id", "value", "ts"]
    ).withColumn("event_date", F.to_date("ts"))
    flat_dir, part_dir = f"{tmp}/ev_flat", f"{tmp}/ev_part"
    ev.repartition(8).write.parquet(flat_dir)
    write_partitioned(ev, part_dir, ["event_date"])
    day = ev.groupBy("event_date").count().orderBy(F.desc("count")).first()[
        "event_date"
    ]

    def qe(path: str):
        return (
            spark.read.parquet(path)
            .filter(F.col("event_date") == F.lit(day))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
            .collect()[0]
        )

    flat_bytes, flat_row = measure_bytes(spark, lambda: qe(flat_dir))
    part_bytes, part_row = measure_bytes(spark, lambda: qe(part_dir))
    assert flat_row["n"] == part_row["n"]
    report["hive_partition_pruning"] = {
        "filter": f"event_date = {day}",
        "rows_matched": flat_row["n"],
        "flat_bytes_read": flat_bytes,
        "partitioned_bytes_read": part_bytes,
        "bytes_ratio": round(part_bytes / flat_bytes, 4) if flat_bytes else None,
    }

    Path(out_path).write_text(json.dumps(report, indent=2, default=str) + "\n")
    print(json.dumps(report, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
