"""events_asof at scale — A/B the union+window floor against the
per-user order-array alternative (round-7 VERDICT task #7).

Variant A (production, operators/asof.py): union events+orders, ONE
shuffle on user_id, ONE sort per key group, carry the latest order
forward. The committed floor argument says the shuffle+sort is Spark's
minimum for this shape.

Variant B (the untested alternative): collapse orders to ONE row per
user holding the date-sorted (ts, orderkey) array — compact, since
orders/user is small — join events to it by user, and resolve each
event's as-of match with higher-order array functions (filter +
element_at(-1): a vectorized scan of a ≤tens-element array). This
removes the big union's SORT entirely; the price is materializing the
array table and a hash join carrying the arrays.

Both variants are forced through an identical all-column checksum action
(xxhash64 sum) so Catalyst cannot prune the as-of resolution away, and
both are asserted EQUAL on the checksum before timing counts.

Usage: python tools/asof_ab_experiment.py [out_json]
Writes ASOF_AB_r8.json by default; needs /tmp/spark_graft_sf1.0 and
/tmp/spark_graft_sf10 (tools/scale_rehearsal*.py).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from graphdb_td2_spark.io import read_table  # noqa: E402
from graphdb_td2_spark.operators.asof import asof_join  # noqa: E402
from graphdb_td2_spark.session import get_spark  # noqa: E402

SF_DIRS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": "/tmp/spark_graft_sf1.0",
    "sf10": "/tmp/spark_graft_sf10",
}


def _inputs(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    events = read_table(spark, sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = (
        read_table(
            spark, sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderkey"]
        )
        .groupBy(F.col("o_custkey").alias("user_id"), F.col("o_orderdate"))
        .agg(F.max("o_orderkey").alias("last_order_key"))
    )
    return events, orders


def variant_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    events, orders = _inputs(spark, sf_dir)
    return asof_join(
        events,
        orders,
        on=["user_id"],
        left_ts="ts",
        right_ts="o_orderdate",
        right_payload=["last_order_key"],
    ).select("event_id", "user_id", "ts", "last_order_key")


def variant_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    events, orders = _inputs(spark, sf_dir)
    # one row per user: date-sorted (order_us, orderkey) structs — struct
    # sort is lexicographic, so leading with the timestamp gives the
    # at-or-before scan a total order (dates are unique per user after
    # the pre-aggregation, matching variant A's tie rule)
    arr = orders.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.unix_micros(
                        F.col("o_orderdate").cast("timestamp")
                    ).alias("us"),
                    F.col("last_order_key").alias("k"),
                )
            )
        ).alias("__orders")
    )
    ev_us = F.unix_micros("ts")
    matched = F.element_at(
        F.filter("__orders", lambda o: o["us"] <= ev_us), -1
    )
    return (
        events.join(arr, "user_id", "left")
        .select(
            "event_id",
            "user_id",
            "ts",
            matched["k"].alias("last_order_key"),
        )
    )


def _checksum(df: DataFrame) -> int:
    # bit_xor: order-insensitive, overflow-free fold of the row hashes
    row = df.select(
        F.bit_xor(
            F.xxhash64("event_id", "user_id", "ts", "last_order_key")
        ).alias("h")
    ).collect()[0]
    return row["h"]


def main() -> int:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "ASOF_AB_r8.json"
    spark = get_spark("asof-ab")
    spark.range(1).count()
    artifact: dict = {"metric": "events_asof_union_window_vs_order_array"}
    for label, sf_dir in SF_DIRS.items():
        if not Path(sf_dir, "events.parquet").exists():
            print(f"# {label}: missing {sf_dir}, skipping", file=sys.stderr)
            continue
        t0 = time.time()
        ha = _checksum(variant_a(spark, sf_dir))
        ta = round(time.time() - t0, 3)
        t0 = time.time()
        hb = _checksum(variant_b(spark, sf_dir))
        tb = round(time.time() - t0, 3)
        artifact[label] = {
            "union_window_sec": ta,
            "order_array_sec": tb,
            "speedup_b_over_a": round(ta / tb, 2) if tb else None,
            "checksums_equal": ha == hb,
        }
        print(f"# {label}: A={ta}s B={tb}s equal={ha == hb}", file=sys.stderr)
    Path(out_json).write_text(json.dumps(artifact, indent=1) + "\n")
    print(json.dumps(artifact))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
