"""Skewed-fixture micro-bench (round-4 VERDICT task #4 / round-5 task #7):
measure the WALL-CLOCK effect of AQE skew-join splitting on the exact join
shape of ``recs/queries.py:top_cooccurrence_pairs`` — the equi self-join on
the order key with an inequality residual, under a hyper-popular order.

``tests/test_skew.py`` proves the split ENGAGES (plan assertion) and
preserves results; this tool quantifies what it buys. The fixture puts a
double-digit share of all items in ONE order — the degree distribution a
100 TB unseeded co-occurrence run must survive — and times the pair count:

- ``naive``: AQE skew-join splitting disabled → the hot order's entire
  pair block (C(hot, 2) join outputs) lands in one task; the stage runs at
  the speed of that straggler.
- ``aqe_split``: splitting enabled → the hot partition is divided into
  advisory-sized chunks joined independently; the same work spreads over
  the executor pool.

Both variants must produce the identical pair total (asserted) — the split
is a pure physical rewrite.

Usage: python tools/skew_bench.py [out_json]
Writes a JSON artifact (default SKEW_r6.json at the repo root).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

# Mirror tests/test_skew.py thresholds, scaled to a fixture big enough to
# time: detector trips when a partition is > 2× median AND > 16 KiB.
CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16384",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "65536",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join
    "spark.sql.shuffle.partitions": "32",
}

# One order with 60k items → C(n,2) ≈ 1.8e9 pair outputs in a single task
# when the split is off. Cold rows are sized so the hot shuffle partition is
# ~5× the median (the detector needs > factor × median AND > threshold).
N_HOT = 60_000
N_COLD = 500_000


def _fixture(spark):
    hot = spark.range(N_HOT).select(
        F.lit(0).alias("order_id"), F.col("id").alias("product_id")
    )
    cold = spark.range(N_COLD).select(
        (F.col("id") % (N_COLD // 3) + 1).alias("order_id"),
        (F.col("id") + 1_000_000).alias("product_id"),
    )
    # materialize once so both timed runs join the same shuffled input
    return hot.unionByName(cold).persist()


def _pair_total(items):
    a, b = items.alias("a"), items.alias("b")
    agg = a.join(
        b,
        (F.col("a.order_id") == F.col("b.order_id"))
        & (F.col("a.product_id") < F.col("b.product_id")),
    ).agg(F.count(F.lit(1)).alias("n_pairs"))
    t0 = time.monotonic()
    n = agg.collect()[0]["n_pairs"]
    wall = time.monotonic() - t0
    plan = agg._jdf.queryExecution().executedPlan().toString()
    engaged = "skew=true" in plan or "isSkewJoin=true" in plan
    return n, wall, engaged


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SKEW_r6.json"
    builder = SparkSession.builder.master("local[32]").appName("skew-bench")
    for k, v in CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()  # JVM warmup outside the timings

    items = _fixture(spark)
    items.count()  # materialize the persist

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    n_naive, t_naive, engaged_naive = _pair_total(items)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    n_split, t_split, engaged_split = _pair_total(items)

    assert n_naive == n_split, (n_naive, n_split)
    assert engaged_split and not engaged_naive

    hot_pairs = N_HOT * (N_HOT - 1) // 2
    artifact = {
        "fixture": {
            "n_hot_items_one_order": N_HOT,
            "n_cold_rows": N_COLD,
            "hot_share_of_pair_outputs": round(hot_pairs / n_naive, 4),
            "n_pairs_total": n_naive,
        },
        "naive_skew_join_off": {"wall_sec": round(t_naive, 3), "skew_split_in_plan": engaged_naive},
        "aqe_skew_split_on": {"wall_sec": round(t_split, 3), "skew_split_in_plan": engaged_split},
        "speedup": round(t_naive / t_split, 2),
        "notes": (
            "Join shape of top_cooccurrence_pairs (equi self-join on order "
            "key + inequality residual), one hyper-popular order. Identical "
            "pair totals asserted; only the physical plan differs."
        ),
    }
    Path(out_path).write_text(json.dumps(artifact, indent=2) + "\n")
    print(json.dumps(artifact, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
