"""sf10 rehearsal (round-6 VERDICT task #2): run the five heaviest
self-join / iterative shapes on a corpus 100× sf0.1 and flag
super-linear scalers — the scale step where skew and spill behavior
actually change.

Corpus synthesis follows tools/scale_rehearsal.py's FK-preserving
replication, but explode-based (crossJoin with a copy index instead of a
100-way union): every table row becomes N_COPIES rows with all keys
shifted by copy·OFF, so join selectivities and per-key fan-outs match
sf0.1 exactly while totals grow 100×. documents.text is word-rotated per
copy so cross-copy shingle similarity stays at background level (no
artificial 100-cliques in the dedup operators). region/nation stay
fixed, as a real scale-up keeps its dimensions. embeddings are
component-rotated per copy (the graph build loads every table).

The lake build (bucketed adjacency/signature tables) is timed separately
at each scale, mirroring bench.py's ETL-vs-serving split.

Usage: python tools/scale_rehearsal_sf10.py [out_json]
Writes BENCH_r7_sf10.json by default; reuses /tmp/spark_graft_sf10 when
present.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from graphdb_td2_spark.io import read_table  # noqa: E402
from graphdb_td2_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402

N_COPIES = 100
OFF = 100_000_000
SF01_DIR = "/root/testdata/sf0.1"
SF10_DIR = "/tmp/spark_graft_sf10"
FLAG_RATIO = 130.0  # 100× data ⇒ >130× time = super-linear (with variance)

QUERIES = [
    "minhash_lsh_pairs",
    "top_cooccurrence_pairs",
    "ngram_jaccard_pairs",
    "events_asof_last_order",
    "pagerank_top20",
]

KEY_SHIFTS: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]


def _generate(spark) -> None:
    copies = F.explode(
        F.sequence(F.lit(0), F.lit(N_COPIES - 1))
    ).alias("__copy")
    for table in COPY_AS_IS:
        read_table(spark, SF01_DIR, table).write.mode("overwrite").parquet(
            f"{SF10_DIR}/{table}.parquet"
        )
        print(f"# {table}: copied as-is", file=sys.stderr)
    for table, keys in KEY_SHIFTS.items():
        df = read_table(spark, SF01_DIR, table).select("*", copies)
        for key in keys:
            df = df.withColumn(
                key, F.col(key) + F.col("__copy").cast("long") * F.lit(OFF)
            )
        if table == "events":
            # props is {"k": <p_partkey>} — shift the product FK in the JSON
            k = (
                F.get_json_object("props", "$.k").cast("long")
                + F.col("__copy").cast("long") * F.lit(OFF)
            )
            df = df.withColumn(
                "props",
                F.concat(F.lit('{"k": '), k.cast("string"), F.lit("}")),
            )
        if table == "embeddings":
            # component-rotate per copy: within-copy cosine geometry
            # identical, cross-copy cosine ~ background
            df = (
                df.withColumn("__r", F.col("__copy") % F.size("embedding"))
                .withColumn(
                    "embedding",
                    F.concat(
                        F.expr(
                            "slice(embedding, __r + 1, size(embedding) - __r)"
                        ),
                        F.expr("slice(embedding, 1, __r)"),
                    ),
                )
                .drop("__r")
            )
        if table == "documents":
            # word-rotate by a per-copy stride: within-copy shingle
            # structure identical, cross-copy Jaccard ~ background
            df = (
                df.withColumn("__w", F.split("text", " "))
                .withColumn(
                    "__r", (F.col("__copy") * 7) % F.size("__w")
                )
                .withColumn(
                    "text",
                    F.array_join(
                        F.concat(
                            F.expr("slice(__w, __r + 1, size(__w) - __r)"),
                            F.expr("slice(__w, 1, __r)"),
                        ),
                        " ",
                    ),
                )
                .drop("__w", "__r")
            )
        df.drop("__copy").repartition(32).write.mode("overwrite").parquet(
            f"{SF10_DIR}/{table}.parquet"
        )
        print(f"# {table}: x{N_COPIES}", file=sys.stderr)


def _run(spark, sf_dir: str) -> dict:
    from graphdb_td2_spark.lake import build_lake

    spark.range(1).count()
    t0 = time.time()
    build_lake(spark, sf_dir)
    lake = round(time.time() - t0, 3)
    out: dict[str, float] = {}
    fns = entry_mod.queries()
    for name in QUERIES:
        t0 = time.time()
        n = len(fns[name](spark, sf_dir).collect())
        out[name] = round(time.time() - t0, 3)
        print(f"# {sf_dir} {name}: {out[name]}s ({n} rows)", file=sys.stderr)
    return {"queries": out, "lake_build_sec": lake}


def main() -> int:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r7_sf10.json"
    spark = get_spark("scale-rehearsal-sf10")
    if not Path(SF10_DIR, "lineitem.parquet").exists():
        t0 = time.time()
        _generate(spark)
        print(f"# corpus generated in {time.time() - t0:.0f}s", file=sys.stderr)
    base = _run(spark, SF01_DIR)
    big = _run(spark, SF10_DIR)
    ratios = {
        q: (
            round(big["queries"][q] / base["queries"][q], 2)
            if base["queries"].get(q)
            else None
        )
        for q in QUERIES
    }
    flagged = [q for q, r in ratios.items() if r is not None and r > FLAG_RATIO]
    artifact = {
        "metric": "sf10_rehearsal",
        "n_copies": N_COPIES,
        "sf0.1": base,
        "sf10": big,
        "ratios_vs_100x": ratios,
        "flagged_super_linear": flagged,
    }
    Path(out_json).write_text(json.dumps(artifact, indent=1) + "\n")
    print(json.dumps(artifact))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
