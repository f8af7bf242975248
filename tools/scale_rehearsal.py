"""sf1.0 scale rehearsal (round-4 VERDICT task #5 / round-5 task #8): run
the 26 headline queries on a corpus 10× sf0.1 and flag super-linear scalers.

No sf1.0 corpus ships with the driver, so this synthesizes one FROM sf0.1
(never touching /root/testdata): each table is the union of ``N_COPIES``
key-shifted replicas, preserving every FK relationship (order→customer,
lineitem→order/part/supplier, events.props.k→part) so join selectivities
and per-key fan-outs match the original — the quantity that determines
shuffle behavior. Content columns are decorrelated across copies so
similarity operators don't see an artificial 10-clique of exact duplicates
per document/vector:

- ``documents.text`` is word-rotated by a per-copy stride (within-copy
  shingle structure identical, cross-copy Jaccard ≈ background),
- ``embeddings.embedding`` is component-rotated per copy (within-copy
  cosine geometry identical, cross-copy cosine ≈ background),
- dimension tables (region/nation, the brand domain) stay fixed, as a real
  scale-up would keep them.

Then ``bench.py`` runs at sf0.1 and at the synthetic sf1.0 on the same box
back-to-back, and the artifact records per-query ratios. With 10× data on
a fixed local[32] pool, a healthy query scales ≤ ~10× (sub-linear for
scan-dominated ones); ratios beyond ``FLAG_RATIO`` are flagged.

Usage: python tools/scale_rehearsal.py [out_json]
Writes BENCH_r6_sf1.json at the repo root by default; reuses the generated
corpus at /tmp/spark_graft_sf1.0 when present.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

N_COPIES = 10
OFF = 100_000_000  # key shift per copy — far above any sf0.1 key
FLAG_RATIO = 13.0  # >10× data ⇒ >13× time = super-linear (with variance)
SF1_DIR = "/tmp/spark_graft_sf1.0"

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


def _replica(df, table: str, i: int):
    out = df
    for key in KEY_SHIFTS[table]:
        out = out.withColumn(key, F.col(key) + F.lit(i * OFF))
    if table == "events":
        # props is {"k": <p_partkey>} — shift the product FK inside the JSON
        k = F.get_json_object("props", "$.k").cast("long") + F.lit(i * OFF)
        out = out.withColumn(
            "props", F.concat(F.lit('{"k": '), k.cast("string"), F.lit("}"))
        )
    if table == "documents" and i > 0:
        r = i * 7
        out = out.withColumn(
            "text",
            F.expr(
                "array_join(concat("
                f"  slice(split(text, ' '), ({r} % size(split(text, ' '))) + 1,"
                f"        size(split(text, ' ')) - ({r} % size(split(text, ' ')))),"
                f"  slice(split(text, ' '), 1, {r} % size(split(text, ' ')))"
                "), ' ')"
            ),
        )
    if table == "embeddings" and i > 0:
        out = out.withColumn(
            "embedding",
            F.expr(
                "concat("
                f"  slice(embedding, ({i} % size(embedding)) + 1,"
                f"        size(embedding) - ({i} % size(embedding))),"
                f"  slice(embedding, 1, {i} % size(embedding))"
                ")"
            ),
        )
    return out


def generate(base_dir: str = "/root/testdata/sf0.1", out_dir: str = SF1_DIR) -> None:
    from graphdb_td2_spark.io import read_table
    from graphdb_td2_spark.session import get_spark

    spark = get_spark("scale-rehearsal-gen")
    for table in COPY_AS_IS:
        read_table(spark, base_dir, table).write.mode("overwrite").parquet(
            f"{out_dir}/{table}.parquet"
        )
    for table in KEY_SHIFTS:
        base = read_table(spark, base_dir, table)
        scaled = _replica(base, table, 0)
        for i in range(1, N_COPIES):
            scaled = scaled.unionByName(_replica(base, table, i))
        scaled.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
        print(f"# generated {table}", file=sys.stderr)
    spark.stop()


def run_bench(sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        env=env,
        cwd=str(Path(__file__).resolve().parent.parent),
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = proc.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r6_sf1.json"
    if not Path(SF1_DIR).exists():
        generate()
    b01 = run_bench("/root/testdata/sf0.1")
    b1 = run_bench(SF1_DIR)
    ratios = {
        q: round(b1["queries"][q] / b01["queries"][q], 2)
        for q in b01["queries"]
        if q in b1.get("queries", {})
    }
    flagged = sorted(
        (q for q, r in ratios.items() if r > FLAG_RATIO),
        key=lambda q: -ratios[q],
    )
    artifact = {
        "n_copies": N_COPIES,
        "sf1_dir": SF1_DIR,
        "sf0.1": b01,
        "sf1.0": b1,
        "time_ratio_sf1_over_sf01": ratios,
        "flag_threshold": FLAG_RATIO,
        "superlinear_flagged": flagged,
        "notes": (
            "Synthetic sf1.0 = 10 key-shifted FK-preserving replicas of "
            "sf0.1 (content columns decorrelated across copies). Fixed "
            "local[32] pool; healthy ratio <= ~10x."
        ),
    }
    Path(out_path).write_text(json.dumps(artifact, indent=2) + "\n")
    print(json.dumps({k: artifact[k] for k in ("superlinear_flagged",)}))
    print(f"# wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
