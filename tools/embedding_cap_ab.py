"""Measured before/after for the round-11 embedding block cap
(VERDICT r10 task #2, `dedup/embedding.py` EMB_BLOCK_CAP): at the
synthetic sf1 corpus (~60k vectors, 10 labels, largest block ~2.2k —
``tools/scale_rehearsal.py`` replica of sf0.1) the uncapped label-block
self-join scores O(Σ block²) ≈ 24M candidate pairs; the cap bounds
participants at 1000/label, so ≤ 10·C(1000,2) ≈ 5M at ANY scale.
Records, for cap and no-cap variants:

- n_candidates: rows entering the cosine filter (block self-join size),
- n_pairs: rows out (cosine ≥ 0.35),
- wall_sec: end-to-end collect wall,
- max_block / blocks_over_cap: the quadratic driver being bounded.

Also records the sf0.1 invariance check: capped vs uncapped result sets
byte-identical below the cap (the driver-hash requirement).

Usage: python tools/embedding_cap_ab.py [out_json]  (default
EMB_CAP_AB_r11.json). Requires /tmp/spark_graft_sf1.0 (regenerate via
tools/scale_rehearsal.py's generate()).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from graphdb_td2_spark.dedup.embedding import (  # noqa: E402
    EMB_BLOCK_CAP,
    capped_label_blocks,
    embedding_neardup_pairs,
)
from graphdb_td2_spark.functions.vectors import quantize_embedding  # noqa: E402
from graphdb_td2_spark.io import read_table  # noqa: E402
from graphdb_td2_spark.session import get_spark  # noqa: E402
from tools.scale_rehearsal import SF1_DIR, generate  # noqa: E402

NO_CAP = 10**9


def measure(spark, sf_dir: str, cap: int) -> dict:
    emb = read_table(spark, sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    q = capped_label_blocks(
        emb.select(
            "vec_id", "label", quantize_embedding(F.col("embedding")).alias("qe")
        ),
        cap=cap,
    )
    a, b = q.alias("a"), q.alias("b")
    n_candidates = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).count()
    t0 = time.monotonic()
    n_pairs = len(embedding_neardup_pairs(spark, sf_dir, block_cap=cap).collect())
    wall = time.monotonic() - t0
    return {
        "block_cap": cap if cap != NO_CAP else None,
        "n_candidates": n_candidates,
        "n_pairs": n_pairs,
        "wall_sec": round(wall, 2),
    }


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "EMB_CAP_AB_r11.json"
    if not Path(SF1_DIR, "embeddings.parquet").exists():
        print("# generating synthetic sf1 corpus...", file=sys.stderr)
        generate()
    spark = get_spark("embedding-cap-ab")

    blocks = (
        read_table(spark, SF1_DIR, "embeddings", ["vec_id", "label"])
        .groupBy("label")
        .count()
        .collect()
    )
    sizes = sorted((r["count"] for r in blocks), reverse=True)
    stats = {
        "n_vectors": sum(sizes),
        "n_labels": len(sizes),
        "max_block": sizes[0],
        "blocks_over_cap": sum(1 for s in sizes if s > EMB_BLOCK_CAP),
    }

    capped = measure(spark, SF1_DIR, EMB_BLOCK_CAP)
    uncapped = measure(spark, SF1_DIR, NO_CAP)

    # sf0.1 invariance: the shipped cap must be a no-op where the driver
    # hashes results
    inv_a = sorted(
        map(tuple, embedding_neardup_pairs(spark, "/root/testdata/sf0.1").collect())
    )
    inv_b = sorted(
        map(
            tuple,
            embedding_neardup_pairs(
                spark, "/root/testdata/sf0.1", block_cap=NO_CAP
            ).collect(),
        )
    )
    out = {
        "experiment": "embedding_neardup_pairs block cap A/B at synthetic sf1",
        "cap": EMB_BLOCK_CAP,
        "sf1_corpus": stats,
        "capped": capped,
        "uncapped": uncapped,
        "candidate_reduction": (
            round(uncapped["n_candidates"] / max(capped["n_candidates"], 1), 2)
        ),
        "sf01_invariance_ok": inv_a == inv_b,
        "sf01_n_pairs": len(inv_a),
    }
    Path(out_path).write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
