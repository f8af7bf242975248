"""Composed cleaning-funnel rehearsal at sf10 (VERDICT r9 task #5):
every dedup component has per-operator scale evidence, but
``clean_corpus_stats`` — the funnel a training-data user actually runs
end-to-end (exact dedup → MinHash-LSH prune → quality filter →
decontamination) — had never been timed at 100×. Records per-stage
wall-clocks so a dominating stage is visible, then the composed query.

Stages (cumulative-cost order; each later stage REUSES the earlier
artifacts exactly as the composed query does):
  1. shingles   — cached_doc_shingles build (tokenize-once table)
  2. lsh_pairs  — minhash_lsh_pairs (the near-dup pair artifact)
  3. contam     — _contaminated_ids (eval-shingle broadcast join)
  4. composed   — clean_corpus_stats end-to-end (warm artifacts)
  5. composed_cold — clean_corpus_stats in a FRESH session (nothing warm;
     what a one-shot pipeline run pays)

Usage: SPARK_GRAFT_DRIVER_MEM=64g python tools/funnel_rehearsal_sf10.py
Writes FUNNEL_r10_sf10.json; reuses /tmp/spark_graft_sf10 when present
(regenerate via tools/scale_rehearsal_sf10.py).
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from tools.scale_rehearsal_sf10 import SF10_DIR  # noqa: E402

STAGE_CODE = """
import json, sys, time
sys.path.insert(0, {root!r})
from graphdb_td2_spark.session import get_spark
from graphdb_td2_spark.dedup.shingles import cached_doc_shingles
from graphdb_td2_spark.dedup.minhash import minhash_lsh_pairs
from graphdb_td2_spark.pipeline import _contaminated_ids, clean_corpus_stats

spark = get_spark("funnel-sf10")
spark.range(1).count()
sf = {sf_dir!r}
out = {{}}

t0 = time.time(); n = cached_doc_shingles(spark, sf).count()
out["shingles"] = [round(time.time() - t0, 1), n]

t0 = time.time(); n = minhash_lsh_pairs(spark, sf).count()
out["lsh_pairs"] = [round(time.time() - t0, 1), n]

t0 = time.time(); n = _contaminated_ids(spark, sf).count()
out["contam"] = [round(time.time() - t0, 1), n]

t0 = time.time(); rows = clean_corpus_stats(spark, sf).collect()
out["composed_warm"] = [round(time.time() - t0, 1), len(rows)]
print(json.dumps(out))
"""

COLD_CODE = """
import json, sys, time
sys.path.insert(0, {root!r})
from graphdb_td2_spark.session import get_spark
from graphdb_td2_spark.pipeline import clean_corpus_stats
spark = get_spark("funnel-sf10-cold")
spark.range(1).count()
t0 = time.time(); rows = clean_corpus_stats(spark, {sf_dir!r}).collect()
print(json.dumps({{"composed_cold": [round(time.time() - t0, 1), len(rows)]}}))
"""


def run(code: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=str(ROOT),
        capture_output=True,
        text=True,
        timeout=14400,
    )
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-3000:])
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "FUNNEL_r10_sf10.json"
    if not Path(SF10_DIR).exists():
        raise SystemExit(
            f"{SF10_DIR} missing — run tools/scale_rehearsal_sf10.py first"
        )
    t0 = time.time()
    stages = run(STAGE_CODE.format(root=str(ROOT), sf_dir=SF10_DIR))
    cold = run(COLD_CODE.format(root=str(ROOT), sf_dir=SF10_DIR))
    artifact = {
        "sf10_dir": SF10_DIR,
        "stages_sec_rows": {**stages, **cold},
        "wall_sec": round(time.time() - t0, 1),
        "note": (
            "stage entries are [wall_sec, row_count]; composed_warm reuses "
            "the session shingle/LSH artifacts like a production pipeline "
            "run; composed_cold is a fresh session paying everything"
        ),
    }
    Path(out_path).write_text(json.dumps(artifact, indent=1) + "\n")
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
