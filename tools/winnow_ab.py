"""Measured A/B for the round-10 winnowing restructure (VERDICT r9 task
#3): the r9 shape folded shingle-hashing and window-min selection into
ONE expression, so Catalyst re-evaluated the inlined hash-array subtree
per window lambda invocation — every shingle md5'd once per overlapping
window. The r10 shape materializes the hash array as its own projection
(CollapseProject keeps it: non-cheap alias, multiple references), so
each shingle is hashed exactly once. Oracle hash is unchanged (the
selected fingerprints are identical values).

Usage: python tools/winnow_ab.py [out_json] — times both variants at
sf0.1, median of 3, plus the full registry query end-to-end.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from graphdb_td2_spark.dedup.winnowing import (  # noqa: E402
    WINNOW_K,
    WINNOW_W,
    winnowed_duplicate_spans,
    winnowed_fp_rows,
)
from graphdb_td2_spark.functions.text import tokens_col  # noqa: E402
from graphdb_td2_spark.io import read_table  # noqa: E402
from graphdb_td2_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def _legacy_winnowed_fps(text, k=WINNOW_K, w=WINNOW_W):
    """The r9 single-expression shape, verbatim (for the A side)."""
    toks = tokens_col(text)
    n = F.size(toks)
    shingles = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    hashes = F.transform(
        shingles,
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"),
    )
    nh = F.size(hashes)
    selected = F.when(
        nh >= w,
        F.transform(
            F.sequence(F.lit(1), nh - (w - 1)),
            lambda i: F.array_min(F.slice(hashes, i, w)),
        ),
    ).otherwise(F.array(F.array_min(hashes)))
    return F.array_distinct(selected)


def _median_wall(fn, n=3):
    walls = []
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        walls.append(time.monotonic() - t0)
    return round(statistics.median(walls), 2), [round(x, 2) for x in walls]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "WINNOW_AB_r10.json"
    spark = get_spark("winnow-ab")
    docs = read_table(spark, SF_DIR, "documents", ["source", "text"])

    def legacy_fp_count():
        return (
            docs.select(
                "source",
                F.explode(_legacy_winnowed_fps(F.col("text"))).alias("fp"),
            )
            .distinct()
            .count()
        )

    def new_fp_count():
        return winnowed_fp_rows(docs, "source").count()

    n_legacy = legacy_fp_count()
    n_new = new_fp_count()
    assert n_legacy == n_new, (n_legacy, n_new)  # identical fp sets

    legacy_med, legacy_all = _median_wall(legacy_fp_count)
    new_med, new_all = _median_wall(new_fp_count)
    query_med, query_all = _median_wall(
        lambda: winnowed_duplicate_spans(spark, SF_DIR).collect()
    )
    artifact = {
        "sf_dir": SF_DIR,
        "distinct_source_fps": n_new,
        "legacy_fp_stage_sec": {"median": legacy_med, "samples": legacy_all},
        "r10_fp_stage_sec": {"median": new_med, "samples": new_all},
        "speedup": round(legacy_med / new_med, 2),
        "full_query_sec_r10": {"median": query_med, "samples": query_all},
    }
    Path(out_path).write_text(json.dumps(artifact, indent=1) + "\n")
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
