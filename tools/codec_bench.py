"""Parquet compression-codec comparison over the corpus fact tables —
the storage-layout decision a 100 TB lake makes once and amortizes
forever: bytes on disk vs scan+aggregate wall-clock for snappy / zstd /
gzip / lz4 / uncompressed. Writes CODEC_r6.json.

Usage: python tools/codec_bench.py [--json OUT.json] [sf_dir]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from graphdb_td2_spark.io import read_table  # noqa: E402
from graphdb_td2_spark.session import get_spark  # noqa: E402

CODECS = ("snappy", "zstd", "gzip", "lz4", "uncompressed")
TABLES = ("lineitem", "events")


def dir_bytes(path: Path) -> int:
    return sum(f.stat().st_size for f in path.rglob("*.parquet"))


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = "CODEC_r6.json"
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"

    spark = get_spark("codec-bench")
    spark.range(1).count()  # JVM warmup
    work = Path(tempfile.mkdtemp(prefix="codec_bench_"))
    results: dict[str, dict] = {}
    try:
        for table in TABLES:
            df = read_table(spark, sf_dir, table)
            base = None
            for codec in CODECS:
                out = work / f"{table}_{codec}"
                t0 = time.time()
                df.write.option("compression", codec).parquet(str(out))
                write_s = round(time.time() - t0, 3)
                size = dir_bytes(out)
                t0 = time.time()
                n = spark.read.parquet(str(out)).count()
                scan_s = round(time.time() - t0, 3)
                if base is None:
                    base = size
                results.setdefault(table, {})[codec] = {
                    "bytes": size,
                    "ratio_vs_first": round(size / base, 3),
                    "write_s": write_s,
                    "scan_s": scan_s,
                    "rows": n,
                }
                shutil.rmtree(out)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    artifact = {"sf_dir": sf_dir, "codecs": CODECS, "results": results}
    Path(json_out).write_text(json.dumps(artifact, indent=2) + "\n")
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
