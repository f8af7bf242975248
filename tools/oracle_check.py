"""Local replica of the driver's t2 correctness harness: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB over
the same parquet tables, then compare row count, column names, and an
order-insensitive value comparison (exact, including float bits — the
driver hashes values, so "close" is not good enough).

Usage: python tools/oracle_check.py [--json OUT.json] [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from graphdb_td2_spark.schemas import TABLE_NAMES  # noqa: E402
from graphdb_td2_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402


def canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon_value(r[i]) for i in order) for r in rows)


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    results: dict[str, dict] = {}

    con = duckdb.connect()
    for t in TABLE_NAMES:
        # single-file corpus (the driver testdata) or directory-shaped
        # table (lake layout, e.g. the synthetic sf1.0 corpus)
        src = f"{sf_dir}/{t}.parquet"
        if Path(src).is_dir():
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    spark = get_spark("oracle-check")
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    n_pass = n_fail = n_rows_only = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            results[name] = {"status": "fail", "err": f"spark: {exc}"[:500]}
            n_fail += 1
            continue
        spark_s = time.time() - t0

        sql = oracles.get(name)
        if sql is None:
            print(f"ROWS-ONLY {name}: {len(s_rows)} rows ({spark_s:.1f}s spark)")
            results[name] = {
                "status": "rows_only",
                "spark_rows": len(s_rows),
                "spark_sec": round(spark_s, 2),
            }
            n_rows_only += 1
            continue
        try:
            res = con.execute(sql)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            results[name] = {"status": "fail", "err": f"duckdb: {exc}"[:500]}
            n_fail += 1
            continue

        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            cs = canon_rows(s_cols, s_rows)
            cd = canon_rows(d_cols, d_rows)
            if cs != cd:
                diffs = [
                    (a, b) for a, b in zip(cs, cd) if a != b
                ][:3]
                problems.append(f"values differ, first diffs: {diffs}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            results[name] = {
                "status": "fail",
                "err": "; ".join(problems)[:500],
                "spark_rows": len(s_rows),
                "oracle_rows": len(d_rows),
            }
            n_fail += 1
        else:
            print(f"PASS {name}: {len(s_rows)} rows ({spark_s:.1f}s spark)")
            results[name] = {
                "status": "pass",
                "spark_rows": len(s_rows),
                "oracle_rows": len(d_rows),
                "spark_sec": round(spark_s, 2),
            }
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if json_out:
        import json

        summary = {
            "sf_dir": sf_dir,
            "n_pass": n_pass,
            "n_fail": n_fail,
            "n_rows_only": n_rows_only,
            "results": results,
        }
        with open(json_out, "w") as fh:
            json.dump(summary, fh, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
