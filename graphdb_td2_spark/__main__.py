"""Package CLI — the operational entry points a reference user needs:

    python -m graphdb_td2_spark etl   [--sf-dir D] [--out-dir O]
    python -m graphdb_td2_spark serve [--sf-dir D] [--port P]
    python -m graphdb_td2_spark query NAME [--sf-dir D] [-n ROWS]
    python -m graphdb_td2_spark list

``etl`` twins the reference's ``GET /etl`` batch, ``serve`` its FastAPI
app, ``query`` runs any registry entry and prints rows, ``list`` shows
the registry (the operator inventory).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="graphdb_td2_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)
    default_sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    p_etl = sub.add_parser("etl", help="run the batch graph build")
    p_etl.add_argument("--sf-dir", default=default_sf)
    p_etl.add_argument("--out-dir", default=None, help="persist the graph here")

    p_serve = sub.add_parser("serve", help="HTTP twin: /health /etl /recs")
    p_serve.add_argument("--sf-dir", default=default_sf)
    p_serve.add_argument("--port", type=int, default=8000)

    p_query = sub.add_parser("query", help="run one registry query")
    p_query.add_argument("name")
    p_query.add_argument("--sf-dir", default=default_sf)
    p_query.add_argument("-n", type=int, default=20, help="rows to show")

    p_explain = sub.add_parser(
        "explain", help="print a registry query's physical plan"
    )
    p_explain.add_argument("name")
    p_explain.add_argument("--sf-dir", default=default_sf)
    p_explain.add_argument(
        "--mode",
        default="formatted",
        choices=("simple", "extended", "formatted", "cost", "codegen"),
    )

    sub.add_parser("list", help="list registry queries")

    args = parser.parse_args(argv)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as registry

    if args.cmd == "list":
        for name in registry.queries():
            print(name)
        return 0

    from .session import get_spark

    spark = get_spark("graphdb-td2-cli")
    if args.cmd == "etl":
        from .graph.build import run_etl

        print(json.dumps(run_etl(spark, args.sf_dir, out_dir=args.out_dir)))
        return 0
    if args.cmd == "serve":
        from .serve import make_server

        server = make_server(spark, args.sf_dir, host="0.0.0.0", port=args.port)
        print(f"serving on :{server.server_address[1]} (sf_dir={args.sf_dir})")
        server.serve_forever()
        return 0
    if args.cmd == "query":
        queries = registry.queries()
        if args.name not in queries:
            print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
            return 2
        queries[args.name](spark, args.sf_dir).show(args.n, truncate=False)
        return 0
    if args.cmd == "explain":
        queries = registry.queries()
        if args.name not in queries:
            print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
            return 2
        queries[args.name](spark, args.sf_dir).explain(args.mode)
        return 0
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
