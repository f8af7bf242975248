"""HTTP service twin of the reference's FastAPI app (``app/main.py:11-19``):
``GET /health`` → ``{"ok": true}``, ``GET /etl`` → synchronous graph build →
``{"ok": true, ...}``, ``GET /recs?product_id=|customer_id=`` →
``{"items": [...], "took_ms": N}`` — same routes, same JSON shapes, same
query-parameter semantics (string ids, both optional, empty-items-never-500).

Stdlib ``http.server`` only: the container has no FastAPI/uvicorn, and the
surface is three GET routes — a web framework would be padding. The handler
holds a single SparkSession; Spark queries already parallelize internally,
and the reference app is likewise a single synchronous worker (its checks
container relies on ``/etl`` blocking until completion).

On a real deployment this runs on the driver node; executors do the work.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import SparkSession

from .graph.build import run_etl
from .recs.queries import recommend


def _int_or_none(qs: dict, key: str) -> int | None:
    """The reference accepts string ids (``Optional[str]``); the corpus keys
    are ints — non-numeric input degrades to 'no signal', never a 500
    (``app/main.py:125-127`` graceful-degradation contract)."""
    vals = qs.get(key)
    if not vals:
        return None
    try:
        return int(vals[0])
    except ValueError:
        return None


class _Handler(BaseHTTPRequestHandler):
    spark: SparkSession  # set by make_server
    sf_dir: str

    def _json(self, payload: dict, status: int = 200) -> None:
        body = json.dumps(payload).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self) -> None:  # noqa: N802 (http.server API)
        url = urlparse(self.path)
        if url.path == "/health":
            self._json({"ok": True})
        elif url.path == "/etl":
            # synchronous, like the reference: the checks sequence curls
            # /etl with a 1800 s budget and asserts .ok == true
            try:
                result = run_etl(self.spark, self.sf_dir)
                self._json({**result, "ok": bool(result.get("ok"))})
            except Exception as exc:  # surface the failure, don't hang
                self._json({"ok": False, "error": str(exc)}, status=500)
        elif url.path == "/recs":
            qs = parse_qs(url.query)
            # same degrade-gracefully guard as /etl: an internal failure
            # (bad sf_dir, Spark error) must yield a valid 500 JSON body,
            # never a dropped connection
            try:
                self._json(
                    recommend(
                        self.spark,
                        self.sf_dir,
                        product_id=_int_or_none(qs, "product_id"),
                        customer_id=_int_or_none(qs, "customer_id"),
                    )
                )
            except Exception as exc:
                self._json({"ok": False, "error": str(exc)}, status=500)
        else:
            self._json({"error": "not found"}, status=404)

    def log_message(self, *args) -> None:  # quiet: Spark owns stderr
        pass


def make_server(
    spark: SparkSession, sf_dir: str, host: str = "127.0.0.1", port: int = 0
) -> ThreadingHTTPServer:
    """Build (not start) the server; ``port=0`` binds an ephemeral port
    (``server.server_address[1]`` tells which — used by the e2e test)."""
    handler = type("Handler", (_Handler,), {"spark": spark, "sf_dir": sf_dir})
    return ThreadingHTTPServer((host, port), handler)


def serve_forever_in_thread(server: ThreadingHTTPServer) -> threading.Thread:
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return t


def main() -> None:
    import os

    from .session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    port = int(os.environ.get("SPARK_GRAFT_PORT", "8000"))
    spark = get_spark("graphdb-td2-serve")
    server = make_server(spark, sf_dir, host="0.0.0.0", port=port)
    print(f"serving on :{server.server_address[1]} (sf_dir={sf_dir})")
    server.serve_forever()


if __name__ == "__main__":
    main()
