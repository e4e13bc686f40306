#!/usr/bin/env python
"""Thin HTTP service wrapper around the engine's incremental refresh —
reference parity with ``riot_graphs/server.py:19-29`` (Flask app exposing
``/`` → hello string and ``/update`` → ``{"status": "ok", "updates": N}``).

Deliberately OUTSIDE the engine package: the engine stays a library; this is
the ops-facing shell. Uses only stdlib ``http.server`` (no Flask in the
container). ``/update`` runs one availableNow streaming pass and reports the
number of NEW rows ingested by that call (reference ``rg.py:156`` returns
the delta, not the sink total); a no-op refresh reports 0.

Run: ``python server.py --landing DIR --sink DIR --checkpoint DIR
[--host H] [--port P]``. Updates are serialized with a lock — concurrent
``/update`` calls queue rather than racing the streaming checkpoint.
"""

from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

HELLO = "RIOT CI graphing application"


def make_handler(refresh):
    """Build a request handler bound to a zero-arg ``refresh() -> int``
    callable (returns rows ingested, raises on failure)."""
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, body: str, ctype: str = "application/json"):
            data = body.encode()
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):  # noqa: N802 (http.server API)
            if self.path == "/":
                self._send(200, HELLO, ctype="text/plain")
            elif self.path == "/update":
                try:
                    with lock:
                        n = refresh()
                    self._send(200, json.dumps({"status": "ok", "updates": n}))
                except Exception:  # reference returns {'status': 'error'}
                    self._send(500, json.dumps({"status": "error"}))
            else:
                self._send(404, json.dumps({"status": "not found"}))

        def log_message(self, *args):  # quiet by default
            pass

    return Handler


def serve(refresh, host: str = "127.0.0.1", port: int = 8080) -> ThreadingHTTPServer:
    """Start the server (non-blocking); caller owns shutdown()."""
    httpd = ThreadingHTTPServer((host, port), make_handler(refresh))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", help="INI config (reference GraphConf layout)")
    ap.add_argument("--landing")
    ap.add_argument("--sink")
    ap.add_argument("--checkpoint")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    args = ap.parse_args()

    from riot_graphs_spark.session import get_spark
    from riot_graphs_spark.streaming.ingest import incremental_refresh

    landing, sink, ckpt = args.landing, args.sink, args.checkpoint
    shuffle = None
    if args.config:
        from riot_graphs_spark.config import load_config

        conf = load_config(args.config)
        landing = landing or conf.landing_dir
        sink = sink or conf.sink_path
        ckpt = ckpt or conf.checkpoint_dir
        shuffle = conf.shuffle_partitions
    if not (landing and sink and ckpt):
        ap.error("--landing/--sink/--checkpoint (or --config) are required")

    spark = get_spark(
        app_name="riot-graphs-server",
        **({"shuffle_partitions": shuffle} if shuffle else {}),
    )

    def refresh() -> int:
        return incremental_refresh(spark, landing, sink, ckpt)

    httpd = ThreadingHTTPServer((args.host, args.port), make_handler(refresh))
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        httpd.shutdown()


if __name__ == "__main__":
    main()
