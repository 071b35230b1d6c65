#!/usr/bin/env python
"""Tile server over any binary container — the `versatiles serve` analog.

    python jobs/serve_job.py --container tiles.pmtiles [--port 8080]

Routes (serve.rs surface):
    GET /tiles/{z}/{x}/{y}            tile bytes (Content-Encoding from the
                                      container codec, honoring the
                                      client's Accept-Encoding — tiles are
                                      recompressed only when the stored
                                      codec is not acceptable)
    GET /tiles/tiles.json             the container's TileJSON metadata
    GET /health                       liveness probe

Serving is pure point lookups (sources.lookup_tile: mbtiles indexed
SELECT, pmtiles directory bisect, versatiles block+tile index seeks —
O(1)/O(log n), no Spark session, no scan), so this process is a
few-megabyte sidecar: Spark builds containers, this serves them.
"""

from __future__ import annotations

import argparse
import http.server
import json
import re
import sys

_CODEC_HEADER = {"gzip": "gzip", "brotli": "br", "zstd": "zstd"}
_FORMAT_MIME = {
    "mvt": "application/vnd.mapbox-vector-tile",
    "png": "image/png",
    "jpg": "image/jpeg",
    "webp": "image/webp",
    "avif": "image/avif",
}


def make_handler(container: str, tilejson: dict | None):
    from versatiles_rs_spark.sources import lookup_tile

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/health":
                return self._send(200, b"ok", "text/plain")
            if self.path == "/tiles/tiles.json":
                body = json.dumps(tilejson or {}).encode()
                return self._send(200, body, "application/json")
            m = re.match(r"^/tiles/(\d+)/(\d+)/(\d+)$", self.path)
            if not m:
                return self.send_error(404)
            z, x, y = (int(g) for g in m.groups())
            accepted = [
                t.split(";")[0].strip()
                for t in self.headers.get("Accept-Encoding", "").split(",")
                if t.strip()
            ]
            hit = lookup_tile(container, z, x, y, accepted=accepted or None)
            if hit is None:
                return self.send_error(404)
            blob, codec = hit
            fmt = (tilejson or {}).get("format", "mvt")
            self.send_response(200)
            self.send_header("Content-Type", _FORMAT_MIME.get(fmt, "application/octet-stream"))
            if codec in _CODEC_HEADER:
                self.send_header("Content-Encoding", _CODEC_HEADER[codec])
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    return Handler


def serve(container: str, port: int = 0):
    """Start the server; returns the (running) HTTPServer instance."""
    tilejson = None
    try:
        if container.lower().endswith(".mbtiles"):
            from versatiles_rs_spark.sources.mbtiles import mbtiles_tilejson

            tilejson = mbtiles_tilejson(container)
    except Exception:
        pass
    srv = http.server.ThreadingHTTPServer(
        ("127.0.0.1", port), make_handler(container, tilejson)
    )
    return srv


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--container", required=True, help=".mbtiles/.pmtiles/.versatiles path")
    ap.add_argument("--port", type=int, default=8080)
    args = ap.parse_args()
    srv = serve(args.container, args.port)
    print(json.dumps({"serving": args.container, "port": srv.server_address[1]}))
    srv.serve_forever()
    return 0


if __name__ == "__main__":
    sys.exit(main())
