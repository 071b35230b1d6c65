#!/usr/bin/env python
"""Tile + static server over binary containers — the `versatiles serve`
analog (versatiles/src/server: routes.rs, handlers.rs, sources/).

    python jobs/serve_job.py --container tiles.pmtiles [--port 8080]
    python jobs/serve_job.py --source osm=a.versatiles --source hills=b.mbtiles \
        --static site_dir --static assets.tar.br

Routes (reference routes.rs surface):
    GET /tiles/index.json             sorted list of mounted source ids
    GET /tiles/{id}/{z}/{x}/{y}       tile bytes from the named source
    GET /tiles/{id}/tiles.json        per-source TileJSON metadata
    GET /tiles/{z}/{x}/{y}            legacy single-container route
    GET /tiles/tiles.json             (kept when --container is used)
    GET /health                       liveness probe
    GET /<anything else>              static fallback: --static sources
                                      checked in order, first hit wins
                                      (handlers.rs serve_static); "/" and
                                      directory paths resolve index.html

Tile bytes carry Content-Encoding from the container codec, honoring the
client's Accept-Encoding — recompressed only when the stored codec is not
acceptable. Serving is pure point lookups (sources.lookup_tile: mbtiles
indexed SELECT, pmtiles directory bisect, versatiles block+tile index
seeks — O(1)/O(log n), no Spark session, no scan), so this process is a
few-megabyte sidecar: Spark builds containers, this serves them.

Static sources are directories or tar archives (.tar/.tar.gz/.tar.br —
the .br path uses the engine's own RFC 7932 decoder, matching the
reference's static.tar.br fixture); tar entries load once at startup.
"""

from __future__ import annotations

import argparse
import http.server
import io
import json
import os
import re
import sys

_CODEC_HEADER = {"gzip": "gzip", "brotli": "br", "zstd": "zstd"}
_FORMAT_MIME = {
    "mvt": "application/vnd.mapbox-vector-tile",
    "pbf": "application/vnd.mapbox-vector-tile",
    "png": "image/png",
    "jpg": "image/jpeg",
    "webp": "image/webp",
    "avif": "image/avif",
}
_STATIC_MIME = {
    ".html": "text/html", ".htm": "text/html", ".css": "text/css",
    ".js": "application/javascript", ".json": "application/json",
    ".png": "image/png", ".jpg": "image/jpeg", ".jpeg": "image/jpeg",
    ".svg": "image/svg+xml", ".ico": "image/x-icon", ".txt": "text/plain",
    ".wasm": "application/wasm", ".woff2": "font/woff2",
}


class StaticSource:
    """One static content source: a directory or a tar archive.

    Reference parity: handlers.rs `serve_static` walks sources in order,
    first one returning data wins; directory requests resolve index.html.
    """

    def __init__(self, path: str):
        self.path = path
        self._tar: dict[str, bytes] | None = None
        if not os.path.isdir(path):
            self._tar = self._load_tar(path)

    @staticmethod
    def _load_tar(path: str) -> dict[str, bytes]:
        import tarfile

        with open(path, "rb") as f:
            raw = f.read()
        low = path.lower()
        if low.endswith((".tar.gz", ".tgz")):
            import gzip

            raw = gzip.decompress(raw)
        elif low.endswith(".tar.br"):
            from versatiles_rs_spark.functions.compression import decompress

            raw = decompress(raw, "brotli")
        out: dict[str, bytes] = {}
        with tarfile.open(fileobj=io.BytesIO(raw)) as tf:
            for m in tf.getmembers():
                if m.isfile():
                    out["/" + m.name.lstrip("./")] = tf.extractfile(m).read()
        return out

    def get(self, url_path: str) -> bytes | None:
        candidates = [url_path]
        if url_path.endswith("/"):
            candidates = [url_path + "index.html"]
        if self._tar is not None:
            for c in candidates:
                if c in self._tar:
                    return self._tar[c]
                # directory entry without trailing slash
                if not c.endswith("/") and c + "/index.html" in self._tar:
                    return self._tar[c + "/index.html"]
            return None
        root = os.path.realpath(self.path)
        for c in candidates:
            full = os.path.realpath(os.path.join(root, c.lstrip("/")))
            # refuse path traversal out of the root
            if full != root and not full.startswith(root + os.sep):
                continue
            if os.path.isdir(full):
                full = os.path.join(full, "index.html")
            if os.path.isfile(full):
                with open(full, "rb") as f:
                    return f.read()
        return None


def make_handler(
    sources: dict[str, str],
    tilejsons: dict[str, dict],
    statics: list[StaticSource],
    legacy: str | None,
):
    from versatiles_rs_spark.sources import lookup_tile

    tile_rx = re.compile(r"^/tiles/(?:([A-Za-z0-9_-]+)/)?(\d+)/(\d+)/(\d+)$")

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            path = self.path.split("?", 1)[0]
            if path == "/health":
                return self._send(200, b"ok", "text/plain")
            if path == "/tiles/index.json":
                body = json.dumps(sorted(sources)).encode()
                return self._send(200, body, "application/json")
            m = re.match(r"^/tiles/(?:([A-Za-z0-9_-]+)/)?tiles\.json$", path)
            if m:
                sid = m.group(1)
                if sid is None and legacy is not None:
                    sid = legacy
                if sid in tilejsons:
                    return self._send(
                        200, json.dumps(tilejsons[sid]).encode(), "application/json"
                    )
                return self.send_error(404)
            m = tile_rx.match(path)
            if m:
                sid = m.group(1)
                if sid is None and legacy is not None:
                    sid = legacy
                container = sources.get(sid)
                if container is None:
                    return self.send_error(404)
                z, x, y = (int(g) for g in m.groups()[1:])
                accepted = [
                    t.split(";")[0].strip()
                    for t in self.headers.get("Accept-Encoding", "").split(",")
                    if t.strip()
                ]
                hit = lookup_tile(container, z, x, y, accepted=accepted or None)
                if hit is None:
                    return self.send_error(404)
                blob, codec = hit
                fmt = (tilejsons.get(sid) or {}).get("format", "mvt")
                self.send_response(200)
                self.send_header(
                    "Content-Type", _FORMAT_MIME.get(fmt, "application/octet-stream")
                )
                if codec in _CODEC_HEADER:
                    self.send_header("Content-Encoding", _CODEC_HEADER[codec])
                self.send_header("Content-Length", str(len(blob)))
                self.end_headers()
                self.wfile.write(blob)
                return
            # static fallback, first source wins (handlers.rs serve_static)
            for src in statics:
                body = src.get(path)
                if body is not None:
                    ext = os.path.splitext(path.rstrip("/"))[1].lower()
                    ctype = _STATIC_MIME.get(ext, "text/html" if path.endswith("/") or not ext
                                             else "application/octet-stream")
                    return self._send(200, body, ctype)
            return self.send_error(404)

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    return Handler


def _source_tilejson(path: str) -> dict:
    from versatiles_rs_spark.sources import container_tilejson

    try:
        return container_tilejson(path)
    except Exception:
        return {}


def serve(
    container: str | None = None,
    port: int = 0,
    sources: dict[str, str] | None = None,
    statics: list[str] | None = None,
):
    """Start the server; returns the (running) HTTPServer instance.

    ``container`` mounts one legacy unnamed source (old routes keep
    working); ``sources`` maps id -> container path for the
    /tiles/{id}/... routes; both can be combined.
    """
    mounts: dict[str, str] = dict(sources or {})
    legacy = None
    if container is not None:
        legacy = os.path.splitext(os.path.basename(container))[0]
        # avoid clobbering an explicit source of the same name
        while legacy in mounts and mounts[legacy] != container:
            legacy += "_"
        mounts[legacy] = container
    tilejsons = {sid: _source_tilejson(p) for sid, p in mounts.items()}
    static_sources = [StaticSource(p) for p in (statics or [])]
    srv = http.server.ThreadingHTTPServer(
        ("127.0.0.1", port),
        make_handler(mounts, tilejsons, static_sources, legacy),
    )
    return srv


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--container", help=".mbtiles/.pmtiles/.versatiles path (legacy single mount)")
    ap.add_argument(
        "--source", action="append", default=[],
        metavar="ID=PATH", help="named tile source (repeatable)",
    )
    ap.add_argument(
        "--static", action="append", default=[], dest="statics",
        metavar="PATH", help="static content dir or tar (repeatable, first wins)",
    )
    ap.add_argument("--port", type=int, default=8080)
    args = ap.parse_args()
    sources = {}
    for spec in args.source:
        sid, _, path = spec.partition("=")
        if not path:
            ap.error(f"--source needs ID=PATH, got {spec!r}")
        sources[sid] = path
    if not sources and not args.container:
        ap.error("need --container or at least one --source")
    srv = serve(args.container, args.port, sources=sources, statics=args.statics)
    print(json.dumps({
        "serving": sorted(set(sources.values()) | ({args.container} if args.container else set())),
        "port": srv.server_address[1],
    }))
    srv.serve_forever()
    return 0


if __name__ == "__main__":
    sys.exit(main())
