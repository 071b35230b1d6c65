#!/usr/bin/env python
"""Tile + static server over binary containers — the `versatiles serve`
analog (versatiles/src/server: routes.rs, handlers.rs, cors.rs, reload.rs,
sources/; versatiles/src/config: main.rs, server.rs, cors.rs,
tile_source.rs, static_source.rs).

    python jobs/serve_job.py --container tiles.pmtiles [--port 8080]
    python jobs/serve_job.py --source osm=a.versatiles --source hills=b.mbtiles \
        --static site_dir --static assets.tar.br
    python jobs/serve_job.py --config server.yml

Routes (reference routes.rs surface):
    GET /tiles/index.json             sorted list of mounted source ids
                                      (the reference "API"; hidden when
                                      server.disable_api is true)
    GET /tiles/{id}/{z}/{x}/{y}       tile bytes from the named source
    GET /tiles/{id}/tiles.json        per-source TileJSON metadata
    GET /tiles/{z}/{x}/{y}            legacy single-container route
    GET /tiles/tiles.json             (kept when --container is used)
    GET /health                       liveness probe
    GET /<anything else>              static fallback: static sources
                                      checked in order, first hit wins
                                      (handlers.rs serve_static); "/" and
                                      directory paths resolve index.html;
                                      each source may mount under a prefix

CORS (reference server/cors.rs:27-63 pattern forms): `*` allows all,
`*suffix` suffix-matches, `prefix*` prefix-matches, `/regex/` is a full
regex, anything else matches exactly. A matching Origin gets
`Access-Control-Allow-Origin: <origin>` (plus `Vary: Origin`); OPTIONS
preflights also get `Access-Control-Max-Age` (config
cors.max_age_seconds, default 86400 per config/cors.rs:57).

YAML config (reference config/main.rs Config; see
reference testdata/config1.yml): sections `server` (ip, port,
minimal_recompression, disable_api), `cors` (allowed_origins,
max_age_seconds), `extra_response_headers` (added to EVERY response,
overriding), `static` (list of {src, prefix} maps or documented
[prefix, src] pairs), `tiles` (list of {name, src} maps or [name, src]
pairs). Relative paths resolve against the config file's directory
(Config::from_path). CLI --port/--ip override the file
(ServerConfig::override_optional_*).

Hot reload (reference server/reload.rs ReloadHandle + SIGHUP): on
SIGHUP the config file is re-read and the tile-source diff applied —
sources that disappeared or changed are unmounted, new/changed ones
mounted (a source that fails to open is logged and skipped, the rest
still apply); static sources are rebuilt and swapped wholesale when
their config changed. The listener never drops: state swaps are
attribute assignments read per-request.

Tile bytes carry Content-Encoding from the container codec, honoring the
client's Accept-Encoding — recompressed only when the stored codec is not
acceptable. Serving is pure point lookups (sources.lookup_tile: mbtiles
indexed SELECT, pmtiles directory bisect, versatiles block+tile index
seeks — O(1)/O(log n), no Spark session, no scan), so this process is a
few-megabyte sidecar: Spark builds containers, this serves them.

Static sources are directories or tar archives (.tar/.tar.gz/.tar.br —
the .br path uses the engine's own RFC 7932 decoder, matching the
reference's static.tar.br fixture); tar entries load once at mount.
"""

from __future__ import annotations

import argparse
import http.server
import io
import json
import os
import re
import signal
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


def cors_matcher(allowed_origins: list[str]):
    """Compile the reference's origin-pattern list into one predicate.

    Pattern forms (server/cors.rs:34-51, in the same precedence order):
    `*` → all; `*suffix` (no other stars) → endswith; `prefix*` →
    startswith; `/…/` → full regex; else exact string match.
    """
    checks = []
    for pat in allowed_origins:
        if pat == "*":
            checks.append(lambda o: True)
        elif re.fullmatch(r"\*[^*]+", pat):
            checks.append(lambda o, s=pat[1:]: o.endswith(s))
        elif re.fullmatch(r"[^*]+\*", pat):
            checks.append(lambda o, p=pat[:-1]: o.startswith(p))
        elif len(pat) > 2 and pat.startswith("/") and pat.endswith("/"):
            rx = re.compile(pat[1:-1])
            checks.append(lambda o, r=rx: bool(r.search(o)))
        else:
            checks.append(lambda o, e=pat: o == e)
    return lambda origin: any(c(origin) for c in checks)


class StaticSource:
    """One static content source: a directory or a tar archive, mounted
    under a URL ``prefix`` (config/static_source.rs: default "/").

    Reference parity: handlers.rs `serve_static` walks sources in order,
    first one returning data wins; directory requests resolve index.html.
    """

    def __init__(self, path: str, prefix: str = "/"):
        self.path = path
        self.prefix = "/" + prefix.strip("/")
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

    def _strip_prefix(self, url_path: str) -> str | None:
        if self.prefix == "/":
            return url_path
        if url_path == self.prefix:
            return "/"
        if url_path.startswith(self.prefix + "/"):
            return url_path[len(self.prefix):]
        return None

    def get(self, url_path: str) -> bytes | None:
        sub = self._strip_prefix(url_path)
        if sub is None:
            return None
        candidates = [sub]
        if sub.endswith("/"):
            candidates = [sub + "index.html"]
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


class ServerState:
    """Mutable server state read per-request; hot reload swaps the
    attributes (atomic assignments — the reload.rs ArcSwap/DashMap
    analog) so the listener never drops."""

    def __init__(self):
        self.sources: dict[str, str] = {}
        self.tilejsons: dict[str, dict] = {}
        self.statics: list[StaticSource] = []
        self.legacy: str | None = None
        self.allow_origin = cors_matcher(["*"])  # config/cors.rs default
        self.max_age_seconds = 86400
        self.extra_headers: list[tuple[str, str]] = []
        self.disable_api = False
        self.config_path: str | None = None
        # raw config entries for the reload diff (reload.rs
        # current_tile_configs / current_static_configs)
        self._tile_cfgs: list[dict] = []
        self._static_cfgs: list[dict] = []

    # -- config ingestion ---------------------------------------------------

    def apply_config(self, cfg: dict) -> None:
        cors = cfg.get("cors") or {}
        if "allowed_origins" in cors:
            self.allow_origin = cors_matcher(list(cors["allowed_origins"]))
        if cors.get("max_age_seconds") is not None:
            self.max_age_seconds = int(cors["max_age_seconds"])
        hdrs = cfg.get("extra_response_headers") or {}
        self.extra_headers = [(str(k), str(v)) for k, v in hdrs.items()]
        server = cfg.get("server") or {}
        self.disable_api = bool(server.get("disable_api", False))
        self.reload_sources(cfg)

    def reload_sources(self, cfg: dict) -> None:
        """Apply the tile/static source diff (reload.rs semantics):
        tiles removed when their config entry disappeared or changed,
        added when new or changed, open failures logged and skipped;
        statics rebuilt wholesale only when their config changed."""
        new_tiles = _tile_configs(cfg)
        old_by_name = {c["name"]: c for c in self._tile_cfgs}
        new_by_name = {c["name"]: c for c in new_tiles}
        sources = dict(self.sources)
        tilejsons = dict(self.tilejsons)
        for name, old in old_by_name.items():
            if new_by_name.get(name) != old and name != self.legacy:
                sources.pop(name, None)
                tilejsons.pop(name, None)
                print(f"reload: removed tile source '{name}'", file=sys.stderr)
        for name, new in new_by_name.items():
            if old_by_name.get(name) == new and name in sources:
                continue
            try:
                tj = _source_tilejson(new["src"], strict=True)
            except Exception as e:  # keep serving the rest (reload.rs)
                print(f"reload: failed to open tile source '{name}': {e}",
                      file=sys.stderr)
                continue
            sources[name] = new["src"]
            tilejsons[name] = tj
        self.sources, self.tilejsons = sources, tilejsons
        self._tile_cfgs = new_tiles

        new_statics = _static_configs(cfg)
        if new_statics != self._static_cfgs:
            built: list[StaticSource] = []
            for c in new_statics:
                try:
                    built.append(StaticSource(c["src"], c.get("prefix") or "/"))
                except Exception as e:
                    print(f"reload: failed to build static source "
                          f"'{c['src']}': {e}", file=sys.stderr)
            self.statics = built
            self._static_cfgs = new_statics

    def reload(self) -> None:
        if not self.config_path:
            return
        try:
            cfg = load_config(self.config_path)
        except Exception as e:
            print(f"config reload failed: {e}", file=sys.stderr)
            return
        self.reload_sources(cfg)


def load_config(path: str) -> dict:
    """Parse the reference's YAML server config (config/main.rs Config),
    resolving relative source paths against the config directory
    (Config::from_path + resolve_paths)."""
    import yaml

    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    if not isinstance(cfg, dict):
        raise ValueError(f"config root must be a mapping, got {type(cfg).__name__}")
    known = {"server", "cors", "extra_response_headers", "static", "tiles"}
    unknown = set(cfg) - known
    if unknown:  # serde(deny_unknown_fields)
        raise ValueError(f"unknown config sections: {sorted(unknown)}")
    base = os.path.dirname(os.path.abspath(path))

    def resolve(p: str) -> str:
        if re.match(r"^[a-z][a-z0-9+.-]*://", p):
            return p  # URLs stay as-is (DataLocation::resolve)
        return os.path.normpath(os.path.join(base, p))

    tiles = []
    for raw in cfg.get("tiles") or []:
        e = _norm_tile_entry(raw)
        e["src"] = resolve(e["src"])
        tiles.append(e)
    cfg["tiles"] = tiles
    statics = []
    for raw in cfg.get("static") or []:
        e = _norm_static_entry(raw)
        e["src"] = resolve(e["src"])
        statics.append(e)
    cfg["static"] = statics
    return cfg


def _norm_tile_entry(raw) -> dict:
    # mapping {name?, src} or documented pair [name, src]
    # (config/tile_source.rs:7-12)
    if isinstance(raw, dict):
        if "src" not in raw:
            raise ValueError(f"tile source entry needs 'src': {raw!r}")
        name = raw.get("name") or os.path.splitext(os.path.basename(raw["src"]))[0]
        return {"name": str(name), "src": str(raw["src"])}
    if isinstance(raw, (list, tuple)) and len(raw) == 2:
        return {"name": str(raw[0]), "src": str(raw[1])}
    raise ValueError(f"bad tile source entry: {raw!r}")


def _norm_static_entry(raw) -> dict:
    # mapping {src, prefix?} or documented pair [prefix, src]
    # (config/static_source.rs:7-16)
    if isinstance(raw, dict):
        if "src" not in raw:
            raise ValueError(f"static entry needs 'src': {raw!r}")
        return {"src": str(raw["src"]), "prefix": str(raw.get("prefix") or "/")}
    if isinstance(raw, (list, tuple)) and len(raw) == 2:
        return {"src": str(raw[1]), "prefix": str(raw[0])}
    raise ValueError(f"bad static entry: {raw!r}")


def _tile_configs(cfg: dict) -> list[dict]:
    return [_norm_tile_entry(r) for r in cfg.get("tiles") or []]


def _static_configs(cfg: dict) -> list[dict]:
    return [_norm_static_entry(r) for r in cfg.get("static") or []]


def make_handler(state: ServerState):
    from versatiles_rs_spark.sources import lookup_tile

    tile_rx = re.compile(r"^/tiles/(?:([A-Za-z0-9_-]+)/)?(\d+)/(\d+)/(\d+)$")

    class Handler(http.server.BaseHTTPRequestHandler):
        def _cors_headers(self) -> list[tuple[str, str]]:
            origin = self.headers.get("Origin")
            if origin and state.allow_origin(origin):
                # tower-http AllowOrigin::predicate mirrors the origin
                return [("Access-Control-Allow-Origin", origin),
                        ("Vary", "Origin")]
            return []

        def _common_headers(self) -> list[tuple[str, str]]:
            # extra_response_headers apply to EVERY response and override
            # (config/main.rs:86-94); CORS applies to API/tile/static alike
            return self._cors_headers() + state.extra_headers

        def do_OPTIONS(self):
            # preflight: ACAO when the origin matches + Max-Age
            # (cors.rs build_cors_layer .max_age)
            self.send_response(204)
            for k, v in self._common_headers():
                self.send_header(k, v)
            if self.headers.get("Origin") and state.allow_origin(
                    self.headers.get("Origin")):
                self.send_header("Access-Control-Allow-Methods", "GET, HEAD, OPTIONS")
                self.send_header("Access-Control-Max-Age", str(state.max_age_seconds))
            self.send_header("Content-Length", "0")
            self.end_headers()

        def do_GET(self):
            path = self.path.split("?", 1)[0]
            if path == "/health":
                return self._send(200, b"ok", "text/plain")
            if path == "/tiles/index.json" and not state.disable_api:
                body = json.dumps(sorted(state.sources)).encode()
                return self._send(200, body, "application/json")
            m = re.match(r"^/tiles/(?:([A-Za-z0-9_-]+)/)?tiles\.json$", path)
            if m:
                sid = m.group(1)
                if sid is None and state.legacy is not None:
                    sid = state.legacy
                if sid in state.tilejsons:
                    return self._send(
                        200, json.dumps(state.tilejsons[sid]).encode(),
                        "application/json"
                    )
                return self.send_error(404)
            m = tile_rx.match(path)
            if m:
                sid = m.group(1)
                if sid is None and state.legacy is not None:
                    sid = state.legacy
                container = state.sources.get(sid)
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
                fmt = (state.tilejsons.get(sid) or {}).get("format", "mvt")
                self.send_response(200)
                self.send_header(
                    "Content-Type", _FORMAT_MIME.get(fmt, "application/octet-stream")
                )
                if codec in _CODEC_HEADER:
                    self.send_header("Content-Encoding", _CODEC_HEADER[codec])
                self.send_header("Content-Length", str(len(blob)))
                for k, v in self._common_headers():
                    self.send_header(k, v)
                self.end_headers()
                self.wfile.write(blob)
                return
            # static fallback, first source wins (handlers.rs serve_static)
            for src in state.statics:
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
            for k, v in self._common_headers():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    return Handler


def _source_tilejson(path: str, strict: bool = False) -> dict:
    from versatiles_rs_spark.sources import container_tilejson

    try:
        return container_tilejson(path)
    except Exception:
        if strict:
            raise
        return {}


def serve(
    container: str | None = None,
    port: int = 0,
    sources: dict[str, str] | None = None,
    statics: list[str] | None = None,
    config: str | dict | None = None,
    ip: str = "127.0.0.1",
    allowed_origins: list[str] | None = None,
):
    """Start the server; returns (HTTPServer, ServerState).

    ``container`` mounts one legacy unnamed source (old routes keep
    working); ``sources`` maps id -> container path for the
    /tiles/{id}/... routes; ``config`` is a YAML path (hot-reloadable via
    SIGHUP or ServerState.reload()) or an already-parsed dict; CLI-style
    args layer on top of the file (ServerConfig::override_optional_*).
    """
    state = ServerState()
    if config is not None:
        if isinstance(config, str):
            state.config_path = config
            cfg = load_config(config)
        else:
            cfg = config
        state.apply_config(cfg)
    if allowed_origins:
        state.allow_origin = cors_matcher(list(allowed_origins))
    mounts: dict[str, str] = dict(sources or {})
    legacy = None
    if container is not None:
        legacy = os.path.splitext(os.path.basename(container))[0]
        # avoid clobbering an explicit source of the same name
        while (legacy in mounts and mounts[legacy] != container) or \
                (legacy in state.sources and state.sources[legacy] != container):
            legacy += "_"
        mounts[legacy] = container
    state.legacy = legacy
    for sid, p in mounts.items():
        state.sources[sid] = p
        state.tilejsons[sid] = _source_tilejson(p)
    state.statics = state.statics + [StaticSource(p) for p in (statics or [])]
    srv = http.server.ThreadingHTTPServer(
        (ip, port), make_handler(state),
    )
    srv.state = state
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
    ap.add_argument("--config", help="YAML server config (reference config1.yml "
                                     "shape); SIGHUP hot-reloads tile/static sources")
    ap.add_argument("--cors", action="append", default=[], dest="cors",
                    metavar="ORIGIN", help="allowed origin pattern (repeatable; "
                                           "*, *suffix, prefix*, /regex/, exact)")
    ap.add_argument("--ip", default=None)
    ap.add_argument("--port", type=int, default=None)
    args = ap.parse_args()
    sources = {}
    for spec in args.source:
        sid, _, path = spec.partition("=")
        if not path:
            ap.error(f"--source needs ID=PATH, got {spec!r}")
        sources[sid] = path
    cfg = load_config(args.config) if args.config else None
    if not sources and not args.container and not (cfg and cfg.get("tiles")):
        ap.error("need --container, --source, or a --config with tiles")
    server_cfg = (cfg or {}).get("server") or {}
    ip = args.ip or server_cfg.get("ip") or "127.0.0.1"
    port = args.port if args.port is not None else int(server_cfg.get("port") or 8080)
    srv = serve(args.container, port, sources=sources, statics=args.statics,
                config=args.config if args.config else None, ip=ip,
                allowed_origins=args.cors or None)
    if args.config:
        # reload.rs spawn_sighup_handler: re-read + diff-apply on SIGHUP
        signal.signal(signal.SIGHUP, lambda *_: srv.state.reload())
    print(json.dumps({
        "serving": sorted(srv.state.sources.values()),
        "port": srv.server_address[1],
    }), flush=True)
    srv.serve_forever()
    return 0


if __name__ == "__main__":
    sys.exit(main())
