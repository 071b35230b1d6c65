"""Serve-job round-5 parity trio: CORS (reference versatiles/src/server/
cors.rs), YAML config mode (versatiles/src/config/main.rs +
testdata/config1.yml), and hot reload (versatiles/src/server/reload.rs).
"""

import json
import os
import signal
import threading
import urllib.error
import urllib.request

import pytest

from versatiles_rs_spark.operators.convert import convert_pages_to_tiles
from versatiles_rs_spark.queries import _docs_geo
from versatiles_rs_spark.sources import write_container


def _get(port, path, headers=None):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}",
                                 headers=headers or {})
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.status, dict(r.headers), r.read()


def _options(port, path, headers=None):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}",
                                 headers=headers or {}, method="OPTIONS")
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.status, dict(r.headers)


@pytest.fixture(scope="module")
def containers(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cfgsrv")
    tiles = convert_pages_to_tiles(
        _docs_geo(spark, "/root/testdata/sf0.001"), 0, 3, keep_ratio=1.0
    )
    a = str(root / "alpha.mbtiles")
    b = str(root / "beta.mbtiles")
    write_container(tiles, a)
    write_container(tiles.filter("z <= 2"), b)
    return str(root), a, b


def _start(config_path):
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    from serve_job import serve

    srv = serve(port=0, config=config_path)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv


# --- cors_matcher: the five reference pattern forms (cors.rs tests) --------

def test_cors_matcher_patterns():
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    from serve_job import cors_matcher

    exact = cors_matcher(["https://maps.example.org"])
    assert exact("https://maps.example.org")
    assert not exact("https://maps.example.com")
    assert cors_matcher(["*"])("http://anything.local")
    suffix = cors_matcher(["*example.com"])
    assert suffix("https://foo.example.com") and suffix("https://bar.example.com")
    assert not suffix("https://example.org")
    prefix = cors_matcher(["https://dev-*"])
    assert prefix("https://dev-01.example.com")
    assert not prefix("https://prod-01.example.com")
    rx = cors_matcher([r"/^https://(foo|bar)\.example\.com$/"])
    assert rx("https://foo.example.com") and rx("https://bar.example.com")
    assert not rx("https://baz.example.com")
    # list ORs all checks
    multi = cors_matcher(["https://a.org", "*.b.org"])
    assert multi("https://a.org") and multi("https://x.b.org")
    assert not multi("https://c.org")


# --- config-driven server --------------------------------------------------

@pytest.fixture(scope="module")
def cfg_served(containers, tmp_path_factory):
    root, a, b = containers
    site = tmp_path_factory.mktemp("site")
    (site / "app.js").write_text("console.log(1)")
    cfg = tmp_path_factory.mktemp("cfg") / "server.yml"
    # mapping + documented-pair forms, relative tile path, static prefix
    cfg.write_text(f"""
server:
  disable_api: false
cors:
  allowed_origins:
    - "https://maps.example.org"
    - "*.trusted.net"
  max_age_seconds: 1234
extra_response_headers:
  Cache-Control: "public, max-age=86400, immutable"
  Timing-Allow-Origin: "*"
static:
  - src: "{site}"
    prefix: "/assets"
tiles:
  - name: alpha
    src: "{os.path.basename(a)}"
  - ["beta", "{b}"]
""")
    # relative tile path resolves against the config dir -> symlink it in
    os.symlink(a, str(cfg.parent / os.path.basename(a)))
    srv = _start(str(cfg))
    yield srv, str(cfg), containers
    srv.shutdown()


def test_config_mounts_tiles_and_static_prefix(cfg_served):
    srv, _, _ = cfg_served
    port = srv.server_address[1]
    status, _, body = _get(port, "/tiles/index.json")
    assert status == 200 and json.loads(body) == ["alpha", "beta"]
    s, _, _ = _get(port, "/tiles/alpha/0/0/0", {"Accept-Encoding": "gzip"})
    assert s == 200
    s, _, _ = _get(port, "/tiles/beta/0/0/0", {"Accept-Encoding": "gzip"})
    assert s == 200
    # beta was truncated at z2
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(port, "/tiles/beta/3/4/4")
    assert e.value.code == 404
    # static mounted under its prefix, not at root
    s, _, body = _get(port, "/assets/app.js")
    assert s == 200 and body == b"console.log(1)"
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(port, "/app.js")
    assert e.value.code == 404


def test_cors_headers_on_all_route_kinds(cfg_served):
    srv, _, _ = cfg_served
    port = srv.server_address[1]
    ok = {"Origin": "https://maps.example.org"}
    for path in ("/tiles/index.json", "/tiles/alpha/tiles.json",
                 "/tiles/alpha/0/0/0", "/assets/app.js"):
        _, headers, _ = _get(port, path, ok)
        assert headers.get("Access-Control-Allow-Origin") == \
            "https://maps.example.org", path
        assert headers.get("Vary") == "Origin", path
    # suffix pattern
    _, headers, _ = _get(port, "/tiles/alpha/0/0/0",
                         {"Origin": "https://app.trusted.net"})
    assert headers.get("Access-Control-Allow-Origin") == "https://app.trusted.net"
    # disallowed origin: no ACAO (tower-http predicate semantics)
    _, headers, _ = _get(port, "/tiles/alpha/0/0/0",
                         {"Origin": "https://evil.example.com"})
    assert "Access-Control-Allow-Origin" not in headers


def test_preflight_and_max_age(cfg_served):
    srv, _, _ = cfg_served
    port = srv.server_address[1]
    status, headers = _options(port, "/tiles/alpha/0/0/0",
                               {"Origin": "https://maps.example.org"})
    assert status == 204
    assert headers.get("Access-Control-Allow-Origin") == "https://maps.example.org"
    assert headers.get("Access-Control-Max-Age") == "1234"
    assert "GET" in headers.get("Access-Control-Allow-Methods", "")


def test_extra_response_headers_everywhere(cfg_served):
    srv, _, _ = cfg_served
    port = srv.server_address[1]
    for path in ("/tiles/index.json", "/tiles/alpha/0/0/0", "/assets/app.js"):
        _, headers, _ = _get(port, path)
        assert headers.get("Cache-Control") == \
            "public, max-age=86400, immutable", path
        assert headers.get("Timing-Allow-Origin") == "*", path


def test_disable_api_hides_index(containers, tmp_path):
    _, a, _ = containers
    cfg = tmp_path / "s.yml"
    cfg.write_text(f"server:\n  disable_api: true\ntiles:\n  - [t, \"{a}\"]\n")
    srv = _start(str(cfg))
    try:
        port = srv.server_address[1]
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(port, "/tiles/index.json")
        assert e.value.code == 404
        s, _, _ = _get(port, "/tiles/t/0/0/0", {"Accept-Encoding": "gzip"})
        assert s == 200
    finally:
        srv.shutdown()


def test_unknown_config_section_rejected(tmp_path):
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    from serve_job import load_config

    cfg = tmp_path / "bad.yml"
    cfg.write_text("tiles: []\nbogus_section: 1\n")
    with pytest.raises(ValueError, match="bogus_section"):
        load_config(str(cfg))


# --- hot reload ------------------------------------------------------------

def test_hot_reload_swaps_sources_without_dropping_listener(containers, tmp_path):
    _, a, b = containers
    cfg = tmp_path / "r.yml"
    cfg.write_text(f"tiles:\n  - [one, \"{a}\"]\n")
    srv = _start(str(cfg))
    try:
        port = srv.server_address[1]
        assert _get(port, "/tiles/one/0/0/0", {"Accept-Encoding": "gzip"})[0] == 200
        # swap: remove 'one', add 'two' + a static mount
        site = tmp_path / "site"
        site.mkdir()
        (site / "x.txt").write_text("hi")
        cfg.write_text(
            f"tiles:\n  - [two, \"{b}\"]\nstatic:\n  - src: \"{site}\"\n")
        srv.state.reload()
        _, _, body = _get(port, "/tiles/index.json")
        assert json.loads(body) == ["two"]
        assert _get(port, "/tiles/two/0/0/0", {"Accept-Encoding": "gzip"})[0] == 200
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(port, "/tiles/one/0/0/0")
        assert e.value.code == 404
        assert _get(port, "/x.txt")[2] == b"hi"
        # same listener: port unchanged, same server object still serving
        assert srv.server_address[1] == port
    finally:
        srv.shutdown()


def test_hot_reload_keeps_unchanged_and_skips_broken(containers, tmp_path):
    _, a, b = containers
    cfg = tmp_path / "r2.yml"
    cfg.write_text(f"tiles:\n  - [keep, \"{a}\"]\n")
    srv = _start(str(cfg))
    try:
        port = srv.server_address[1]
        cfg.write_text(
            f"tiles:\n  - [keep, \"{a}\"]\n  - [broken, \"/nope/missing.mbtiles\"]\n"
            f"  - [fresh, \"{b}\"]\n")
        srv.state.reload()
        _, _, body = _get(port, "/tiles/index.json")
        # broken source logged + skipped; keep + fresh both serve (reload.rs
        # apply_tile_source_diff error branch)
        assert json.loads(body) == ["fresh", "keep"]
        assert _get(port, "/tiles/keep/0/0/0", {"Accept-Encoding": "gzip"})[0] == 200
        assert _get(port, "/tiles/fresh/0/0/0", {"Accept-Encoding": "gzip"})[0] == 200
    finally:
        srv.shutdown()


def test_sighup_triggers_reload(containers, tmp_path):
    _, a, b = containers
    cfg = tmp_path / "hup.yml"
    cfg.write_text(f"tiles:\n  - [first, \"{a}\"]\n")
    srv = _start(str(cfg))
    old = signal.signal(signal.SIGHUP, lambda *_: srv.state.reload())
    try:
        port = srv.server_address[1]
        cfg.write_text(f"tiles:\n  - [second, \"{b}\"]\n")
        os.kill(os.getpid(), signal.SIGHUP)
        # the handler runs synchronously in this (main) thread on return
        _, _, body = _get(port, "/tiles/index.json")
        assert json.loads(body) == ["second"]
    finally:
        signal.signal(signal.SIGHUP, old)
        srv.shutdown()


def test_reference_config1_yml_parses():
    """The reference's own example config (testdata/config1.yml) parses
    into the expected sections."""
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    from serve_job import load_config

    cfg = load_config("/root/reference/testdata/config1.yml")
    assert cfg["server"]["disable_api"] is True
    assert cfg["cors"]["allowed_origins"] == [
        "https://example.org", "*.other-example.org"]
    assert cfg["cors"]["max_age_seconds"] == 86400
    assert cfg["extra_response_headers"]["Cache-Control"].startswith("public")
    names = [t["name"] for t in cfg["tiles"]]
    assert names == ["osm", "berlin", "pipeline"]
    # remote URL untouched, relative paths resolved against the config dir
    assert cfg["tiles"][0]["src"].startswith("https://")
    assert cfg["tiles"][1]["src"] == "/root/reference/testdata/berlin.mbtiles"
    prefixes = [s["prefix"] for s in cfg["static"]]
    assert prefixes == ["/", "/whynot/", "/assets"]
