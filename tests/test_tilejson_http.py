"""HTTP from_tilejson: distributed fetch against a loopback tile server
with retries, 404 holes, and parity with the directory reader."""

import http.server
import json
import os
import threading

import pytest

from versatiles_rs_spark.sources.tilejson import from_tilejson


class _TileHandler(http.server.BaseHTTPRequestHandler):
    tiles: dict[str, bytes] = {}
    flaky_once: set[str] = set()
    served_after_retry: set[str] = set()

    def do_GET(self):
        path = self.path.lstrip("/")
        if path in self.flaky_once:
            self.flaky_once.discard(path)
            self.served_after_retry.add(path)
            self.send_error(503)
            return
        blob = self.tiles.get(path)
        if blob is None:
            self.send_error(404)
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(blob)))
        self.end_headers()
        self.wfile.write(blob)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def tile_server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _TileHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _fill_tiles(zmax=2):
    _TileHandler.tiles = {}
    for z in range(zmax + 1):
        for x in range(2**z):
            for y in range(2**z):
                if (z, x, y) == (2, 3, 3):
                    continue  # a hole: sparse tileset
                _TileHandler.tiles[f"{z}/{x}/{y}.png"] = (
                    b"PNGDATA-%d-%d-%d" % (z, x, y)
                )


def test_http_template_fetches_full_pyramid(spark, tile_server, tmp_path):
    _fill_tiles()
    _TileHandler.flaky_once = {"1/0/0.png"}  # 503 once -> retried
    port = tile_server.server_address[1]
    tj = {
        "tilejson": "3.0.0",
        "tiles": [f"http://127.0.0.1:{port}/{{z}}/{{x}}/{{y}}.png"],
        "minzoom": 0,
        "maxzoom": 2,
        "bounds": [-180, -85, 180, 85],
    }
    p = str(tmp_path / "remote.json")
    with open(p, "w") as f:
        json.dump(tj, f)

    out = from_tilejson(spark, p)
    rows = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in out.collect()}
    # 1 + 4 + 16 pyramid minus the one 404 hole
    assert len(rows) == 21 - 1
    assert (2, 3, 3) not in rows
    assert rows[(0, 0, 0)] == b"PNGDATA-0-0-0"
    assert rows[(2, 1, 0)] == b"PNGDATA-2-1-0"
    # the 503'd tile was retried and served
    assert rows[(1, 0, 0)] == b"PNGDATA-1-0-0"
    assert "1/0/0.png" in _TileHandler.served_after_retry


def test_http_zoom_clamp_and_bounds(spark, tile_server, tmp_path):
    _fill_tiles()
    _TileHandler.flaky_once = set()
    port = tile_server.server_address[1]
    tj = {
        "tiles": [f"http://127.0.0.1:{port}/{{z}}/{{x}}/{{y}}.png"],
        "minzoom": 0,
        "maxzoom": 2,
        # west hemisphere only at z>=1: x range halves
        "bounds": [-180, -85, -1, 85],
    }
    p = str(tmp_path / "west.json")
    with open(p, "w") as f:
        json.dump(tj, f)
    out = from_tilejson(spark, p, min_zoom=1, max_zoom=1)
    rows = {(r["z"], r["x"], r["y"]) for r in out.collect()}
    assert rows == {(1, 0, 0), (1, 0, 1)}
