"""Remote containers over HTTP ranged requests (sources/ranged_io.py):
the pmtiles/versatiles readers, point lookups, TileJSON, and the serve
job all work against an http:// URL, fetching only byte ranges."""

from __future__ import annotations

import http.server
import os
import threading

import pytest

from versatiles_rs_spark.operators.convert import convert_pages_to_tiles
from versatiles_rs_spark.queries import _docs_geo
from versatiles_rs_spark.sources import (
    container_tilejson,
    lookup_tile,
    read_container,
    write_container,
)


class _RangeHandler(http.server.SimpleHTTPRequestHandler):
    """SimpleHTTPRequestHandler with Range support + request accounting."""

    ranged_hits = 0
    full_hits = 0

    def do_GET(self):
        path = self.translate_path(self.path)
        if not os.path.isfile(path):
            return self.send_error(404)
        with open(path, "rb") as f:
            data = f.read()
        rng = self.headers.get("Range")
        if rng and rng.startswith("bytes="):
            type(self).ranged_hits += 1
            spec = rng[len("bytes="):]
            a, _, b = spec.partition("-")
            start = int(a)
            end = int(b) if b else len(data) - 1
            body = data[start : end + 1]
            self.send_response(206)
            self.send_header("Content-Range", f"bytes {start}-{start+len(body)-1}/{len(data)}")
        else:
            type(self).full_hits += 1
            body = data
            self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def remote(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("remote_c")
    tiles = convert_pages_to_tiles(_docs_geo(spark, "/root/testdata/sf0.001"), 0, 3, keep_ratio=1.0)
    write_container(tiles, str(tmp / "t.pmtiles"), metadata={"name": "remote-pm"})
    write_container(tiles, str(tmp / "t.versatiles"), metadata={"name": "remote-vt"})
    import functools

    handler = functools.partial(_RangeHandler, directory=str(tmp))
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    local = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
             for r in read_container(spark, str(tmp / "t.pmtiles")).collect()}
    yield base, local, _RangeHandler
    srv.shutdown()


def test_remote_pmtiles_scan_matches_local(spark, remote):
    base, local, handler = remote
    got = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
           for r in read_container(spark, f"{base}/t.pmtiles").collect()}
    assert got == local
    assert handler.ranged_hits > 0  # actually used Range requests


def test_remote_versatiles_scan_matches_local(spark, remote):
    base, local, handler = remote
    got = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
           for r in read_container(spark, f"{base}/t.versatiles").collect()}
    assert got == local


def test_remote_point_lookup_and_tilejson(remote):
    base, local, handler = remote
    (z, x, y), blob = next(iter(sorted(local.items())))
    for ext in ("pmtiles", "versatiles"):
        hit = lookup_tile(f"{base}/t.{ext}", z, x, y)
        assert hit is not None
        got_blob, codec = hit
        assert got_blob == blob
    tj = container_tilejson(f"{base}/t.pmtiles")
    assert tj.get("name") == "remote-pm"
    # a lookup never downloads the whole container
    assert handler.full_hits == 0


def test_serve_job_over_remote_source(remote):
    """serve_job mounting an http:// container: tiles proxy through
    ranged lookups."""
    import gzip
    import sys
    import urllib.request

    sys.path.insert(0, "/root/repo/jobs")
    from serve_job import serve

    base, local, _h = remote
    srv = serve(sources={"rm": f"{base}/t.pmtiles"}, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        (z, x, y), blob = next(iter(sorted(local.items())))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/tiles/rm/{z}/{x}/{y}",
            headers={"Accept-Encoding": "gzip"},
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            assert gzip.decompress(r.read()) == gzip.decompress(blob)
    finally:
        srv.shutdown()


def test_ranged_file_edge_cases(tmp_path):
    """HttpRangedFile against a server that IGNORES Range (200 + full
    body): reads still return the right slices; past-EOF reads behave
    like files (empty)."""
    import functools
    import http.server as hs
    import threading

    from versatiles_rs_spark.sources.ranged_io import HttpRangedFile, open_ranged

    (tmp_path / "blob.bin").write_bytes(bytes(range(256)) * 4)

    class NoRange(hs.SimpleHTTPRequestHandler):
        def do_GET(self):
            p = self.translate_path(self.path)
            with open(p, "rb") as f:
                data = f.read()
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    srv = hs.ThreadingHTTPServer(
        ("127.0.0.1", 0), functools.partial(NoRange, directory=str(tmp_path))
    )
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/blob.bin"
        f = HttpRangedFile(url)
        f.seek(10)
        assert f.read(4) == bytes([10, 11, 12, 13])
        assert f.tell() == 14
        f.seek(1020)
        assert f.read() == bytes([252, 253, 254, 255])
        f.seek(5000)
        assert f.read(4) == b""  # past EOF
        # open_ranged dispatch: local path -> plain file
        with open_ranged(str(tmp_path / "blob.bin")) as lf:
            lf.seek(10)
            assert lf.read(4) == bytes([10, 11, 12, 13])
    finally:
        srv.shutdown()


def test_remote_convert_serve_chain(remote, tmp_path):
    """End-to-end remote story (round 5): convert_job ingests an http://
    container (ranged reads), exports a local container, and serve_job
    serves the exported tiles byte-compatibly with the remote originals."""
    import gzip
    import json
    import subprocess
    import sys
    import urllib.request

    base, local, _h = remote
    out_tbl = str(tmp_path / "cc_tbl")
    out_pm = str(tmp_path / "cc.pmtiles")
    env = dict(os.environ, PYTHONPATH="/root/repo")
    run = subprocess.run(
        [sys.executable, "/root/repo/jobs/convert_job.py",
         "--input", f"{base}/t.pmtiles", "--output", out_tbl,
         "--min-zoom", "0", "--max-zoom", "3",
         "--export", out_pm, "--master", "local[4]"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert run.returncode == 0, run.stderr[-2000:]
    json.loads(run.stdout.strip().splitlines()[-1])  # one JSON line

    sys.path.insert(0, "/root/repo/jobs")
    from serve_job import serve

    srv = serve(out_pm, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        for (z, x, y), blob in sorted(local.items())[:5]:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/tiles/{z}/{x}/{y}",
                headers={"Accept-Encoding": "gzip"},
            )
            with urllib.request.urlopen(req, timeout=10) as r:
                assert gzip.decompress(r.read()) == gzip.decompress(blob), (z, x, y)
    finally:
        srv.shutdown()
