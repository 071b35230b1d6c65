"""The serve job (`versatiles serve` analog) over real containers."""

import gzip
import threading
import urllib.error
import urllib.request

import pytest

from versatiles_rs_spark.operators.convert import convert_pages_to_tiles
from versatiles_rs_spark.queries import _docs_geo
from versatiles_rs_spark.sources import write_container


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    from serve_job import serve

    tiles = convert_pages_to_tiles(
        _docs_geo(spark, "/root/testdata/sf0.001"), 0, 3, keep_ratio=1.0
    )
    want = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in tiles.collect()}
    path = str(tmp_path_factory.mktemp("srv") / "t.mbtiles")
    write_container(tiles, path)
    srv = serve(path, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1], want
    srv.shutdown()


def _get(port, path, headers=None):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}", headers=headers or {})
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.status, dict(r.headers), r.read()


def test_tile_route_serves_exact_bytes(served):
    port, want = served
    (z, x, y), blob = next(iter(sorted(want.items())))
    # container normalizes mvt to gzip; an Accept-Encoding: gzip client
    # gets the stored bytes verbatim with the correct header
    status, headers, body = _get(port, f"/tiles/{z}/{x}/{y}", {"Accept-Encoding": "gzip"})
    assert status == 200
    assert headers.get("Content-Encoding") == "gzip"
    assert gzip.decompress(body) == gzip.decompress(blob)


def test_accept_encoding_recompression(served):
    port, want = served
    (z, x, y), blob = next(iter(sorted(want.items())))
    # a client that accepts nothing compressed gets plain bytes
    status, headers, body = _get(port, f"/tiles/{z}/{x}/{y}", {"Accept-Encoding": "identity"})
    assert status == 200
    assert "Content-Encoding" not in headers
    assert body == gzip.decompress(blob)


def test_missing_tile_404_and_health(served):
    port, _ = served
    status, _, body = _get(port, "/health")
    assert (status, body) == (200, b"ok")
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(port, "/tiles/0/1/0")  # out of grid at z0
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError):
        _get(port, "/not-a-route")


def test_tilejson_route(served):
    import json

    port, _ = served
    status, headers, body = _get(port, "/tiles/tiles.json")
    assert status == 200
    assert json.loads(body).get("tilejson")


def test_serve_mosaic_output(spark, tmp_path):
    """Compose the container story: two sources -> mosaic assemble ->
    versatiles container -> served over HTTP, pixels intact."""
    import numpy as np
    import pandas as pd
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    from serve_job import serve

    from versatiles_rs_spark.functions.raster import png_decode, png_encode
    from versatiles_rs_spark.operators.mosaic import mosaic_assemble

    def rgb(r, g, b):
        img = np.zeros((8, 8, 3), dtype=np.uint8)
        img[:, :] = (r, g, b)
        return png_encode(img)

    rows_a = [(0, 0, 0, "png", "none", rgb(10, 0, 0), 0)]
    rows_b = [(0, 0, 0, "png", "none", rgb(0, 10, 0), 0), (1, 0, 0, "png", "none", rgb(0, 0, 10), 0)]
    cols = ["z", "x", "y", "format", "compression", "tile", "n_features"]
    a = spark.createDataFrame(pd.DataFrame(rows_a, columns=cols))
    b = spark.createDataFrame(pd.DataFrame(rows_b, columns=cols))
    pa, pb = str(tmp_path / "a.mbtiles"), str(tmp_path / "b.mbtiles")
    write_container(a, pa)
    write_container(b, pb)
    out = str(tmp_path / "m.versatiles")
    mosaic_assemble(spark, [pa, pb], out)

    srv = serve(out, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        status, _, body = _get(port, "/tiles/0/0/0", {"Accept-Encoding": "identity"})
        assert status == 200
        img = png_decode(body)
        # opaque top source (a) wins at 0/0/0
        assert tuple(img[0, 0, :3]) == (10, 0, 0)
        status, _, body = _get(port, "/tiles/1/0/0", {"Accept-Encoding": "identity"})
        assert png_decode(body)[0, 0, 2] == 10  # b's exclusive tile
    finally:
        srv.shutdown()


@pytest.fixture(scope="module")
def multi_served(spark, tmp_path_factory):
    """Two named sources (versatiles + mbtiles) plus two static sources:
    a directory and the reference's static.tar.br archive."""
    import json
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    from serve_job import serve

    tmp = tmp_path_factory.mktemp("srv_multi")
    tiles = convert_pages_to_tiles(
        _docs_geo(spark, "/root/testdata/sf0.001"), 0, 2, keep_ratio=1.0
    )
    want = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in tiles.collect()}
    p_vt = str(tmp / "a.versatiles")
    p_mb = str(tmp / "b.mbtiles")
    write_container(tiles, p_vt, metadata={"name": "source-a"})
    write_container(tiles, p_mb, metadata={"name": "source-b"})
    site = tmp / "site"
    (site / "sub").mkdir(parents=True)
    (site / "index.html").write_text("<h1>root</h1>")
    (site / "app.js").write_text("console.log(1)")
    (site / "sub" / "index.html").write_text("<h1>sub</h1>")
    srv = serve(
        sources={"osm": p_vt, "hills": p_mb},
        statics=[str(site), "/root/reference/testdata/static.tar.br"],
        port=0,
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1], want
    srv.shutdown()


def test_tiles_index_lists_sources(multi_served):
    import json

    port, _ = multi_served
    status, _, body = _get(port, "/tiles/index.json")
    assert status == 200
    assert json.loads(body) == ["hills", "osm"]


def test_per_source_tiles_and_tilejson(multi_served):
    import json

    port, want = multi_served
    (z, x, y), blob = next(iter(sorted(want.items())))
    for sid in ("osm", "hills"):
        status, _, body = _get(port, f"/tiles/{sid}/{z}/{x}/{y}", {"Accept-Encoding": "gzip"})
        assert status == 200
        assert gzip.decompress(body) == gzip.decompress(blob)
        status, _, tj = _get(port, f"/tiles/{sid}/tiles.json")
        assert status == 200
        meta = json.loads(tj)
        assert meta.get("name") == {"osm": "source-a", "hills": "source-b"}[sid]
    # unknown source -> 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(port, f"/tiles/nosuch/{z}/{x}/{y}")
    assert ei.value.code == 404


def test_static_directory_and_index_resolution(multi_served):
    port, _ = multi_served
    status, headers, body = _get(port, "/")
    assert status == 200 and body == b"<h1>root</h1>"
    assert headers["Content-Type"].startswith("text/html")
    status, headers, body = _get(port, "/app.js")
    assert status == 200 and b"console" in body
    assert headers["Content-Type"] == "application/javascript"
    status, _, body = _get(port, "/sub/")
    assert status == 200 and body == b"<h1>sub</h1>"


def test_static_tar_br_fallback(multi_served):
    """Paths missing from the first static source fall through to the
    reference static.tar.br (decoded with the engine's own RFC 7932
    brotli decoder)."""
    import io
    import tarfile

    from versatiles_rs_spark.functions.compression import decompress

    with open("/root/reference/testdata/static.tar.br", "rb") as f:
        raw = decompress(f.read(), "brotli")
    names = []
    with tarfile.open(fileobj=io.BytesIO(raw)) as tf:
        for m in tf.getmembers():
            if m.isfile():
                names.append(("/" + m.name.lstrip("./"), tf.extractfile(m).read()))
    assert names
    port, _ = multi_served
    path, content = names[0]
    status, _, body = _get(port, path)
    assert status == 200 and body == content


def test_static_path_traversal_refused(multi_served):
    port, _ = multi_served
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(port, "/../../etc/passwd")
    assert ei.value.code == 404


def test_static_source_traversal_guard_direct(tmp_path):
    """urllib normalizes '..' client-side, so exercise the guard directly:
    a crafted path escaping the root must return None."""
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    from serve_job import StaticSource

    root = tmp_path / "www"
    root.mkdir()
    (root / "ok.txt").write_text("fine")
    (tmp_path / "secret.txt").write_text("nope")
    src = StaticSource(str(root))
    assert src.get("/ok.txt") == b"fine"
    assert src.get("/../secret.txt") is None
    assert src.get("/%2e%2e/secret.txt") is None  # literal name, no decode


def test_probe_sample_flag(tmp_path, spark):
    """probe --deep --sample decodes a deterministic window subset
    (tile_sampling.rs analog): same result twice, strictly fewer features
    than the full deep scan, and (0,100] validation."""
    import json
    import os
    import subprocess
    import sys

    from versatiles_rs_spark.operators.convert import convert_pages_to_tiles
    from versatiles_rs_spark.queries import _docs_geo

    tiles = convert_pages_to_tiles(_docs_geo(spark, "/root/testdata/sf0.001"), 0, 4, keep_ratio=1.0)
    src = str(tmp_path / "p.mbtiles")
    write_container(tiles, src)
    env = dict(os.environ, PYTHONPATH="/root/repo")

    def probe(extra):
        out = subprocess.run(
            [sys.executable, "/root/repo/jobs/probe_job.py", "--container", src,
             "--master", "local[4]", *extra],
            capture_output=True, text=True, timeout=300, env=env,
        )
        assert out.returncode == 0, out.stderr[-1500:]
        return json.loads(out.stdout.strip().splitlines()[-1])

    full = probe(["--deep"])
    s1 = probe(["--deep", "--sample", "20"])
    s2 = probe(["--deep", "--sample", "20"])
    n_full = sum(r["n_features"] for r in full["layer_breakdown"])
    n_s = sum(r["n_features"] for r in s1["layer_breakdown"])
    assert s1["layer_breakdown"] == s2["layer_breakdown"]  # deterministic
    assert 0 < n_s < n_full
    bad = subprocess.run(
        [sys.executable, "/root/repo/jobs/probe_job.py", "--container", src,
         "--deep", "--sample", "0"],
        capture_output=True, text=True, timeout=60, env=env,
    )
    assert bad.returncode != 0
