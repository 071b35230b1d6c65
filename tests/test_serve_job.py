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
