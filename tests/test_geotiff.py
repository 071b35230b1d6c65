"""Pure-python GeoTIFF reader + from_gdal_raster on the reference's own
gradient.tif fixture (deflate strips, horizontal predictor, EPSG:4326)."""

from __future__ import annotations

import numpy as np
import pytest

from versatiles_rs_spark.sources.geotiff import from_gdal_raster, read_geotiff

TIF = "/root/reference/testdata/gradient.tif"


def test_read_gradient_tif():
    img, geo = read_geotiff(TIF)
    assert img.shape == (256, 256, 3)
    assert geo["epsg"] == 4326
    assert geo["west"] == -180.0 and geo["north"] == 90.0
    assert abs(geo["sx"] - 1.40625) < 1e-12 and abs(geo["sy"] - 0.703125) < 1e-12
    # the fixture is a gradient: R rises with x; predictor must be undone
    assert img[0, 0, 0] == 0 and img[0, 255, 0] == 255
    assert (np.diff(img[0, :, 0].astype(int)) == 1).all()


def test_from_gdal_raster_tiles(spark):
    from versatiles_rs_spark.functions.raster import png_decode

    tiles = from_gdal_raster(spark, TIF, 0, 2)
    rows = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in tiles.collect()}
    # world-covering raster -> full pyramid
    assert (0, 0, 0) in rows
    assert sum(1 for k in rows if k[0] == 2) == 16
    z0 = png_decode(rows[(0, 0, 0)])
    assert z0.shape == (256, 256, 4)
    mid = 128
    # red channel rises left->right like the source gradient
    assert z0[mid, 10, 0] < z0[mid, 128, 0] < z0[mid, 250, 0]
    assert (z0[:, :, 3] == 255).all()  # world raster covers every pixel


def test_from_gdal_vpl(spark):
    from versatiles_rs_spark.plans.vpl import build_pipeline

    out = build_pipeline(spark, f'from_gdal_raster filename="{TIF}" level_min=0 level_max=1 | filter level_max=1')
    assert out.count() == 5


def test_unsupported_tiff_rejected(tmp_path):
    p = tmp_path / "x.tif"
    p.write_bytes(b"II\x2b\x00" + b"\x00" * 16)  # BigTIFF magic 43
    with pytest.raises(ValueError):
        read_geotiff(str(p))
