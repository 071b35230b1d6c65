"""Raster <-> vector conversion: rasterize MVT, vectorize masks, roundtrips."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.functions.compression import decompress
from versatiles_rs_spark.functions.mvt import (
    GEOM_POLYGON,
    MvtFeature,
    decode_tile,
    encode_tile,
)
from versatiles_rs_spark.functions.raster import png_decode, png_encode
from versatiles_rs_spark.operators.raster_vector import (
    rasterize_vector_tiles,
    vectorize_raster_tiles,
)

SIZE = 64


def _tile_df(spark, blob, fmt="mvt"):
    return spark.createDataFrame(
        pd.DataFrame(
            [(3, 1, 2, fmt, "none", blob, 1)],
            columns=["z", "x", "y", "format", "compression", "tile", "n_features"],
        )
    )


def test_rasterize_polygon_fill(spark):
    # square covering grid [1024, 3072)^2 = pixel [16, 48) at size 64
    ring = [(1024, 1024), (3072, 1024), (3072, 3072), (1024, 3072), (1024, 1024)]
    blob = encode_tile({"m": [MvtFeature(GEOM_POLYGON, [ring], {}, fid=1)]})
    out = rasterize_vector_tiles(_tile_df(spark, blob), size=SIZE).collect()
    img = png_decode(bytes(out[0]["tile"]))
    assert img[32, 32, 3] == 255  # center filled
    assert img[8, 8, 3] == 0  # outside empty
    filled = (img[:, :, 3] == 255).sum()
    assert abs(filled - 32 * 32) <= 4 * 32  # ~quarter of the tile


def test_rasterize_point_and_line(spark):
    from versatiles_rs_spark.functions.mvt import GEOM_LINESTRING, GEOM_POINT

    feats = [
        MvtFeature(GEOM_POINT, [[(2048, 2048)]], {}, fid=1),
        MvtFeature(GEOM_LINESTRING, [[(0, 0), (4095, 4095)]], {}, fid=2),
    ]
    blob = encode_tile({"m": feats})
    out = rasterize_vector_tiles(_tile_df(spark, blob), size=SIZE).collect()
    img = png_decode(bytes(out[0]["tile"]))
    assert img[32, 32, 3] == 255  # point splat
    assert img[0, 0, 3] == 255 and img[SIZE - 1, SIZE - 1, 3] == 255  # line ends
    assert img[10, 10, 3] == 255  # on the diagonal


def test_vectorize_mask_and_exact_roundtrip(spark):
    # pixel-aligned mask: rectangle + disjoint block + a hole
    mask = np.zeros((SIZE, SIZE), bool)
    mask[8:24, 8:40] = True
    mask[12:16, 16:24] = False  # hole
    mask[40:48, 50:60] = True  # disjoint
    img = np.zeros((SIZE, SIZE, 4), np.uint8)
    img[mask] = [255, 0, 0, 255]
    vec = vectorize_raster_tiles(_tile_df(spark, png_encode(img), "png")).collect()
    assert len(vec) == 1
    layers = decode_tile(bytes(vec[0]["tile"]))
    rings = layers["mask"]["features"][0].rings
    assert len(rings) == 3  # outer, hole, disjoint outer
    # rasterize the vectorization back at the same size -> exact mask
    back = rasterize_vector_tiles(_tile_df(spark, bytes(vec[0]["tile"])), size=SIZE).collect()
    img2 = png_decode(bytes(back[0]["tile"]))
    np.testing.assert_array_equal(img2[:, :, 3] == 255, mask)


def test_vectorize_empty_dropped(spark):
    img = np.zeros((SIZE, SIZE, 4), np.uint8)
    out = vectorize_raster_tiles(_tile_df(spark, png_encode(img), "png"))
    assert out.count() == 0


def test_pyramid_rasterize_vectorize_pipeline(spark, sf_dir):
    """Full-pyramid pass: docs -> MVT pyramid -> rasterize -> vectorize ->
    valid MVT with non-empty masks everywhere points existed."""
    from versatiles_rs_spark.operators.convert import assign_tiles, render_point_tiles
    from versatiles_rs_spark.operators.probe import validate_tiles
    from versatiles_rs_spark.queries import _docs_geo

    geo = _docs_geo(spark, sf_dir).select("doc_id", "lon", "lat", "lang")
    mvt = render_point_tiles(assign_tiles(geo, 0, 3))
    png = rasterize_vector_tiles(mvt, size=64)
    assert png.count() == mvt.count()
    vec = vectorize_raster_tiles(png)
    assert vec.count() == mvt.count()  # every tile had at least one point
    assert validate_tiles(vec).filter("n_issues > 0").count() == 0
