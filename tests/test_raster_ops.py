"""Raster operators: levels/flatten/format/mask/split/overscale/dem_quantize."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.functions.compression import decompress
from versatiles_rs_spark.functions.raster import dem_decode, dem_encode, png_decode, png_encode
from versatiles_rs_spark.operators.raster_ops import (
    dem_quantize,
    raster_flatten,
    raster_format,
    raster_levels,
    raster_mask,
    raster_overscale,
    raster_tile_split,
)
from versatiles_rs_spark.spatial.pip import Polygon


def _tiles_df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["z", "x", "y", "format", "compression", "tile", "n_features"])
    )


@pytest.fixture()
def gray_tiles(spark):
    img = np.full((8, 8, 4), 128, np.uint8)
    return _tiles_df(spark, [(2, x, y, "png", "none", png_encode(img), 0) for x in range(4) for y in range(4)])


def test_raster_levels(spark, gray_tiles):
    out = raster_levels(gray_tiles, brightness=0.2).collect()
    img = png_decode(bytes(out[0]["tile"]))
    assert img[0, 0, 0] > 128


def test_raster_flatten(spark):
    img = np.zeros((4, 4, 4), np.uint8)
    img[:, :, 3] = 0  # fully transparent
    df = _tiles_df(spark, [(0, 0, 0, "png", "none", png_encode(img), 0)])
    out = raster_flatten(df, bg=(200, 100, 50)).collect()
    flat = png_decode(bytes(out[0]["tile"]))
    assert flat.shape[2] == 3
    assert tuple(flat[0, 0]) == (200, 100, 50)


def test_raster_format_schedule(spark, gray_tiles):
    out = raster_format(gray_tiles, {2: "gzip"}, default="none")
    rows = out.collect()
    assert all(r["compression"] == "gzip" for r in rows)
    img = png_decode(decompress(bytes(rows[0]["tile"]), "gzip"))
    assert img[0, 0, 0] == 128


def test_raster_mask_classify_paths(spark, gray_tiles):
    # polygon covering the east half of the world at z2: tiles x>=2 inside
    poly = Polygon(1, "east", "box", [[(0.0, -85.0), (180.0, -85.0), (180.0, 85.0), (0.0, 85.0)]])
    out = raster_mask(gray_tiles, poly).toPandas()
    # western tiles dropped entirely
    assert (out["x"] >= 1).all()
    inner = out[out["x"] >= 3]
    assert len(inner) > 0
    blob_by_coord = {(r["x"], r["y"]): bytes(r["tile"]) for _, r in out.iterrows()}
    # fully-inside tile passes through: alpha stays 128 everywhere
    img = png_decode(blob_by_coord[(3, 1)])
    assert (img[:, :, 3] == 128).all()
    # partial tile (x=2 straddles lon 0 edge? x=2 west edge IS 0) — x=1 tiles
    # are partial-or-dropped; check a partial one has mixed alpha
    partials = [k for k in blob_by_coord if k[0] in (1, 2)]
    if partials:
        img2 = png_decode(blob_by_coord[partials[0]])
        assert img2[:, :, 3].min() == 0 or img2[:, :, 3].max() > 0


def test_raster_tile_split_and_overscale(spark):
    img = np.zeros((8, 8, 4), np.uint8)
    img[:4, :4] = 10  # top-left quadrant marked
    img[:, :, 3] = 255
    df = _tiles_df(spark, [(1, 0, 0, "png", "none", png_encode(img), 0)])
    kids = raster_tile_split(df).collect()
    assert len(kids) == 4
    by = {(r["x"], r["y"]): png_decode(bytes(r["tile"])) for r in kids}
    assert (by[(0, 0)][:, :, 0] == 10).all()  # tl child all marked
    assert (by[(1, 1)][:, :, 0] == 0).all()
    two = raster_overscale(df, 2)
    assert two.count() == 16
    assert two.first()["z"] == 3


def test_dem_quantize_snaps(spark):
    elev = np.array([[100.3, 101.7], [102.2, 103.9]])
    img = dem_encode(elev, "terrarium")
    df = _tiles_df(spark, [(0, 0, 0, "png", "none", png_encode(img), 0)])
    out = dem_quantize(df, elevation_error=2.0).collect()
    back = dem_decode(png_decode(bytes(out[0]["tile"])), "terrarium")
    assert np.allclose(back % 2.0, 0.0, atol=1 / 256)


def test_raster_mask_overlapping_polygons_or_semantics(spark):
    """Overlapping mask features: a pixel inside BOTH polygons stays
    unmasked (per-polygon containment OR-ed, mask_geometry.rs:185-219) —
    the even-odd rule over concatenated rings would wrongly toggle the
    overlap to 'outside'."""
    img = np.full((8, 8, 4), 200, np.uint8)
    df = _tiles_df(spark, [(3, x, y, "png", "none", png_encode(img), 0)
                           for x in range(8) for y in range(8)])
    # two big overlapping boxes; their overlap covers lon 0..60, lat -40..40
    p1 = Polygon(1, "a", "box", [[(-60.0, -40.0), (60.0, -40.0), (60.0, 40.0), (-60.0, 40.0)]])
    p2 = Polygon(2, "b", "box", [[(0.0, -40.0), (120.0, -40.0), (120.0, 40.0), (0.0, 40.0)]])
    out = raster_mask(df, [p1, p2]).toPandas()
    blob = {(r["x"], r["y"]): bytes(r["tile"]) for _, r in out.iterrows()}
    # tile (4,3) at z3 spans lon 0..45, lat 0..~40.98 — (almost) entirely in
    # the overlap region; its interior pixels must keep full source alpha
    tile = png_decode(blob[(4, 3)])
    h, w = tile.shape[:2]
    assert (tile[h // 2 :, : w // 2, 3] == 200).all(), (
        "overlap region was masked out — even-odd over concatenated rings"
    )
    # sanity: a tile far outside both polygons is dropped
    assert (7, 0) not in blob


def test_dem_scale_down_rgb_round_half_up():
    from versatiles_rs_spark.functions.raster import dem_scale_down

    # 2x2 block with raw values summing to 4k+2 must round UP (reference
    # (sum + 2) / 4 integer division, dem_overview.rs:53).
    img = np.zeros((2, 2, 3), np.uint8)
    # raws: 1, 1, 0, 0 -> sum 2 -> (2+2)//4 = 1
    img[0, 0] = (0, 0, 1)
    img[0, 1] = (0, 0, 1)
    out = dem_scale_down(img)
    assert out.shape == (1, 1, 3)
    assert tuple(out[0, 0]) == (0, 0, 1)


def test_dem_scale_down_rgba_skips_transparent():
    from versatiles_rs_spark.functions.raster import dem_scale_down

    img = np.zeros((2, 2, 4), np.uint8)
    img[0, 0] = (0, 0, 100, 255)  # only visible pixel
    img[0, 1] = (0, 0, 7, 0)      # transparent: excluded from raw average
    out = dem_scale_down(img)
    assert tuple(out[0, 0][:3]) == (0, 0, 100)
    assert out[0, 0][3] == (255 + 2) // 4
    # fully transparent block -> (0,0,0,0)
    img2 = np.zeros((2, 2, 4), np.uint8)
    img2[..., 2] = 9
    assert tuple(dem_scale_down(img2)[0, 0]) == (0, 0, 0, 0)


def test_dem_tile_resize_split_crops_and_level0(spark):
    from versatiles_rs_spark.functions.raster import dem_scale_down
    from versatiles_rs_spark.operators.raster_ops import dem_tile_resize

    # 512px DEM tile with a distinct value per quadrant.
    img = np.zeros((512, 512, 3), np.uint8)
    for dy in (0, 1):
        for dx in (0, 1):
            img[dy * 256 : (dy + 1) * 256, dx * 256 : (dx + 1) * 256, 2] = 10 * (dy * 2 + dx + 1)
    df = _tiles_df(spark, [(0, 0, 0, "png", "none", png_encode(img), 0)])
    rows = {(r["z"], r["x"], r["y"]): r for r in dem_tile_resize(df, 256).collect()}
    # 4 crops at z1 + scaled-down level 0
    assert set(rows) == {(0, 0, 0), (1, 0, 0), (1, 1, 0), (1, 0, 1), (1, 1, 1)}
    for (dz, dx, dy), want in [((1, 0, 0), 10), ((1, 1, 0), 20), ((1, 0, 1), 30), ((1, 1, 1), 40)]:
        sub = png_decode(bytes(rows[(dz, dx, dy)]["tile"]))
        assert sub.shape[:2] == (256, 256)
        assert int(sub[0, 0, 2]) == want and int(sub[-1, -1, 2]) == want
    lvl0 = png_decode(bytes(rows[(0, 0, 0)]["tile"]))
    np.testing.assert_array_equal(lvl0, dem_scale_down(img))


def test_dem_tile_resize_merge_pastes_and_transparent_gap(spark):
    from versatiles_rs_spark.operators.raster_ops import dem_tile_resize

    def tile(v):
        im = np.zeros((256, 256, 3), np.uint8)
        im[..., 2] = v
        return png_encode(im)

    # 3 of 4 children present; z=0 row must be ignored (no parent scheme).
    df = _tiles_df(
        spark,
        [
            (1, 0, 0, "png", "none", tile(10), 0),
            (1, 1, 0, "png", "none", tile(20), 0),
            (1, 1, 1, "png", "none", tile(40), 0),
            (0, 0, 0, "png", "none", tile(99), 0),
        ],
    )
    rows = dem_tile_resize(df, 512).collect()
    assert [(r["z"], r["x"], r["y"]) for r in rows] == [(0, 0, 0)]
    canvas = png_decode(bytes(rows[0]["tile"]))
    assert canvas.shape == (512, 512, 4)
    assert tuple(canvas[0, 0]) == (0, 0, 10, 255)
    assert tuple(canvas[0, 511]) == (0, 0, 20, 255)
    assert tuple(canvas[511, 511]) == (0, 0, 40, 255)
    assert tuple(canvas[511, 0]) == (0, 0, 0, 0)  # missing child stays transparent


def test_dem_tile_resize_vpl_registered(spark):
    from versatiles_rs_spark.plans.vpl import TRANSFORM_OPS

    assert "dem_tile_resize" in TRANSFORM_OPS
