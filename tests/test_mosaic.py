"""Mosaic assembly (operators/mosaic.py)."""

import numpy as np
import pandas as pd

from versatiles_rs_spark.functions.raster import overlay, png_decode, png_encode
from versatiles_rs_spark.operators.mosaic import (
    mosaic_assemble,
    mosaic_assemble_tiles,
    png_is_opaque,
)


def _rgb(r, g, b, size=8):
    img = np.zeros((size, size, 3), dtype=np.uint8)
    img[:, :] = (r, g, b)
    return png_encode(img)


def _rgba(r, g, b, a, size=8):
    img = np.zeros((size, size, 4), dtype=np.uint8)
    img[:, :] = (r, g, b, a)
    return png_encode(img)


def _tiles(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["z", "x", "y", "format", "compression", "tile", "n_features"])
    )


def test_png_opacity_classification():
    assert png_is_opaque(_rgb(1, 2, 3)) is True  # RGB: header-only check
    assert png_is_opaque(_rgba(1, 2, 3, 255)) is True  # full alpha plane
    assert png_is_opaque(_rgba(1, 2, 3, 128)) is False
    assert png_is_opaque(b"not a png") is False


def test_opaque_top_forwards_bytes_untouched(spark):
    """The recompression-avoidance shortcut: an opaque top tile passes
    through byte-identically — the bottom source is never even decoded."""
    top = _rgb(10, 20, 30)
    a = _tiles(spark, [(1, 0, 0, "png", "none", top, 0)])
    b = _tiles(spark, [(1, 0, 0, "png", "none", _rgb(99, 99, 99), 0)])
    out = mosaic_assemble_tiles([a, b]).collect()
    assert len(out) == 1
    assert bytes(out[0]["tile"]) == top


def test_translucent_composites_over_base(spark):
    """A translucent top composites onto the opaque base; sources BELOW
    the first opaque one are ignored."""
    trans = _rgba(255, 0, 0, 128)
    base = _rgb(0, 0, 255)
    junk = _rgb(7, 7, 7)  # beneath the opaque base: must not matter
    a = _tiles(spark, [(2, 1, 1, "png", "none", trans, 0)])
    b = _tiles(spark, [(2, 1, 1, "png", "none", base, 0)])
    c = _tiles(spark, [(2, 1, 1, "png", "none", junk, 0)])
    out1 = {r["tile"] for r in mosaic_assemble_tiles([a, b, c]).collect()}
    out2 = {r["tile"] for r in mosaic_assemble_tiles([a, b]).collect()}
    assert out1 == out2  # junk below the opaque base is invisible
    from versatiles_rs_spark.operators.mosaic import _rgba as to_rgba
    want = overlay(to_rgba(png_decode(base)), png_decode(trans))
    got = png_decode(bytes(next(iter(out1))))
    assert np.array_equal(got, want)


def test_disjoint_coords_pass_through(spark):
    a = _tiles(spark, [(0, 0, 0, "png", "none", _rgb(1, 1, 1), 0)])
    b = _tiles(spark, [(1, 0, 0, "png", "none", _rgb(2, 2, 2), 0)])
    out = mosaic_assemble_tiles([a, b]).collect()
    assert {(r["z"], r["x"], r["y"]) for r in out} == {(0, 0, 0), (1, 0, 0)}


def test_container_level_mosaic(spark, tmp_path):
    """Two .mbtiles inputs -> one .versatiles output, end to end."""
    from versatiles_rs_spark.sources import read_container, write_container

    a = _tiles(spark, [(0, 0, 0, "png", "none", _rgba(200, 0, 0, 120), 0),
                       (1, 0, 0, "png", "none", _rgb(5, 5, 5), 0)])
    b = _tiles(spark, [(0, 0, 0, "png", "none", _rgb(0, 200, 0), 0),
                       (1, 1, 1, "png", "none", _rgb(9, 9, 9), 0)])
    pa, pb = str(tmp_path / "a.mbtiles"), str(tmp_path / "b.mbtiles")
    write_container(a, pa)
    write_container(b, pb)
    out_path = str(tmp_path / "m.versatiles")
    res = mosaic_assemble(spark, [pa, pb], out_path)
    assert res["tiles"] == 3
    back = read_container(spark, out_path)
    assert back.count() == 3
    from versatiles_rs_spark.operators.mosaic import _rgba as to_rgba
    blended = bytes(back.where("z = 0").collect()[0]["tile"])
    want = overlay(to_rgba(png_decode(_rgb(0, 200, 0))), png_decode(_rgba(200, 0, 0, 120)))
    assert np.array_equal(png_decode(blended), want)
