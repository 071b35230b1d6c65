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


def test_dem_geotiff_roundtrip_and_tiles(spark, tmp_path):
    """int16 elevation GeoTIFF -> from_gdal_dem terrarium pyramid; decoded
    DEM tile elevations match the source within terrarium quantization."""
    import numpy as np

    from versatiles_rs_spark.functions.raster import dem_decode, png_decode
    from versatiles_rs_spark.sources.geotiff import (
        from_gdal_dem,
        read_geotiff,
        write_geotiff_gray16,
    )

    yy, xx = np.mgrid[0:180, 0:360]
    elev = (100 + 10 * np.sin(xx / 20.0) * 50 + yy).astype(np.int16)
    path = str(tmp_path / "dem.tif")
    write_geotiff_gray16(path, elev, west=-180.0, north=90.0, sx=1.0, sy=1.0)
    img, geo = read_geotiff(path)
    assert img.shape == (180, 360, 1) and img.dtype == np.int16
    assert (img[:, :, 0] == elev).all()
    assert geo["epsg"] == 4326 and geo["west"] == -180.0

    tiles = from_gdal_dem(spark, path, 0, 1)
    rows = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in tiles.collect()}
    assert (0, 0, 0) in rows and len([k for k in rows if k[0] == 1]) == 4
    dec = dem_decode(png_decode(rows[(0, 0, 0)]), "terrarium")
    # compute the exact source pixel the renderer samples for a few tile
    # pixels (mercator row spacing, nearest-neighbor)
    for ti, tj in ((128, 128), (40, 200), (200, 17)):
        lon = -180.0 + (tj + 0.5) / 256.0 * 360.0
        lat = (np.arctan(np.exp(np.pi * (1 - 2 * (ti + 0.5) / 256.0))) / np.pi - 0.25) * 360.0
        col = int(np.floor(lon - (-180.0)))
        row = int(np.floor(90.0 - lat))
        want = float(elev[row, col])
        assert abs(float(dec[ti, tj]) - want) < 2.0, (ti, tj)


# ---------------------------------------------------------------------------
# round-3 coverage: tiled layout + LZW (the two most common wild encodings)
# ---------------------------------------------------------------------------

def _rng_img(h=37, w=53):
    rng = np.random.default_rng(11)
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def test_lzw_decoder_against_hand_packed_vector():
    """Decode a bitstream packed BY HAND (independent of the library's
    encoder): Clear(256), 'a'(97), 'b'(98), EOI(257), 9-bit MSB-first."""
    from versatiles_rs_spark.sources.geotiff import _tiff_lzw_decode

    bits = ""
    for code in (256, 97, 98, 257):
        bits += format(code, "09b")
    bits += "0" * ((8 - len(bits) % 8) % 8)
    data = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    assert _tiff_lzw_decode(data) == b"ab"


def test_lzw_roundtrip_with_early_change_boundary():
    """A stream long enough to push the table past 511/1023 entries
    exercises both early-change width bumps."""
    from versatiles_rs_spark.sources.geotiff import _tiff_lzw_decode, _tiff_lzw_encode

    rng = np.random.default_rng(3)
    payloads = [
        b"ababababab" * 50,
        bytes(rng.integers(0, 256, size=5000, dtype=np.uint8).tolist()),
        bytes(rng.integers(0, 4, size=30000, dtype=np.uint8).tolist()),  # forces table reset
        b"",
        b"\x00",
    ]
    for p in payloads:
        assert _tiff_lzw_decode(_tiff_lzw_encode(p)) == p


def test_lzw_first_code_after_clear_midstream():
    """Clear mid-stream resets the width to 9 and clears prev (the KwKwK
    state machine must not chain across a Clear)."""
    from versatiles_rs_spark.sources.geotiff import _tiff_lzw_decode, _tiff_lzw_encode

    # the encoder emits a Clear at table code 4094; craft data to cross it
    data = bytes(range(256)) * 20
    assert _tiff_lzw_decode(_tiff_lzw_encode(data)) == data


@pytest.mark.parametrize("compression", ["none", "deflate", "lzw"])
@pytest.mark.parametrize("tiled", [False, True])
@pytest.mark.parametrize("predictor", [1, 2])
def test_layout_codec_matrix_pixel_parity(tmp_path, compression, tiled, predictor):
    """Every layout/codec combination must read back pixel-identical to the
    source array (edge tiles are cropped, predictor rows reconstructed)."""
    from versatiles_rs_spark.sources.geotiff import read_geotiff, write_geotiff_gray8

    img = _rng_img()
    p = str(tmp_path / f"t_{compression}_{tiled}_{predictor}.tif")
    write_geotiff_gray8(
        p, img, west=8.0, north=50.0, sx=0.01, sy=0.01,
        compression=compression, tiled=tiled, tile_size=16, predictor=predictor,
    )
    got, geo = read_geotiff(p)
    np.testing.assert_array_equal(got[:, :, 0], img)
    assert geo["epsg"] == 4326
    assert (geo["west"], geo["north"]) == (8.0, 50.0)


def test_tiled_lzw_matches_stripped_deflate_reader_output(tmp_path):
    """VERDICT r2 #8 done-criterion: a tiled/LZW fixture reads
    pixel-for-pixel identical to the stripped-deflate reader's output."""
    from versatiles_rs_spark.sources.geotiff import read_geotiff, write_geotiff_gray8

    img = _rng_img(64, 48)
    a = str(tmp_path / "strip_deflate.tif")
    b = str(tmp_path / "tiled_lzw.tif")
    write_geotiff_gray8(a, img, 8.0, 50.0, 0.01, 0.01, compression="deflate", tiled=False)
    write_geotiff_gray8(b, img, 8.0, 50.0, 0.01, 0.01, compression="lzw", tiled=True, tile_size=16)
    ia, ga = read_geotiff(a)
    ib, gb = read_geotiff(b)
    np.testing.assert_array_equal(ia, ib)
    assert ga == gb


# ---------------------------------------------------------------------------
# round-4 coverage: distributed windowed ingest + GDAL-parity options
# ---------------------------------------------------------------------------


def test_windowed_mode_matches_broadcast_byte_identical(spark):
    """VERDICT r3 #1 done-criterion: windowed ranged-read rendering is
    pixel- (and byte-) identical to the broadcast fast path on the
    reference fixture."""
    a = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
         for r in from_gdal_raster(spark, TIF, 0, 2, mode="broadcast").collect()}
    b = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
         for r in from_gdal_raster(spark, TIF, 0, 2, mode="windowed").collect()}
    assert a.keys() == b.keys() and len(a) == 21
    assert all(a[k] == b[k] for k in a)


def test_windowed_never_materializes_pixels_on_driver(spark, tmp_path, monkeypatch):
    """In windowed mode the driver parses ONLY the IFD: whole-image reads
    are poisoned and the pyramid must still render, on a tiled raster
    larger than the (tiny, forced) broadcast threshold."""
    import versatiles_rs_spark.sources.geotiff as gt

    img = np.tile(np.arange(256, dtype=np.uint8), (128, 1))
    p = str(tmp_path / "big.tif")
    gt.write_geotiff_gray8(p, img, west=-180.0, north=90.0, sx=360 / 256, sy=180 / 128,
                           compression="lzw", tiled=True, tile_size=16)

    def bomb(path):
        raise AssertionError("driver materialized the raster")

    monkeypatch.setattr(gt, "read_geotiff", bomb)
    tiles = gt.from_gdal_raster(spark, p, 0, 2, broadcast_threshold=0)
    rows = tiles.collect()
    assert len(rows) == 21  # full world pyramid z0-2
    from versatiles_rs_spark.functions.raster import png_decode

    z0 = png_decode(bytes(next(r for r in rows if r["z"] == 0)["tile"]))
    # gradient survives: gray rises left->right
    assert z0[64, 10, 0] < z0[64, 128, 0] < z0[64, 250, 0]


def test_block_reader_gathers_only_touched_blocks(tmp_path):
    """The gather path decompresses only blocks the sample set intersects
    (a corner window on a 8x8-block raster touches exactly one block)."""
    from versatiles_rs_spark.sources.geotiff import (
        GeoTiffBlockReader,
        read_geotiff_meta,
        write_geotiff_gray8,
    )

    img = _rng_img(128, 128)
    p = str(tmp_path / "blocks.tif")
    write_geotiff_gray8(p, img, 0.0, 50.0, 0.01, 0.01, compression="deflate",
                        tiled=True, tile_size=16)
    meta = read_geotiff_meta(p)
    assert meta["tiled"] and meta["blocks_across"] == 8
    rd = GeoTiffBlockReader(meta)
    out = rd.gather(np.arange(4), np.arange(4))
    np.testing.assert_array_equal(out[:, :, 0], img[:4, :4])
    assert len(rd._cache) == 1  # exactly one block decompressed
    # duplicate + scattered indices work (decimating low-zoom sampling)
    rows = np.array([0, 0, 100, 127])
    cols = np.array([5, 5, 64, 120])
    out2 = rd.gather(rows, cols)
    np.testing.assert_array_equal(out2[:, :, 0], img[np.ix_(rows, cols)])
    rd.close()


def test_bilinear_resampling(spark, tmp_path):
    """Bilinear: constant raster matches nearest byte-for-byte; a hard
    step edge gains intermediate values nearest can't produce."""
    from versatiles_rs_spark.functions.raster import png_decode
    from versatiles_rs_spark.sources.geotiff import write_geotiff_gray8

    # constant raster -> identical output under either kernel
    const = np.full((64, 128), 200, np.uint8)
    pc = str(tmp_path / "const.tif")
    write_geotiff_gray8(pc, const, -180.0, 90.0, 360 / 128, 180 / 64)
    near = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
            for r in from_gdal_raster(spark, pc, 0, 0).collect()}
    bil = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
           for r in from_gdal_raster(spark, pc, 0, 0, resampling="bilinear").collect()}
    assert near == bil

    # step edge: left half 0, right half 250
    step = np.zeros((64, 128), np.uint8)
    step[:, 64:] = 250
    ps = str(tmp_path / "step.tif")
    write_geotiff_gray8(ps, step, -180.0, 90.0, 360 / 128, 180 / 64)
    n0 = png_decode({(r["z"], r["x"], r["y"]): bytes(r["tile"])
                     for r in from_gdal_raster(spark, ps, 0, 0).collect()}[(0, 0, 0)])
    b0 = png_decode({(r["z"], r["x"], r["y"]): bytes(r["tile"])
                     for r in from_gdal_raster(spark, ps, 0, 0, resampling="bilinear").collect()}[(0, 0, 0)])
    assert set(np.unique(n0[:, :, 0])) <= {0, 250}
    mids = np.unique(b0[128, :, 0])
    assert any((m > 20) and (m < 230) for m in mids)  # interpolated ramp


def test_nodata_to_alpha(spark, tmp_path):
    """Pixels equal to the nodata value render transparent."""
    from versatiles_rs_spark.functions.raster import png_decode
    from versatiles_rs_spark.sources.geotiff import write_geotiff_gray8

    img = np.full((64, 128), 99, np.uint8)
    img[:, :64] = 7  # nodata half
    p = str(tmp_path / "nd.tif")
    write_geotiff_gray8(p, img, -180.0, 90.0, 360 / 128, 180 / 64)
    t = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
         for r in from_gdal_raster(spark, p, 0, 0, nodata=7).collect()}
    z0 = png_decode(t[(0, 0, 0)])
    assert (z0[100, 10:100, 3] == 0).all()      # west half transparent
    assert (z0[100, 150:250, 3] == 255).all()   # east half opaque
    assert (z0[100, 150:250, 0] == 99).all()


def test_cutline_masks_outside_polygon(spark, tmp_path):
    """A cutline polygon (western hemisphere box) masks everything east
    of the antimeridian-to-0 box to alpha 0 (reference cutline.rs)."""
    from versatiles_rs_spark.functions.raster import png_decode
    from versatiles_rs_spark.sources.geotiff import write_geotiff_gray8

    img = np.full((64, 128), 123, np.uint8)
    p = str(tmp_path / "cut.tif")
    write_geotiff_gray8(p, img, -180.0, 90.0, 360 / 128, 180 / 64)
    box = [[(-180.0, -85.0), (0.0, -85.0), (0.0, 85.0), (-180.0, 85.0)]]
    t = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
         for r in from_gdal_raster(spark, p, 0, 0, cutline=box).collect()}
    z0 = png_decode(t[(0, 0, 0)])
    assert (z0[128, 5:120, 3] == 255).all()   # west of 0 deg: kept
    assert (z0[128, 135:250, 3] == 0).all()   # east of 0 deg: masked


def test_band_selection_and_validation(spark):
    from versatiles_rs_spark.functions.raster import png_decode

    # gradient.tif band 2 (green) replicated as gray via bands=[2]
    t = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
         for r in from_gdal_raster(spark, TIF, 0, 0, bands=[2]).collect()}
    z0 = png_decode(t[(0, 0, 0)])
    full = png_decode({(r["z"], r["x"], r["y"]): bytes(r["tile"])
                       for r in from_gdal_raster(spark, TIF, 0, 0).collect()}[(0, 0, 0)])
    np.testing.assert_array_equal(z0[:, :, 0], full[:, :, 1])  # gray == green
    with pytest.raises(ValueError, match="band 4 out of range"):
        from_gdal_raster(spark, TIF, 0, 0, bands=[4])


def test_dem_windowed_matches_broadcast(spark, tmp_path):
    from versatiles_rs_spark.sources.geotiff import from_gdal_dem, write_geotiff_gray16

    yy, xx = np.mgrid[0:180, 0:360]
    elev = (100 + yy + xx % 37).astype(np.int16)
    p = str(tmp_path / "demw.tif")
    write_geotiff_gray16(p, elev, west=-180.0, north=90.0, sx=1.0, sy=1.0)
    a = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
         for r in from_gdal_dem(spark, p, 0, 1, mode="broadcast").collect()}
    b = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
         for r in from_gdal_dem(spark, p, 0, 1, mode="windowed").collect()}
    assert a == b and len(a) == 5


def test_vpl_gdal_options_wired(spark, tmp_path):
    """resampling/nodata/mode/bands all reach the operator through VPL."""
    import json

    from versatiles_rs_spark.plans.vpl import build_pipeline
    from versatiles_rs_spark.sources.geotiff import write_geotiff_gray8

    img = np.full((64, 128), 50, np.uint8)
    p = str(tmp_path / "v.tif")
    write_geotiff_gray8(p, img, -180.0, 90.0, 360 / 128, 180 / 64)
    cut = tmp_path / "cut.geojson"
    cut.write_text(json.dumps({
        "type": "FeatureCollection",
        "features": [{
            "type": "Feature", "properties": {"name": "w", "kind": "k"},
            "geometry": {"type": "Polygon", "coordinates":
                         [[[-180, -85], [0, -85], [0, 85], [-180, 85], [-180, -85]]]},
        }],
    }))
    out = build_pipeline(
        spark,
        f'from_gdal_raster filename="{p}" level_min=0 level_max=0 '
        f'resampling=bilinear mode=windowed nodata="7" cutline="{cut}"',
    )
    assert out.count() == 1


def test_overview_split_zoom_math(tmp_path):
    from versatiles_rs_spark.sources.geotiff import (
        _overview_split_zoom,
        read_geotiff_meta,
        write_geotiff_gray8,
    )

    # 256-px world raster: sx = 360/256 -> span = sx*256*2 = 720 deg ->
    # z where tiles stop decimating = 0
    img = np.zeros((128, 256), np.uint8)
    p = str(tmp_path / "w.tif")
    write_geotiff_gray8(p, img, -180.0, 90.0, 360 / 256, 180 / 128)
    meta = read_geotiff_meta(p)
    assert _overview_split_zoom(meta, 256, 0, 8) == 0
    # 4096-px world raster: sx = 360/4096 -> non-decimating from z3 up
    meta2 = dict(meta, sx=360 / 4096)
    assert _overview_split_zoom(meta2, 256, 0, 8) == 3
    # clamped into [min_zoom, max_zoom]
    assert _overview_split_zoom(meta2, 256, 5, 8) == 5
    assert _overview_split_zoom(meta2, 256, 0, 2) == 2


def test_overview_mode_constant_raster_byte_identical(spark, tmp_path):
    """On a constant raster, 2x2 averaging == direct rendering, so the
    overview-composed pyramid is byte-identical to the direct one."""
    from versatiles_rs_spark.sources.geotiff import write_geotiff_gray8

    img = np.full((512, 1024), 160, np.uint8)
    p = str(tmp_path / "const_big.tif")
    write_geotiff_gray8(p, img, -180.0, 90.0, 360 / 1024, 180 / 512,
                        compression="deflate", tiled=True, tile_size=64)
    direct = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
              for r in from_gdal_raster(spark, p, 0, 3).collect()}
    ov = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
          for r in from_gdal_raster(spark, p, 0, 3, low_zoom="overview").collect()}
    assert direct.keys() == ov.keys()
    assert direct == ov


def test_overview_mode_gradient_close_to_direct(spark, tmp_path):
    """On a gradient, overview halving approximates the direct render
    (mean abs diff small); zooms >= split are bit-identical because they
    ARE direct renders."""
    from versatiles_rs_spark.functions.raster import png_decode
    from versatiles_rs_spark.sources.geotiff import (
        _overview_split_zoom,
        read_geotiff_meta,
        write_geotiff_gray8,
    )

    img = np.tile(np.linspace(0, 255, 1024).astype(np.uint8), (512, 1))
    p = str(tmp_path / "grad_big.tif")
    write_geotiff_gray8(p, img, -180.0, 90.0, 360 / 1024, 180 / 512,
                        compression="deflate", tiled=True, tile_size=64)
    meta = read_geotiff_meta(p)
    split = _overview_split_zoom(meta, 256, 0, 3)
    assert 0 < split <= 3
    direct = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
              for r in from_gdal_raster(spark, p, 0, 3).collect()}
    ov = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
          for r in from_gdal_raster(spark, p, 0, 3, low_zoom="overview").collect()}
    assert direct.keys() == ov.keys()
    for k in direct:
        if k[0] >= split:
            assert ov[k] == direct[k], k
    a = png_decode(ov[(0, 0, 0)]).astype(np.int64)
    b = png_decode(direct[(0, 0, 0)]).astype(np.int64)
    np.testing.assert_array_equal(a[:, :, 3], b[:, :, 3])  # same coverage
    covered = a[:, :, 3] == 255
    diff = np.abs(a[:, :, 0] - b[:, :, 0])[covered]
    assert diff.mean() < 3.0 and diff.max() <= 16


def test_dem_overview_mode_full_pyramid(spark, tmp_path):
    from versatiles_rs_spark.functions.raster import dem_decode, png_decode
    from versatiles_rs_spark.sources.geotiff import from_gdal_dem, write_geotiff_gray16

    yy, xx = np.mgrid[0:512, 0:1024]
    elev = (200 + (xx // 8)).astype(np.int16)
    p = str(tmp_path / "dem_big.tif")
    write_geotiff_gray16(p, elev, west=-180.0, north=90.0, sx=360 / 1024, sy=180 / 512)
    ov = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
          for r in from_gdal_dem(spark, p, 0, 3, low_zoom="overview").collect()}
    assert (0, 0, 0) in ov and len([k for k in ov if k[0] == 3]) == 64
    dec = dem_decode(png_decode(ov[(0, 0, 0)]), "terrarium")
    # equator band of the composed z0 tile still reads plausible elevation
    assert 190 < float(dec[128, 128]) < 330


def test_epsg3857_raster_matches_4326_twin(spark, tmp_path):
    """The same logical image expressed as an EPSG:3857 raster (meters,
    web-mercator-aligned) and as an EPSG:4326 raster renders the same
    pyramid. The 3857 fixture is pixel-aligned with the z3 tile grid, so
    its own sampling is exact; the 4326 twin resamples the same gradient.
    Compare decoded pixels, not bytes (the twins' grids differ)."""
    import math

    from versatiles_rs_spark.functions.raster import png_decode
    from versatiles_rs_spark.sources.geotiff import write_geotiff_gray8

    R = 6378137.0
    world = 2 * math.pi * R
    n = 512  # world raster, 512x512 px
    # gradient in mercator-x: value = column * 255 / (n-1) -> identical in
    # both CRS because columns are uniform in mercator x for BOTH fixtures
    img = np.tile(np.round(np.arange(n) * 255 / (n - 1)).astype(np.uint8), (n, 1))
    p_merc = str(tmp_path / "m.tif")
    write_geotiff_gray8(
        p_merc, img, west=-world / 2, north=world / 2, sx=world / n, sy=world / n,
        epsg=3857, compression="deflate", tiled=True, tile_size=64,
    )
    meta_check = __import__("versatiles_rs_spark.sources.geotiff", fromlist=["read_geotiff_meta"]).read_geotiff_meta(p_merc)
    assert meta_check["epsg"] == 3857

    t_merc = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
              for r in from_gdal_raster(spark, p_merc, 0, 2).collect()}
    # full world pyramid (3857 covers lat ±85.05)
    assert len(t_merc) == 21
    z0 = png_decode(t_merc[(0, 0, 0)])
    assert (z0[:, :, 3] == 255).all()
    # gradient rises with x exactly like the source: tile pixel j samples
    # source column floor(j * n/256) -> value = round(col*255/(n-1))
    for j in (0, 17, 100, 200, 255):
        col = (j + 0.5) * n / 256
        want = round(int(col) * 255 / (n - 1))
        assert abs(int(z0[128, j, 0]) - want) <= 1, j

    # 4326 twin: same gradient laid out uniformly in LONGITUDE (mercator x
    # IS longitude up to scale, so the two agree everywhere)
    p_geo = str(tmp_path / "g.tif")
    write_geotiff_gray8(p_geo, img, west=-180.0, north=90.0, sx=360 / n, sy=180 / n)
    t_geo = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
             for r in from_gdal_raster(spark, p_geo, 0, 2).collect()}
    a = png_decode(t_merc[(1, 0, 0)]).astype(int)
    b = png_decode(t_geo[(1, 0, 0)]).astype(int)
    # same columns (mercator-x gradient), alpha everywhere; rows may differ
    # only where the 4326 twin's latitude rows decimate differently — for a
    # column gradient rows are constant, so the whole tile matches
    assert np.abs(a[:, :, 0] - b[:, :, 0]).max() <= 1
    assert (a[:, :, 3] == b[:, :, 3]).all()


def test_epsg3857_windowed_and_overview(spark, tmp_path):
    import math

    from versatiles_rs_spark.sources.geotiff import write_geotiff_gray8

    R = 6378137.0
    world = 2 * math.pi * R
    img = np.tile(np.arange(256, dtype=np.uint8), (256, 1))
    p = str(tmp_path / "mw.tif")
    write_geotiff_gray8(p, img, west=-world / 2, north=world / 2,
                        sx=world / 256, sy=world / 256, epsg=3857,
                        compression="lzw", tiled=True, tile_size=32)
    a = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
         for r in from_gdal_raster(spark, p, 0, 2, mode="broadcast").collect()}
    b = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
         for r in from_gdal_raster(spark, p, 0, 2, mode="windowed").collect()}
    assert a == b and len(a) == 21
    ov = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
          for r in from_gdal_raster(spark, p, 0, 2, low_zoom="overview").collect()}
    assert ov.keys() == a.keys()


def test_cubic_resampling(spark, tmp_path):
    """Catmull-Rom cubic: exact on constants and on LINEAR ramps (the
    kernel reproduces polynomials up to degree 3), smoother than nearest
    on steps, and clipped to [0,255] despite overshoot."""
    from versatiles_rs_spark.functions.raster import png_decode
    from versatiles_rs_spark.sources.geotiff import write_geotiff_gray8

    const = np.full((64, 128), 77, np.uint8)
    pc = str(tmp_path / "cc.tif")
    write_geotiff_gray8(pc, const, -180.0, 90.0, 360 / 128, 180 / 64)
    near = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
            for r in from_gdal_raster(spark, pc, 0, 0).collect()}
    cub = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
           for r in from_gdal_raster(spark, pc, 0, 0, resampling="cubic").collect()}
    assert near == cub  # constant: all kernels agree

    # linear ramp: cubic interpolates it exactly (within rounding), while
    # nearest staircases; compare against the analytic ramp
    ramp = np.tile(np.arange(128, dtype=np.uint8) * 2, (64, 1))
    pr = str(tmp_path / "cr.tif")
    write_geotiff_gray8(pr, ramp, -180.0, 90.0, 360 / 128, 180 / 64)
    z0 = png_decode({(r["z"], r["x"], r["y"]): bytes(r["tile"])
                     for r in from_gdal_raster(spark, pr, 0, 0, resampling="cubic").collect()}[(0, 0, 0)])
    j = np.arange(256)
    src_col = (j + 0.5) * 128 / 256 - 0.5  # fractional source column
    want = np.clip(src_col, 0, 127) * 2
    mid = z0[128, :, 0].astype(float)
    # interior columns (away from the clamped borders) track the ramp closely
    assert np.abs(mid[4:252] - want[4:252]).max() <= 1.5

    # step edge: cubic overshoots the step but output stays in [0,255]
    step = np.zeros((64, 128), np.uint8)
    step[:, 64:] = 255
    ps = str(tmp_path / "cs.tif")
    write_geotiff_gray8(ps, step, -180.0, 90.0, 360 / 128, 180 / 64)
    zs = png_decode({(r["z"], r["x"], r["y"]): bytes(r["tile"])
                     for r in from_gdal_raster(spark, ps, 0, 0, resampling="cubic").collect()}[(0, 0, 0)])
    vals = zs[128, :, 0]
    assert vals.min() >= 0 and vals.max() <= 255
    assert len(np.unique(vals)) > 2  # smooth transition exists
