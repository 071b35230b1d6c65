"""PNG codec, pixel ops, DEM encodings."""

from __future__ import annotations

import numpy as np
import pytest

from versatiles_rs_spark.functions.raster import (
    dem_average_quad,
    dem_decode,
    dem_encode,
    flatten_onto,
    is_empty,
    is_opaque,
    jpeg_decode,
    levels,
    overlay,
    png_decode,
    png_encode,
    scaled_down,
)


def test_png_roundtrip_all_channel_counts():
    rng = np.random.default_rng(3)
    for c in (1, 2, 3, 4):
        img = rng.integers(0, 256, (16, 24, c), dtype=np.uint8)
        out = png_decode(png_encode(img))
        np.testing.assert_array_equal(out, img)


def test_png_deterministic():
    img = np.arange(256, dtype=np.uint8).reshape(8, 8, 4)
    assert png_encode(img) == png_encode(img.copy())


def test_scaled_down_average():
    img = np.zeros((4, 4, 1), np.uint8)
    img[0, 0, 0] = 100
    img[0, 1, 0] = 100
    out = scaled_down(img, 2)
    assert out.shape == (2, 2, 1)
    assert out[0, 0, 0] == 50  # (100+100+0+0)/4
    assert out[1, 1, 0] == 0


def test_overlay_alpha():
    dst = np.full((2, 2, 4), [0, 0, 255, 255], np.uint8)
    src = np.full((2, 2, 4), [255, 0, 0, 128], np.uint8)
    out = overlay(dst, src)
    assert out[0, 0, 3] == 255  # opaque result
    assert out[0, 0, 0] > 100 and out[0, 0, 2] > 100  # mixed red/blue


def test_levels_formula():
    img = np.full((1, 1, 1), 255, np.uint8)
    assert levels(img, brightness=0.0, contrast=1.0, gamma=1.0)[0, 0, 0] == 255
    assert levels(img, contrast=0.5)[0, 0, 0] == 191  # (1-0.5)*0.5+0.5 = 0.75
    dark = levels(np.full((1, 1, 1), 128, np.uint8), gamma=2.0)
    assert dark[0, 0, 0] < 128


def test_flatten_and_transparency_flags():
    rgba = np.zeros((2, 2, 4), np.uint8)
    assert is_empty(rgba)
    assert not is_opaque(rgba)
    rgba[:, :, 3] = 255
    assert is_opaque(rgba)
    flat = flatten_onto(rgba, (9, 9, 9))
    assert flat.shape == (2, 2, 3)
    assert is_opaque(flat)


def test_dem_roundtrip_both_schemas():
    elev = np.array([[-100.0, 0.0], [8848.0, 505.5]])
    for schema, tol in (("terrarium", 1 / 256), ("mapbox", 0.1)):
        rgb = dem_encode(elev, schema)
        back = dem_decode(rgb, schema)
        np.testing.assert_allclose(back, elev, atol=tol / 2 + 1e-9)


def test_dem_average_quad():
    q = [dem_encode(np.full((4, 4), float(v)), "terrarium") for v in (0, 100, 200, 300)]
    out = dem_average_quad(q, 4)
    back = dem_decode(out, "terrarium")
    assert back.shape == (4, 4)
    # each output quadrant averages within one child; spot-check mean
    assert abs(back.mean() - 150.0) < 1.0


def test_jpeg_malformed_rejected():
    # jpeg_decode is now a real baseline codec; truncated input must raise
    with pytest.raises(ValueError):
        jpeg_decode(b"\xff\xd8")


def test_additional_pixel_ops():
    from versatiles_rs_spark.functions.raster import (
        average_color,
        diff,
        extract,
        make_opaque,
        map_color_values,
        overlay_additive,
    )

    img = np.zeros((8, 8, 4), np.uint8)
    img[:4, :4, 0] = 100
    img[:, :, 3] = 200
    # extract crop + resize
    sub = extract(img, 0, 0, 4, 4, dst_size=8)
    assert sub.shape == (8, 8, 4)
    assert sub[0, 0, 0] == 100
    # additive overlay clips at 255
    bright = np.full((8, 8, 4), 250, np.uint8)
    out = overlay_additive(bright, bright)
    assert out[0, 0, 0] == 255
    # make_opaque
    assert (make_opaque(img)[:, :, 3] == 255).all()
    # average color
    avg = average_color(np.full((2, 2, 3), 10, np.uint8))
    assert avg == (10.0, 10.0, 10.0)
    # diff
    assert diff(img, img) == 0
    other = img.copy()
    other[0, 0, 0] += 7
    assert diff(img, other) == 7
    # LUT
    lut = np.arange(256)[::-1]
    inv = map_color_values(np.full((1, 1, 1), 0, np.uint8), lut)
    assert inv[0, 0, 0] == 255


def test_webp_roundtrip_and_registry():
    """WebP via the system libwebp (functions/webp_native.py): lossless
    roundtrip is pixel-exact; lossy decodes to the right shape; the image
    registry dispatches 'webp' (closing the reference registry's
    png/jpg/webp row — AVIF stays documented-absent)."""
    import pytest as _pytest

    from versatiles_rs_spark.functions.webp_native import HAS_WEBP
    if not HAS_WEBP:
        _pytest.skip("libwebp not present")
    from versatiles_rs_spark.functions.raster import image_decode, image_encode

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 24, 4), dtype=np.uint8)
    img[:, :, 3] = 255  # simple lossless API is exact only for opaque RGB
    lossless = image_encode(img, "webp", quality=100)
    assert lossless[:4] == b"RIFF" and lossless[8:12] == b"WEBP"
    back = image_decode(lossless, "webp")
    np.testing.assert_array_equal(back, img)

    lossy = image_encode(img[:, :, :3], "webp", quality=80)
    out = image_decode(lossy, "webp")
    assert out.shape == (32, 24, 4)


def test_avif_roundtrip_and_registry():
    """AVIF via the system libheif (AV1): decode(encode(x)) has the right
    shape and is visually close (AV1 is lossy); registry dispatches it."""
    import pytest as _pytest

    from versatiles_rs_spark.functions.avif_native import HAS_AVIF
    if not HAS_AVIF:
        _pytest.skip("libheif AV1 not present")
    from versatiles_rs_spark.functions.raster import image_decode, image_encode

    # smooth gradient (lossy codecs track it closely)
    yy, xx = np.mgrid[0:32, 0:24]
    img = np.stack([xx * 10 % 256, yy * 7 % 256, (xx + yy) * 5 % 256], axis=2).astype(np.uint8)
    blob = image_encode(img, "avif", quality=90)
    assert blob[4:12] == b"ftypavif"
    out = image_decode(blob, "avif")
    assert out.shape == (32, 24, 4)
    diff = np.abs(out[:, :, :3].astype(int) - img.astype(int)).mean()
    assert diff < 12.0, diff
