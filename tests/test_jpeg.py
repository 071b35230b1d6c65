"""Baseline JPEG codec (functions/jpeg.py) + raster_image_format operator.

The reference treats JPEG as a first-class raster format
(versatiles_image/src/format/jpeg.rs); this codec is implemented from the
public ITU-T T.81 spec with Annex-K tables. Tests assert lossy round-trip
error bounds and wire-format invariants, not byte equality with other
encoders.
"""

from __future__ import annotations

import numpy as np
import pytest

from versatiles_rs_spark.functions.jpeg import jpeg_decode, jpeg_encode


@pytest.fixture(scope="module")
def rgb():
    yy, xx = np.mgrid[0:64, 0:80]
    return np.stack(
        [np.minimum(255, xx * 3), np.minimum(255, yy * 3), (xx + yy) % 200],
        axis=2,
    ).astype(np.uint8)


def test_jfif_markers(rgb):
    blob = jpeg_encode(rgb, 90)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    assert blob[2:4] == b"\xff\xe0" and blob[6:11] == b"JFIF\x00"
    assert b"\xff\xc0" in blob  # baseline SOF0
    assert b"\xff\xc4" in blob and b"\xff\xdb" in blob and b"\xff\xda" in blob


def test_roundtrip_444_error_bound(rgb):
    back = jpeg_decode(jpeg_encode(rgb, 90))
    assert back.shape == rgb.shape
    err = np.abs(back.astype(int) - rgb.astype(int))
    assert err.mean() < 2.0 and err.max() <= 40


def test_roundtrip_420(rgb):
    blob444 = jpeg_encode(rgb, 85, subsampling="444")
    blob420 = jpeg_encode(rgb, 85, subsampling="420")
    assert len(blob420) < len(blob444)  # chroma subsampling shrinks output
    back = jpeg_decode(blob420)
    assert back.shape == rgb.shape
    err = np.abs(back.astype(int) - rgb.astype(int))
    assert err.mean() < 4.0


def test_grayscale_and_flat():
    g = (np.mgrid[0:32, 0:32][0] * 8).astype(np.uint8)
    back = jpeg_decode(jpeg_encode(g, 95))
    assert back.shape == (32, 32, 1)
    assert np.abs(back[:, :, 0].astype(int) - g).mean() < 1.5
    flat = np.full((16, 24, 3), 77, np.uint8)
    assert (jpeg_decode(jpeg_encode(flat, 90)) == 77).all()


def test_non_multiple_of_8_and_alpha(rgb):
    odd = rgb[:61, :77]
    assert jpeg_decode(jpeg_encode(odd, 85)).shape == (61, 77, 3)
    rgba = np.dstack([odd, np.full(odd.shape[:2], 200, np.uint8)])
    assert jpeg_decode(jpeg_encode(rgba, 85)).shape == (61, 77, 3)  # alpha dropped


def test_quality_monotone(rgb):
    sizes = [len(jpeg_encode(rgb, q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]
    err_lo = np.abs(jpeg_decode(jpeg_encode(rgb, 30)).astype(int) - rgb.astype(int)).mean()
    err_hi = np.abs(jpeg_decode(jpeg_encode(rgb, 95)).astype(int) - rgb.astype(int)).mean()
    assert err_hi < err_lo


def test_progressive_rejected(rgb):
    blob = bytearray(jpeg_encode(rgb, 85))
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC2  # claim progressive
    with pytest.raises(ValueError, match="not baseline"):
        jpeg_decode(bytes(blob))


def test_quality_schedule_parse():
    from versatiles_rs_spark.operators.raster_ops import parse_quality_schedule

    d, sched = parse_quality_schedule("70,14:50,15:20")
    assert d == 70 and sched == [(14, 50), (15, 20)]
    d2, s2 = parse_quality_schedule("90")
    assert d2 == 90 and s2 == []


def test_raster_image_format_operator(spark):
    import pandas as pd

    from versatiles_rs_spark.functions.raster import image_decode, png_encode
    from versatiles_rs_spark.operators.raster_ops import raster_image_format

    img = np.tile(np.arange(64, dtype=np.uint8) * 4, (64, 1))[:, :, None]
    img = np.repeat(img, 3, axis=2)
    rows = [(z, 0, 0, "png", "none", png_encode(img), 0) for z in (3, 14, 15)]
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["z", "x", "y", "format", "compression", "tile", "n_features"]
    ))
    out = raster_image_format(df, fmt="jpg", quality="70,15:20").collect()
    by_z = {r["z"]: r for r in out}
    assert all(r["format"] == "jpg" for r in out)
    # z15 uses quality 20 -> smaller than z3's quality 70 of the same image
    assert len(bytes(by_z[15]["tile"])) < len(bytes(by_z[3]["tile"]))
    back = image_decode(bytes(by_z[3]["tile"]), "jpg")
    assert np.abs(back.astype(int) - img.astype(int)).mean() < 4.0


def test_vpl_raster_format_jpg(spark):
    from versatiles_rs_spark.plans.vpl import build_pipeline

    out = build_pipeline(
        spark, 'from_color color=[120,40,200,255] level_min=0 level_max=1 | '
               'raster_format format=jpg quality="80" compression=gzip'
    )
    rows = out.collect()
    assert rows and all(r["format"] == "jpg" and r["compression"] == "gzip" for r in rows)
