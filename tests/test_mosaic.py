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


def _with_big_ancillary(png: bytes, trns: bool) -> bytes:
    """Insert a >2KB ancillary chunk (and optionally a tRNS) after IHDR."""
    import struct, zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr_end = 8 + 8 + 25  # sig + len/type + 13 data + 4 crc = byte 33... compute properly
    # locate end of IHDR chunk properly
    length = int.from_bytes(png[8:12], "big")
    ihdr_end = 8 + 12 + length
    extra = chunk(b"tEXt", b"k\x00" + b"v" * 4000)
    trns_chunk = chunk(b"tRNS", b"\x00\x01\x00\x02\x00\x03") if trns else b""
    return png[:ihdr_end] + extra + trns_chunk + png[ihdr_end:]


def test_trns_found_beyond_2kb_of_ancillary_chunks():
    """A tRNS placed after >2KB of ancillary data must still classify the
    tile as translucent (bounded chunk walk, not a fixed-window scan)."""
    base = _rgb(5, 6, 7)
    assert png_is_opaque(_with_big_ancillary(base, trns=True)) is False
    # and the same big ancillary prefix WITHOUT tRNS stays opaque
    assert png_is_opaque(_with_big_ancillary(base, trns=False)) is True


def test_trns_bytes_inside_idat_do_not_misclassify():
    """The literal bytes b'tRNS' appearing inside compressed pixel data
    must not flip an opaque tile to translucent: the walk stops at IDAT."""
    import struct, zlib

    img = np.zeros((16, 16, 3), dtype=np.uint8)
    blob = png_encode(img)
    # craft: splice a fake IDAT whose payload contains b'tRNS' after the
    # real IDAT (decoder ignores it; substring search would have tripped)
    length = int.from_bytes(blob[8:12], "big")
    ihdr_end = 8 + 12 + length
    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )
    evil = blob[:ihdr_end] + chunk(b"tEXt", b"x\x00tRNS-lookalike") + blob[ihdr_end:]
    # b'tRNS' IS in the raw bytes, but only inside a tEXt payload
    assert b"tRNS" in evil
    assert png_is_opaque(evil) is True


def test_jpg_top_passthrough_with_format_column(spark):
    """A jpg top tile (opaque by nature) forwards byte-untouched and the
    output row carries format='jpg', not a hardcoded 'png'."""
    from versatiles_rs_spark.functions.jpeg import jpeg_encode

    img = np.full((8, 8, 3), 77, dtype=np.uint8)
    jpg = jpeg_encode(img)
    a = _tiles(spark, [(1, 0, 0, "jpg", "none", jpg, 0)])
    b = _tiles(spark, [(1, 0, 0, "png", "none", _rgb(1, 1, 1), 0)])
    out = mosaic_assemble_tiles([a, b]).collect()
    assert len(out) == 1
    assert out[0]["format"] == "jpg"
    assert bytes(out[0]["tile"]) == jpg


def test_translucent_nonpng_stack_raises_clear_error(spark):
    """A stack that NEEDS compositing but contains a non-png contribution
    fails with an explanatory error instead of a decoder crash."""
    import pytest
    from py4j.protocol import Py4JJavaError

    a = _tiles(spark, [(1, 0, 0, "png", "none", _rgba(1, 2, 3, 100), 0)])
    b = _tiles(spark, [(1, 0, 0, "webp", "none", b"RIFF....WEBP", 0)])
    with pytest.raises(Exception) as ei:
        mosaic_assemble_tiles([a, b]).collect()
    assert "non-png contributions" in str(ei.value)


def test_mosaic_job_cli(tmp_path, spark):
    """The CLI quartet's fourth member drives mosaic_assemble end-to-end:
    two raster containers in, one merged container out, opaque top
    forwarded byte-identically."""
    import json
    import os
    import subprocess
    import sys

    from versatiles_rs_spark.sources import read_container, write_container

    top_blob = _rgb(10, 20, 30)
    a = _tiles(spark, [(1, 0, 0, "png", "none", top_blob, 0)])
    b = _tiles(spark, [(1, 0, 0, "png", "none", _rgb(99, 99, 99), 0),
                       (1, 1, 0, "png", "none", _rgb(50, 50, 50), 0)])
    pa, pb = str(tmp_path / "a.mbtiles"), str(tmp_path / "b.mbtiles")
    write_container(a, pa)
    write_container(b, pb)
    out_path = str(tmp_path / "m.versatiles")
    env = dict(os.environ, PYTHONPATH="/root/repo")
    res = subprocess.run(
        [sys.executable, "/root/repo/jobs/mosaic_job.py",
         "--input", pa, "--input", pb, "--output", out_path, "--master", "local[4]"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert res.returncode == 0, res.stderr[-1500:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["output"] == out_path
    rows = {(r["z"], r["x"], r["y"]): bytes(r["tile"])
            for r in read_container(spark, out_path).collect()}
    assert set(rows) == {(1, 0, 0), (1, 1, 0)}
    assert rows[(1, 0, 0)] == top_blob  # opaque top wins, bytes untouched
