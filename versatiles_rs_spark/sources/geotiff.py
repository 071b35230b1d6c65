"""Minimal pure-python GeoTIFF reader + from_gdal_raster analog.

The reference reads rasters through GDAL (read/from_gdal); GDAL is not in
this container, so the subset needed for georeferenced 8-bit rasters is
implemented from the public TIFF 6.0 + GeoTIFF specs with stdlib zlib:

- little/big endian classic TIFF, stripped layout,
- compression 1 (none) and 8 (zlib/deflate), predictor 1/2 (horizontal
  differencing),
- GeoTIFF ModelPixelScale + ModelTiepoint for the geotransform and
  GeographicTypeGeoKey (EPSG:4326 supported — the reference fixture's CRS).

``from_gdal_raster`` then renders the raster into a Web-Mercator PNG tile
pyramid: the (small, broadcastable) source image rides a broadcast
variable; candidate tiles are enumerated from the raster's bbox as a
DataFrame and rendered per Arrow batch with vectorized nearest-neighbor
sampling — pixels outside the raster's coverage get alpha 0.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 12: 8}


def read_geotiff(path: str) -> tuple[np.ndarray, dict]:
    """GeoTIFF -> (HxWxC uint8 image, {"west","north","sx","sy","epsg"})."""
    with open(path, "rb") as f:
        b = f.read()
    if b[:2] == b"II":
        fmt = "<"
    elif b[:2] == b"MM":
        fmt = ">"
    else:
        raise ValueError("not a TIFF")
    if struct.unpack(fmt + "H", b[2:4])[0] != 42:
        raise ValueError("not a classic TIFF")
    ifd_off = struct.unpack(fmt + "I", b[4:8])[0]
    n = struct.unpack(fmt + "H", b[ifd_off : ifd_off + 2])[0]
    tags: dict[int, tuple] = {}
    for i in range(n):
        e = b[ifd_off + 2 + 12 * i : ifd_off + 14 + 12 * i]
        tag, typ, cnt = struct.unpack(fmt + "HHI", e[:8])
        size = _TYPE_SIZE.get(typ, 1) * cnt
        if size <= 4:
            raw = e[8 : 8 + size]
        else:
            off = struct.unpack(fmt + "I", e[8:12])[0]
            raw = b[off : off + size]
        if typ == 3:
            vals = struct.unpack(fmt + f"{cnt}H", raw)
        elif typ == 4:
            vals = struct.unpack(fmt + f"{cnt}I", raw)
        elif typ == 12:
            vals = struct.unpack(fmt + f"{cnt}d", raw)
        elif typ == 1:
            vals = tuple(raw)
        else:
            vals = (raw,)
        tags[tag] = vals

    width = tags[256][0]
    height = tags[257][0]
    spp = tags.get(277, (1,))[0]
    bits = tags.get(258, (8,))[0]
    sample_format = tags.get(339, (1,))[0]  # 1 uint, 2 int, 3 float
    # supported sample layouts: 8-bit uint (imagery), 16-bit int and 32-bit
    # float single band (elevation)
    if (bits, sample_format) == (8, 1):
        dtype = np.dtype(fmt + "u1") if fmt == ">" else np.uint8
    elif (bits, sample_format) == (16, 2):
        dtype = np.dtype(fmt + "i2")
    elif (bits, sample_format) == (32, 3):
        dtype = np.dtype(fmt + "f4")
    else:
        raise ValueError(f"unsupported sample layout bits={bits} format={sample_format}")
    compression = tags.get(259, (1,))[0]
    predictor = tags.get(317, (1,))[0]
    if compression not in (1, 8):
        raise ValueError(f"unsupported TIFF compression {compression} (have none/deflate)")
    if predictor == 2 and bits != 8:
        raise ValueError("horizontal predictor only supported for 8-bit samples")
    offsets = tags[273]
    byte_counts = tags[279]
    rows_per_strip = tags.get(278, (height,))[0]

    img = np.empty((height, width, spp), dtype=dtype)
    row0 = 0
    for off, cnt in zip(offsets, byte_counts):
        raw = b[off : off + cnt]
        if compression == 8:
            raw = zlib.decompress(raw)
        rows = min(rows_per_strip, height - row0)
        arr = np.frombuffer(raw, dtype)[: rows * width * spp].reshape(rows, width, spp)
        if predictor == 2:
            arr = np.cumsum(arr.astype(np.int64), axis=1).astype(np.uint8)
        img[row0 : row0 + rows] = arr
        row0 += rows

    geo = {}
    if 33550 in tags and 33922 in tags:
        sx, sy = tags[33550][0], tags[33550][1]
        tie = tags[33922]
        # tiepoint: raster (i,j,k) -> model (x,y,z)
        geo = {"west": tie[3] - tie[0] * sx, "north": tie[4] + tie[1] * sy,
               "sx": sx, "sy": sy}
    epsg = None
    gk = tags.get(34735)
    if gk:
        for i in range(4, len(gk), 4):
            if gk[i] == 2048:  # GeographicTypeGeoKey
                epsg = gk[i + 3]
    geo["epsg"] = epsg
    if not geo.get("sx"):
        raise ValueError("TIFF has no GeoTIFF geotransform")
    if epsg not in (None, 4326):
        raise ValueError(f"only EPSG:4326 rasters supported, got {epsg}")
    return img, geo


def from_gdal_raster(
    spark: SparkSession,
    path: str,
    min_zoom: int = 0,
    max_zoom: int = 4,
    tile_size: int = 256,
) -> DataFrame:
    """Georeferenced raster -> Web-Mercator PNG tile pyramid (from_gdal
    analog). Nearest-neighbor resampling; out-of-coverage pixels are
    transparent."""
    from versatiles_rs_spark.operators.convert import TILE_SCHEMA
    from versatiles_rs_spark.tile_math.coords import tile_geo_bbox_np

    img, geo = read_geotiff(path)
    h, w = img.shape[:2]
    west, north, sx, sy = geo["west"], geo["north"], geo["sx"], geo["sy"]
    east = west + w * sx
    south = north - h * sy
    bc = spark.sparkContext.broadcast((img, west, north, sx, sy))

    # candidate tiles intersecting the raster bbox per zoom (driver-side
    # enumeration is tiny: it is bbox area / tile area, not the image)
    cands = []
    for z in range(min_zoom, max_zoom + 1):
        zn = 1 << z
        fx = lambda lon: int(np.clip(np.floor((lon / 360.0 + 0.5) * zn), 0, zn - 1))
        lat_clip = np.clip([south, north], -85.05112878, 85.05112878)
        fy = lambda lat: int(np.clip(np.floor(
            (0.5 - 0.5 * np.log(np.tan(lat * np.pi / 360.0 + np.pi / 4.0)) / np.pi) * zn
        ), 0, zn - 1))
        for ty in range(fy(lat_clip[1]), fy(lat_clip[0]) + 1):
            for tx in range(fx(west), fx(min(east, 179.999999)) + 1):
                cands.append((z, tx, ty))
    cdf = spark.createDataFrame(pd.DataFrame(cands, columns=["z", "x", "y"])).repartition(
        max(1, min(len(cands), spark.sparkContext.defaultParallelism * 2))
    )

    def render(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from versatiles_rs_spark.functions.raster import png_encode

        src, wst, nth, psx, psy = bc.value
        sh, sw = src.shape[:2]
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                z, x, y = int(r["z"]), int(r["x"]), int(r["y"])
                wb, sb, eb, nb = (
                    a[0] for a in tile_geo_bbox_np(z, np.array([x]), np.array([y]))
                )
                lons = wb + (np.arange(tile_size) + 0.5) / tile_size * (eb - wb)
                # pixel rows are uniform in MERCATOR y, not degrees — the
                # linear-in-degrees shortcut distorts low zooms badly
                yy = (y + (np.arange(tile_size) + 0.5) / tile_size) / (1 << z)
                lats = (np.arctan(np.exp(np.pi * (1.0 - 2.0 * yy))) / np.pi - 0.25) * 360.0
                cols = np.floor((lons - wst) / psx).astype(np.int64)
                rws = np.floor((nth - lats) / psy).astype(np.int64)
                valid = (cols[None, :] >= 0) & (cols[None, :] < sw) & \
                        (rws[:, None] >= 0) & (rws[:, None] < sh)
                if not valid.any():
                    continue
                cc = np.clip(cols, 0, sw - 1)
                rr = np.clip(rws, 0, sh - 1)
                pix = src[rr[:, None], cc[None, :]]
                out = np.zeros((tile_size, tile_size, 4), np.uint8)
                out[:, :, :3] = pix[:, :, :3] if pix.shape[2] >= 3 else pix[:, :, :1]
                out[:, :, 3] = np.where(valid, 255, 0)
                rows.append((z, x, y, "png", "none", png_encode(out), 0))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["z", "x", "y", "format", "compression", "tile", "n_features"]
                )

    return cdf.mapInPandas(render, TILE_SCHEMA)


def from_gdal_dem(
    spark: SparkSession,
    path: str,
    min_zoom: int = 0,
    max_zoom: int = 4,
    tile_size: int = 256,
    encoding: str = "terrarium",
) -> DataFrame:
    """Elevation raster (int16/float32 single band) -> terrarium/mapbox
    DEM PNG pyramid (from_gdal/dem analog). Same broadcast + vectorized
    sampling as from_gdal_raster; out-of-coverage pixels get elevation 0."""
    from versatiles_rs_spark.functions.raster import dem_encode, png_encode
    from versatiles_rs_spark.operators.convert import TILE_SCHEMA
    from versatiles_rs_spark.tile_math.coords import tile_geo_bbox_np

    img, geo = read_geotiff(path)
    if img.shape[2] != 1:
        raise ValueError("from_gdal_dem expects a single-band elevation raster")
    elev = img[:, :, 0].astype(np.float64)
    h, w = elev.shape
    west, north, sx, sy = geo["west"], geo["north"], geo["sx"], geo["sy"]
    east = west + w * sx
    south = north - h * sy
    bc = spark.sparkContext.broadcast((elev, west, north, sx, sy))

    cands = []
    for z in range(min_zoom, max_zoom + 1):
        zn = 1 << z
        fx = lambda lon: int(np.clip(np.floor((lon / 360.0 + 0.5) * zn), 0, zn - 1))
        lat_clip = np.clip([south, north], -85.05112878, 85.05112878)
        fy = lambda lat: int(np.clip(np.floor(
            (0.5 - 0.5 * np.log(np.tan(lat * np.pi / 360.0 + np.pi / 4.0)) / np.pi) * zn
        ), 0, zn - 1))
        for ty in range(fy(lat_clip[1]), fy(lat_clip[0]) + 1):
            for tx in range(fx(west), fx(min(east, 179.999999)) + 1):
                cands.append((z, tx, ty))
    cdf = spark.createDataFrame(pd.DataFrame(cands, columns=["z", "x", "y"])).repartition(
        max(1, min(len(cands), spark.sparkContext.defaultParallelism * 2))
    )

    def render(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        src, wst, nth, psx, psy = bc.value
        sh, sw = src.shape
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                z, x, y = int(r["z"]), int(r["x"]), int(r["y"])
                wb, sb, eb, nb = (
                    a[0] for a in tile_geo_bbox_np(z, np.array([x]), np.array([y]))
                )
                lons = wb + (np.arange(tile_size) + 0.5) / tile_size * (eb - wb)
                # pixel rows are uniform in MERCATOR y, not degrees — the
                # linear-in-degrees shortcut distorts low zooms badly
                yy = (y + (np.arange(tile_size) + 0.5) / tile_size) / (1 << z)
                lats = (np.arctan(np.exp(np.pi * (1.0 - 2.0 * yy))) / np.pi - 0.25) * 360.0
                cols = np.floor((lons - wst) / psx).astype(np.int64)
                rws = np.floor((nth - lats) / psy).astype(np.int64)
                valid = (cols[None, :] >= 0) & (cols[None, :] < sw) & \
                        (rws[:, None] >= 0) & (rws[:, None] < sh)
                if not valid.any():
                    continue
                cc = np.clip(cols, 0, sw - 1)
                rr = np.clip(rws, 0, sh - 1)
                tile_elev = np.where(valid, src[rr[:, None], cc[None, :]], 0.0)
                blob = png_encode(dem_encode(tile_elev, encoding))
                rows.append((z, x, y, "png", "none", blob, 0))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["z", "x", "y", "format", "compression", "tile", "n_features"]
                )

    return cdf.mapInPandas(render, TILE_SCHEMA)


def write_geotiff_gray16(path: str, data: np.ndarray, west: float, north: float,
                         sx: float, sy: float) -> None:
    """Minimal int16 single-band GeoTIFF writer (deflate, one strip,
    EPSG:4326) — for fixtures and tests; layout mirrors what read_geotiff
    parses."""
    import struct as _s

    h, w = data.shape
    payload = zlib.compress(data.astype("<i2").tobytes(), 9)

    n_entries = 13
    ifd_off = 8
    ext_base = ifd_off + 2 + 12 * n_entries + 4
    ext = bytearray()

    def ext_put(fmt_str: str, *vals) -> int:
        off = ext_base + len(ext)
        ext.extend(_s.pack("<" + fmt_str, *vals))
        return off

    scale_off = ext_put("3d", sx, sy, 0.0)
    tie_off = ext_put("6d", 0.0, 0.0, 0.0, west, north, 0.0)
    geokey_off = ext_put("16H", 1, 1, 0, 3, 1024, 0, 1, 2, 1025, 0, 1, 1, 2048, 0, 1, 4326)
    data_off = ext_base + len(ext)

    entries = sorted([
        (256, 3, 1, w),
        (257, 3, 1, h),
        (258, 3, 1, 16),
        (259, 3, 1, 8),            # deflate
        (262, 3, 1, 1),            # BlackIsZero
        (273, 4, 1, data_off),     # strip offset
        (277, 3, 1, 1),
        (278, 3, 1, h),            # one strip
        (279, 4, 1, len(payload)),
        (339, 3, 1, 2),            # signed-int samples
        (33550, 12, 3, scale_off),
        (33922, 12, 6, tie_off),
        (34735, 3, 16, geokey_off),
    ])
    assert len(entries) == n_entries
    buf = bytearray(b"II*\x00" + _s.pack("<I", ifd_off))
    buf += _s.pack("<H", n_entries)
    for tag, typ, cnt, val in entries:
        buf += _s.pack("<HHII", tag, typ, cnt, val)
    buf += _s.pack("<I", 0)  # next IFD
    buf += ext
    buf += payload
    with open(path, "wb") as f:
        f.write(buf)
