"""Minimal pure-python GeoTIFF reader + from_gdal_raster analog.

The reference reads rasters through GDAL (read/from_gdal); GDAL is not in
this container, so the subset needed for georeferenced 8-bit rasters is
implemented from the public TIFF 6.0 + GeoTIFF specs with stdlib zlib:

- little/big endian classic TIFF, stripped AND tiled layouts (tags
  322/323/324/325),
- compression 1 (none), 5 (LZW with the TIFF early-change variant,
  TIFF 6.0 §13) and 8 (zlib/deflate), predictor 1/2 (horizontal
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

_LZW_CLEAR, _LZW_EOI = 256, 257


def _tiff_lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW (TIFF 6.0 §13): MSB-first bit packing, 9-bit start,
    Clear=256 / EOI=257, and the "early change" — the code width bumps when
    the NEXT table entry would be 2^width - 1 (one code earlier than plain
    LZW). Pure python; runs once per strip/tile on the driver for small,
    broadcastable rasters."""
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    prev: bytes | None = None
    out = bytearray()
    bitbuf = 0
    nbits = 0
    i = 0
    n = len(data)
    while True:
        while nbits < width:
            if i >= n:
                return bytes(out)
            bitbuf = (bitbuf << 8) | data[i]
            i += 1
            nbits += 8
        code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == _LZW_CLEAR:
            table = list(base)
            width = 9
            prev = None
            continue
        if code == _LZW_EOI:
            return bytes(out)
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"corrupt LZW stream: code {code} > table {len(table)}")
        out += entry
        prev = entry
        # early change: the decoder's table lags the encoder's NextCode by
        # one, so it must widen one entry earlier (at 510/1022/2046) than
        # the encoder's 511/1023/2047 (TIFF 6.0 §13 + the de-facto
        # "earlychange" behavior of every mainstream reader)
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (fixture writer / sink side), symmetric
    with _tiff_lzw_decode including the early change."""
    out = bytearray()
    bitbuf = 0
    nbits = 0
    width = 9

    def put(code: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    put(_LZW_CLEAR)
    w = b""
    for byte in data:
        c = bytes([byte])
        if w + c in table:
            w += c
            continue
        put(table[w])
        table[w + c] = next_code
        next_code += 1
        # encoder bumps width one entry EARLIER than generic LZW, mirroring
        # the decoder's early change
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code == 4094:  # table nearly full: emit Clear, restart
            put(_LZW_CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = c
    if w:
        put(table[w])
    put(_LZW_EOI)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


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
    if compression not in (1, 5, 8):
        raise ValueError(f"unsupported TIFF compression {compression} (have none/lzw/deflate)")
    if predictor == 2 and bits != 8:
        raise ValueError("horizontal predictor only supported for 8-bit samples")

    def _decompress(raw: bytes) -> bytes:
        if compression == 8:
            return zlib.decompress(raw)
        if compression == 5:
            return _tiff_lzw_decode(raw)
        return raw

    img = np.empty((height, width, spp), dtype=dtype)
    if 322 in tags:  # tiled layout (TIFF 6.0 §15): tiles across, then down
        tw, th = tags[322][0], tags[323][0]
        offsets, byte_counts = tags[324], tags[325]
        tiles_across = (width + tw - 1) // tw
        for idx, (off, cnt) in enumerate(zip(offsets, byte_counts)):
            raw = _decompress(b[off : off + cnt])
            arr = np.frombuffer(raw, dtype)[: th * tw * spp].reshape(th, tw, spp)
            if predictor == 2:
                arr = np.cumsum(arr.astype(np.int64), axis=1).astype(np.uint8)
            ty, tx = divmod(idx, tiles_across)
            r0, c0 = ty * th, tx * tw
            rr, cc = min(th, height - r0), min(tw, width - c0)
            img[r0 : r0 + rr, c0 : c0 + cc] = arr[:rr, :cc]
    else:
        offsets = tags[273]
        byte_counts = tags[279]
        rows_per_strip = tags.get(278, (height,))[0]
        row0 = 0
        for off, cnt in zip(offsets, byte_counts):
            raw = _decompress(b[off : off + cnt])
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


def write_geotiff_gray8(
    path: str,
    data: np.ndarray,
    west: float,
    north: float,
    sx: float,
    sy: float,
    compression: str = "none",
    tiled: bool = False,
    tile_size: int = 16,
    predictor: int = 1,
) -> None:
    """8-bit single-band GeoTIFF writer covering every layout/codec the
    reader supports (strips or tiles x none/deflate/lzw x predictor 1/2) —
    exercises read_geotiff's full matrix in tests and doubles as a sink."""
    import struct as _s

    comp_tag = {"none": 1, "lzw": 5, "deflate": 8}[compression]
    h, w = data.shape
    data = data.astype(np.uint8)

    def pack(block: np.ndarray) -> bytes:
        if predictor == 2:
            block = np.concatenate(
                [block[:, :1], np.diff(block.astype(np.int16), axis=1)], axis=1
            ).astype(np.uint8)
        raw = block.tobytes()
        if comp_tag == 8:
            return zlib.compress(raw, 9)
        if comp_tag == 5:
            return _tiff_lzw_encode(raw)
        return raw

    blocks: list[bytes] = []
    if tiled:
        ts = tile_size
        for ty in range((h + ts - 1) // ts):
            for tx in range((w + ts - 1) // ts):
                block = np.zeros((ts, ts), np.uint8)
                sub = data[ty * ts : (ty + 1) * ts, tx * ts : (tx + 1) * ts]
                block[: sub.shape[0], : sub.shape[1]] = sub
                blocks.append(pack(block))
    else:
        blocks.append(pack(data))

    n_entries = 15 if tiled else 14
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

    nb = len(blocks)
    if nb > 1:
        offsets_off = ext_base + len(ext)
        ext.extend(b"\x00" * 4 * nb)  # patched below
        counts_off = ext_put(f"{nb}I", *[len(x) for x in blocks])
    data_off = ext_base + len(ext)
    offs = []
    pos = data_off
    for x in blocks:
        offs.append(pos)
        pos += len(x)
    if nb > 1:
        ext[offsets_off - ext_base : offsets_off - ext_base + 4 * nb] = _s.pack(
            f"<{nb}I", *offs
        )

    entries = [
        (256, 3, 1, w),
        (257, 3, 1, h),
        (258, 3, 1, 8),
        (259, 3, 1, comp_tag),
        (262, 3, 1, 1),
        (277, 3, 1, 1),
        (317, 3, 1, predictor),
        (339, 3, 1, 1),
        (33550, 12, 3, scale_off),
        (33922, 12, 6, tie_off),
        (34735, 3, 16, geokey_off),
    ]
    if tiled:
        entries += [
            (322, 3, 1, tile_size),
            (323, 3, 1, tile_size),
            (324, 4, nb, offs[0] if nb == 1 else offsets_off),
            (325, 4, nb, len(blocks[0]) if nb == 1 else counts_off),
        ]
    else:
        entries += [
            (273, 4, 1, offs[0]),
            (278, 3, 1, h),
            (279, 4, 1, len(blocks[0])),
        ]
    entries.sort()
    assert len(entries) == n_entries, "IFD size mismatch with ext_base layout"
    buf = bytearray(b"II*\x00" + _s.pack("<I", ifd_off))
    buf += _s.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        buf += _s.pack("<HHII", tag, typ, cnt, val)
    buf += _s.pack("<I", 0)
    buf += ext
    for x in blocks:
        buf += x
    with open(path, "wb") as f:
        f.write(buf)


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
