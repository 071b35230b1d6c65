"""Raster tile model: numpy pixel buffers + a dependency-free PNG codec.

Mirrors versatiles_image (§1.4/§2.10 of SURVEY.md): color types L8/LA8/RGB8/
RGBA8 (traits/info.rs:21-24), ``from_blob``/``to_blob`` (traits/convert.rs),
pixel ops ``scaled_down``/``overlay``/``levels``/``flatten``
(traits/operation.rs:29-94). Pillow is absent in this container, so PNG
encode/decode is implemented directly (zlib + filter-type-0 scanlines) —
deterministic bytes (fixed zlib level) for golden tests — and baseline
JPEG lives in functions/jpeg.py (pure python, ITU T.81). WebP and AVIF
bind the system libwebp / libheif via ctypes (webp_native.py /
avif_native.py, round 3) and degrade to a clean NotImplementedError on
hosts without the libraries. The full reference registry
(png/jpg/webp/avif, image_format.rs) now dispatches.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> PNG color type
_CHANNELS = {0: 1, 4: 2, 2: 3, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return struct.pack(">I", len(data)) + tag + data + struct.pack(">I", zlib.crc32(tag + data))


def png_encode(img: np.ndarray) -> bytes:
    """HxW or HxWxC uint8 -> deterministic PNG bytes (filter 0, zlib level 9)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    assert img.dtype == np.uint8 and c in (1, 2, 3, 4)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    raw = np.concatenate([np.zeros((h, 1), np.uint8), img.reshape(h, w * c)], axis=1)
    idat = zlib.compress(raw.tobytes(), 9)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters (types 0-4)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    rows = raw.reshape(h, stride + 1)
    for r in range(h):
        ftype = rows[r, 0]
        line = rows[r, 1:].astype(np.int32)
        prev = out[r - 1].astype(np.int32) if r > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:
            cur = (line + prev) % 256
        else:
            cur = np.zeros(stride, np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                cc = prev[i - bpp] if i >= bpp else 0
                if ftype == 1:
                    cur[i] = (line[i] + a) % 256
                elif ftype == 3:
                    cur[i] = (line[i] + (a + b) // 2) % 256
                elif ftype == 4:
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    cur[i] = (line[i] + pred) % 256
                else:
                    raise ValueError(f"bad filter {ftype}")
        out[r] = cur.astype(np.uint8)
    return out


def png_decode(blob: bytes) -> np.ndarray:
    """PNG bytes -> HxWxC uint8 (8-bit, non-interlaced, color types 0/2/4/6)."""
    assert blob[:8] == _PNG_SIG, "not a PNG"
    i = 8
    w = h = ctype = None
    idat = b""
    while i < len(blob):
        (ln,) = struct.unpack(">I", blob[i : i + 4])
        tag = blob[i + 4 : i + 8]
        data = blob[i + 8 : i + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(">IIBBBBB", data)
            assert depth == 8 and inter == 0, "only 8-bit non-interlaced supported"
        elif tag == b"IDAT":
            idat += data
        i += 12 + ln
    c = _CHANNELS[ctype]
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    img = _unfilter(raw, h, w * c, c)
    return img.reshape(h, w, c)


# ---------------------------------------------------------------------------
# pixel operations (versatiles_image/src/traits/operation.rs)
# ---------------------------------------------------------------------------

def scaled_down(img: np.ndarray, factor: int = 2) -> np.ndarray:
    """Channel-wise box average downscale (operation.rs:46); used by
    raster_overview's 2x2 -> 1 reduction."""
    h, w, c = img.shape
    v = img.reshape(h // factor, factor, w // factor, factor, c).astype(np.uint32)
    return (v.mean(axis=(1, 3))).astype(np.uint8)


def compose_quad(
    tl: np.ndarray | None, tr: np.ndarray | None, bl: np.ndarray | None, br: np.ndarray | None,
    size: int, channels: int,
) -> np.ndarray:
    """Place up to 4 child tiles into a 2size x 2size canvas (missing
    children stay transparent/zero) — overview.rs:22-41 composition step."""
    canvas = np.zeros((2 * size, 2 * size, channels), dtype=np.uint8)
    for img, (r, col) in zip((tl, tr, bl, br), ((0, 0), (0, 1), (1, 0), (1, 1))):
        if img is not None:
            canvas[r * size : (r + 1) * size, col * size : (col + 1) * size] = img
    return canvas


def overlay(dst: np.ndarray, src: np.ndarray) -> np.ndarray:
    """Alpha-composite src over dst (operation.rs:84), RGBA uint8."""
    sa = src[:, :, 3:4].astype(np.float64) / 255.0
    da = dst[:, :, 3:4].astype(np.float64) / 255.0
    oa = sa + da * (1 - sa)
    with np.errstate(invalid="ignore"):
        rgb = (src[:, :, :3] * sa + dst[:, :, :3] * da * (1 - sa)) / np.where(oa == 0, 1, oa)
    out = np.concatenate([rgb, oa * 255.0], axis=2)
    return np.round(out).astype(np.uint8)


def levels(img: np.ndarray, brightness: float = 0.0, contrast: float = 1.0, gamma: float = 1.0) -> np.ndarray:
    """Per-pixel brightness/contrast/gamma (raster_levels.rs:64-84):
    ((v/255 - 0.5)*c + 0.5 + b)^gamma * 255."""
    v = img.astype(np.float64) / 255.0
    v = (v - 0.5) * contrast + 0.5 + brightness
    v = np.clip(v, 0.0, 1.0) ** gamma
    return np.round(v * 255.0).astype(np.uint8)


def flatten_onto(img: np.ndarray, bg: tuple[int, int, int]) -> np.ndarray:
    """RGBA -> RGB onto a background color (raster_flatten.rs)."""
    a = img[:, :, 3:4].astype(np.float64) / 255.0
    rgb = img[:, :, :3].astype(np.float64) * a + np.array(bg, dtype=np.float64) * (1 - a)
    return np.round(rgb).astype(np.uint8)


def overlay_additive(dst: np.ndarray, src: np.ndarray) -> np.ndarray:
    """Additive blend with alpha weighting, clipped (operation.rs:94)."""
    sa = src[:, :, 3:4].astype(np.float64) / 255.0
    rgb = dst[:, :, :3].astype(np.float64) + src[:, :, :3].astype(np.float64) * sa
    out = dst.copy()
    out[:, :, :3] = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return out


def extract(img: np.ndarray, x: int, y: int, w: int, h: int, dst_size: int | None = None) -> np.ndarray:
    """Crop a region, optionally nearest-neighbor resize to dst_size square
    (operation.rs extract — the overscale crop primitive)."""
    sub = img[y : y + h, x : x + w]
    if dst_size is None or (sub.shape[0] == dst_size and sub.shape[1] == dst_size):
        return sub.copy()
    yi = (np.arange(dst_size) * sub.shape[0] // dst_size).clip(0, sub.shape[0] - 1)
    xi = (np.arange(dst_size) * sub.shape[1] // dst_size).clip(0, sub.shape[1] - 1)
    return sub[yi][:, xi]


def make_opaque(img: np.ndarray) -> np.ndarray:
    """Force full alpha (operation.rs make_opaque)."""
    if img.shape[2] in (2, 4):
        out = img.copy()
        out[:, :, -1] = 255
        return out
    return img


def average_color(img: np.ndarray) -> tuple[float, ...]:
    """Channel-wise mean (info.rs average_color)."""
    return tuple(float(v) for v in img.reshape(-1, img.shape[2]).mean(axis=0))


def diff(a: np.ndarray, b: np.ndarray) -> int:
    """Max absolute channel difference (operation.rs diff — the
    convert_integrity comparison primitive)."""
    return int(np.abs(a.astype(np.int32) - b.astype(np.int32)).max())


def map_color_values(img: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """Apply a 256-entry lookup table per channel (levels is implemented on
    top of this in the reference)."""
    assert lut.shape == (256,)
    return lut.astype(np.uint8)[img]


def is_empty(img: np.ndarray) -> bool:
    """All-transparent (info.rs:54)."""
    return img.shape[2] in (2, 4) and bool((img[:, :, -1] == 0).all())


def is_opaque(img: np.ndarray) -> bool:
    """No transparency at all (info.rs:58)."""
    return img.shape[2] in (1, 3) or bool((img[:, :, -1] == 255).all())


def jpeg_decode(blob: bytes) -> np.ndarray:
    """Baseline JPEG -> HxWxC uint8 (pure-python codec, functions/jpeg.py;
    versatiles_image/src/format/jpeg.rs analog)."""
    from versatiles_rs_spark.functions.jpeg import jpeg_decode as _dec

    return _dec(blob)


def jpeg_encode(img: np.ndarray, quality: int = 85, subsampling: str = "444") -> bytes:
    """HxWxC uint8 -> baseline JFIF bytes (alpha dropped, like the
    reference's JPG export which requires opaque input)."""
    from versatiles_rs_spark.functions.jpeg import jpeg_encode as _enc

    return _enc(img, quality=quality, subsampling=subsampling)


def image_decode(blob: bytes, fmt: str) -> np.ndarray:
    """Format-dispatched decode (versatiles_image format registry analog).
    png/jpg are pure-python; webp binds the system libwebp (round 3,
    functions/webp_native.py) and raises cleanly where absent."""
    if fmt == "png":
        return png_decode(blob)
    if fmt in ("jpg", "jpeg"):
        return jpeg_decode(blob)
    if fmt == "webp":
        from versatiles_rs_spark.functions.webp_native import webp_decode

        return webp_decode(blob)
    if fmt == "avif":
        from versatiles_rs_spark.functions.avif_native import avif_decode

        return avif_decode(blob)
    raise NotImplementedError(f"image format {fmt!r} not available (have png/jpg/webp/avif)")


def image_encode(img: np.ndarray, fmt: str, quality: int = 85) -> bytes:
    if fmt == "png":
        return png_encode(img)
    if fmt in ("jpg", "jpeg"):
        return jpeg_encode(img, quality=quality)
    if fmt == "webp":
        from versatiles_rs_spark.functions.webp_native import webp_encode

        # lossless below the reference's lossy threshold semantics: the
        # registry treats quality >= 100 as lossless
        return webp_encode(img, quality=None if quality >= 100 else quality)
    if fmt == "avif":
        from versatiles_rs_spark.functions.avif_native import avif_encode

        return avif_encode(img, quality=quality)
    raise NotImplementedError(f"image format {fmt!r} not available (have png/jpg/webp/avif)")


# ---------------------------------------------------------------------------
# DEM encodings (versatiles_pipeline/src/operations/dem/encoding.rs:4-24)
# ---------------------------------------------------------------------------

def dem_encode(elev: np.ndarray, schema: str = "terrarium") -> np.ndarray:
    """Elevation meters -> 24-bit RGB. terrarium: raw = (elev+32768)*256;
    mapbox: raw = (elev+10000)*10."""
    if schema == "terrarium":
        raw = np.round((elev.astype(np.float64) + 32768.0) * 256.0).astype(np.int64)
    elif schema == "mapbox":
        raw = np.round((elev.astype(np.float64) + 10000.0) * 10.0).astype(np.int64)
    else:
        raise ValueError(schema)
    raw = np.clip(raw, 0, (1 << 24) - 1)
    return np.stack([(raw >> 16) & 0xFF, (raw >> 8) & 0xFF, raw & 0xFF], axis=-1).astype(np.uint8)


def dem_decode(rgb: np.ndarray, schema: str = "terrarium") -> np.ndarray:
    """24-bit RGB -> elevation meters. terrarium: raw/256 - 32768;
    mapbox: raw*0.1 - 10000 (encoding.rs:7-11)."""
    raw = (
        rgb[..., 0].astype(np.int64) * 65536
        + rgb[..., 1].astype(np.int64) * 256
        + rgb[..., 2].astype(np.int64)
    )
    if schema == "terrarium":
        return raw.astype(np.float64) / 256.0 - 32768.0
    if schema == "mapbox":
        return raw.astype(np.float64) * 0.1 - 10000.0
    raise ValueError(schema)


def dem_scale_down(img: np.ndarray) -> np.ndarray:
    """Halve a DEM tile by averaging *raw* 24-bit values over 2x2 pixel
    blocks (dem_overview.rs:35-93 dem_scale_down). RGB path: avg =
    (sum + 2) / 4 (round-half-up integer division, exactly as the
    reference). RGBA path: average raw over pixels with a > 0 only,
    avg = (sum + count/2) / count, alpha averaged channel-wise; all-
    transparent blocks become (0,0,0,0)."""
    h, w, c = img.shape
    raw = (
        img[..., 0].astype(np.uint64) << 16
    ) | (img[..., 1].astype(np.uint64) << 8) | img[..., 2].astype(np.uint64)
    blocks = raw.reshape(h // 2, 2, w // 2, 2)
    if c == 3:
        avg = (blocks.sum(axis=(1, 3)) + 2) // 4
        return np.stack(
            [(avg >> 16) & 0xFF, (avg >> 8) & 0xFF, avg & 0xFF], axis=-1
        ).astype(np.uint8)
    a = img[..., 3].astype(np.uint64).reshape(h // 2, 2, w // 2, 2)
    visible = a > 0
    count = visible.sum(axis=(1, 3)).astype(np.uint64)
    vsum = np.where(visible, blocks, 0).sum(axis=(1, 3))
    safe = np.maximum(count, 1)
    avg = (vsum + count // 2) // safe
    avg = np.where(count > 0, avg, 0)
    avg_alpha = np.minimum((a.sum(axis=(1, 3)) + 2) // 4, 255)
    avg_alpha = np.where(count > 0, avg_alpha, 0)
    return np.stack(
        [(avg >> 16) & 0xFF, (avg >> 8) & 0xFF, avg & 0xFF, avg_alpha], axis=-1
    ).astype(np.uint8)


def dem_average_quad(quads: list[np.ndarray | None], size: int) -> np.ndarray:
    """dem_overview semantics: average *raw* 24-bit values of 2x2 children
    then downscale (dem_overview.rs)."""
    canvas = compose_quad(*quads, size=size, channels=3)
    raw = (
        canvas[..., 0].astype(np.int64) * 65536
        + canvas[..., 1].astype(np.int64) * 256
        + canvas[..., 2].astype(np.int64)
    )
    h, w = raw.shape
    avg = raw.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    avg = np.round(avg).astype(np.int64)
    return np.stack([(avg >> 16) & 0xFF, (avg >> 8) & 0xFF, avg & 0xFF], axis=-1).astype(np.uint8)
