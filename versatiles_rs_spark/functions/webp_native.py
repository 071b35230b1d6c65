"""WebP encode/decode via the system libwebp (ctypes).

Closes the WebP half of the reference's image-format registry
(versatiles_image supports png/jpg/webp/avif; SURVEY §7 had scoped WebP
out while no codec existed — the Debian base image ships libwebp.so.7).
Same philosophy as brotli_native.py: a system shared library bound with
ctypes, no Python packages; availability-gated so the engine degrades to
png/jpg cleanly when the library is absent.

The simple one-shot C API is used (WebPDecodeRGBA / WebPEncodeRGBA /
WebPEncodeLosslessRGBA + WebPFree), which has been ABI-stable since
libwebp 0.5. Caveat of that API: lossless encoding is exact for OPAQUE
pixels; RGB values under transparent alpha may be normalized by the
encoder (libwebp's exact mode needs the advanced config API).
"""

from __future__ import annotations

import ctypes

import numpy as np


def _load():
    for n in ("libwebp.so.7", "libwebp.so"):
        try:
            return ctypes.CDLL(n)
        except OSError:
            continue
    return None


_w = _load()
HAS_WEBP = _w is not None

if HAS_WEBP:
    _w.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    _w.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    _w.WebPEncodeRGBA.restype = ctypes.c_size_t
    _w.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    _w.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    _w.WebPEncodeLosslessRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    _w.WebPFree.restype = None
    _w.WebPFree.argtypes = [ctypes.c_void_p]


def webp_decode(blob: bytes) -> np.ndarray:
    """WebP bytes -> HxWx4 uint8 RGBA."""
    if not HAS_WEBP:
        raise NotImplementedError("libwebp not available on this host")
    w = ctypes.c_int()
    h = ctypes.c_int()
    ptr = _w.WebPDecodeRGBA(blob, len(blob), ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        raise ValueError("WebP decode failed")
    try:
        n = w.value * h.value * 4
        arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    finally:
        _w.WebPFree(ctypes.cast(ptr, ctypes.c_void_p))
    return arr.reshape(h.value, w.value, 4)


def webp_encode(img: np.ndarray, quality: int | None = 85) -> bytes:
    """HxWx3/4 uint8 -> WebP bytes. quality None => lossless."""
    if not HAS_WEBP:
        raise NotImplementedError("libwebp not available on this host")
    if img.ndim != 3:
        raise ValueError("expected HxWxC image")
    if img.shape[2] == 3:
        img = np.concatenate(
            [img, np.full(img.shape[:2] + (1,), 255, np.uint8)], axis=2
        )
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    data = img.tobytes()
    if quality is None:
        size = _w.WebPEncodeLosslessRGBA(data, w, h, w * 4, ctypes.byref(out))
    else:
        size = _w.WebPEncodeRGBA(data, w, h, w * 4, float(quality), ctypes.byref(out))
    if size == 0:
        raise ValueError("WebP encode failed")
    try:
        return ctypes.string_at(out, size)
    finally:
        _w.WebPFree(ctypes.cast(out, ctypes.c_void_p))
