"""AVIF encode/decode via the system libheif (ctypes, opaque handles).

Closes the AVIF row of the image-format registry. libheif's C API uses
opaque pointers everywhere except `heif_error` (a small POD returned by
value, declared below), which makes it safe to bind blind — unlike
libavif's public structs. Debian ships libheif.so.1 with AV1 encode and
decode plugins.

AVIF here is LOSSY-only (quality 0..100): AV1's RGB-lossless mode needs
identity-matrix signaling this libheif version doesn't expose, so a
quality>=100 request still goes through the encoder's highest lossy
setting. Decode accepts any AVIF/HEIF the plugins support and returns
RGBA.
"""

from __future__ import annotations

import ctypes
import os
import tempfile

import numpy as np


class _HeifError(ctypes.Structure):
    _fields_ = [
        ("code", ctypes.c_int),
        ("subcode", ctypes.c_int),
        ("message", ctypes.c_char_p),
    ]


def _load():
    for n in ("libheif.so.1", "libheif.so"):
        try:
            return ctypes.CDLL(n)
        except OSError:
            continue
    return None


_h = _load()
HAS_AVIF = False
_RGB, _RGBA_ILV, _CH_ILV, _AV1 = 1, 11, 10, 4

if _h is not None:
    try:
        _h.heif_context_alloc.restype = ctypes.c_void_p
        _h.heif_context_free.restype = None
        _h.heif_context_free.argtypes = [ctypes.c_void_p]
        _h.heif_image_create.restype = _HeifError
        _h.heif_image_create.argtypes = [ctypes.c_int] * 4 + [ctypes.POINTER(ctypes.c_void_p)]
        _h.heif_image_release.restype = None
        _h.heif_image_release.argtypes = [ctypes.c_void_p]
        _h.heif_image_add_plane.restype = _HeifError
        _h.heif_image_add_plane.argtypes = [ctypes.c_void_p] + [ctypes.c_int] * 4
        _h.heif_image_get_plane.restype = ctypes.POINTER(ctypes.c_uint8)
        _h.heif_image_get_plane.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
        _h.heif_image_get_plane_readonly.restype = ctypes.POINTER(ctypes.c_uint8)
        _h.heif_image_get_plane_readonly.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
        _h.heif_context_get_encoder_for_format.restype = _HeifError
        _h.heif_context_get_encoder_for_format.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_void_p)
        ]
        _h.heif_encoder_release.restype = None
        _h.heif_encoder_release.argtypes = [ctypes.c_void_p]
        _h.heif_encoder_set_lossy_quality.restype = _HeifError
        _h.heif_encoder_set_lossy_quality.argtypes = [ctypes.c_void_p, ctypes.c_int]
        _h.heif_context_encode_image.restype = _HeifError
        _h.heif_context_encode_image.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p),
        ]
        _h.heif_context_write_to_file.restype = _HeifError
        _h.heif_context_write_to_file.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        _h.heif_context_read_from_memory_without_copy.restype = _HeifError
        _h.heif_context_read_from_memory_without_copy.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p
        ]
        _h.heif_context_get_primary_image_handle.restype = _HeifError
        _h.heif_context_get_primary_image_handle.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p)
        ]
        _h.heif_image_handle_release.restype = None
        _h.heif_image_handle_release.argtypes = [ctypes.c_void_p]
        _h.heif_image_handle_get_width.restype = ctypes.c_int
        _h.heif_image_handle_get_width.argtypes = [ctypes.c_void_p]
        _h.heif_image_handle_get_height.restype = ctypes.c_int
        _h.heif_image_handle_get_height.argtypes = [ctypes.c_void_p]
        _h.heif_decode_image.restype = _HeifError
        _h.heif_decode_image.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p),
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ]
        _h.heif_have_decoder_for_format.restype = ctypes.c_int
        HAS_AVIF = bool(_h.heif_have_decoder_for_format(_AV1))
    except (AttributeError, OSError):
        HAS_AVIF = False


def _chk(err: _HeifError) -> None:
    if err.code != 0:
        raise ValueError(f"libheif error {err.code}: {(err.message or b'').decode()}")


def avif_encode(img: np.ndarray, quality: int = 85) -> bytes:
    """HxWx3/4 uint8 -> AVIF bytes (AV1, lossy)."""
    if not HAS_AVIF:
        raise NotImplementedError("libheif AV1 support not available on this host")
    if img.shape[2] == 3:
        img = np.concatenate([img, np.full(img.shape[:2] + (1,), 255, np.uint8)], axis=2)
    hh, ww = img.shape[:2]
    ctx = _h.heif_context_alloc()
    him = ctypes.c_void_p()
    enc = ctypes.c_void_p()
    try:
        _chk(_h.heif_image_create(ww, hh, _RGB, _RGBA_ILV, ctypes.byref(him)))
        _chk(_h.heif_image_add_plane(him, _CH_ILV, ww, hh, 8))
        stride = ctypes.c_int()
        ptr = _h.heif_image_get_plane(him, _CH_ILV, ctypes.byref(stride))
        st = stride.value
        buf = (ctypes.c_uint8 * (st * hh)).from_address(ctypes.addressof(ptr.contents))
        np.frombuffer(buf, dtype=np.uint8).reshape(hh, st)[:, : ww * 4] = (
            np.ascontiguousarray(img, dtype=np.uint8).reshape(hh, ww * 4)
        )
        _chk(_h.heif_context_get_encoder_for_format(ctx, _AV1, ctypes.byref(enc)))
        _chk(_h.heif_encoder_set_lossy_quality(enc, min(int(quality), 100)))
        handle = ctypes.c_void_p()
        _chk(_h.heif_context_encode_image(ctx, him, enc, None, ctypes.byref(handle)))
        _h.heif_image_handle_release(handle)
        fd, path = tempfile.mkstemp(suffix=".avif")
        os.close(fd)
        try:
            _chk(_h.heif_context_write_to_file(ctx, path.encode()))
            with open(path, "rb") as f:
                return f.read()
        finally:
            os.unlink(path)
    finally:
        if enc:
            _h.heif_encoder_release(enc)
        if him:
            _h.heif_image_release(him)
        _h.heif_context_free(ctx)


def avif_decode(blob: bytes) -> np.ndarray:
    """AVIF/HEIF bytes -> HxWx4 uint8 RGBA."""
    if not HAS_AVIF:
        raise NotImplementedError("libheif AV1 support not available on this host")
    ctx = _h.heif_context_alloc()
    handle = ctypes.c_void_p()
    dimg = ctypes.c_void_p()
    try:
        _chk(_h.heif_context_read_from_memory_without_copy(ctx, blob, len(blob), None))
        _chk(_h.heif_context_get_primary_image_handle(ctx, ctypes.byref(handle)))
        ww = _h.heif_image_handle_get_width(handle)
        hh = _h.heif_image_handle_get_height(handle)
        _chk(_h.heif_decode_image(handle, ctypes.byref(dimg), _RGB, _RGBA_ILV, None))
        stride = ctypes.c_int()
        ptr = _h.heif_image_get_plane_readonly(dimg, _CH_ILV, ctypes.byref(stride))
        st = stride.value
        buf = (ctypes.c_uint8 * (st * hh)).from_address(ctypes.addressof(ptr.contents))
        out = np.frombuffer(buf, dtype=np.uint8).reshape(hh, st)[:, : ww * 4].copy()
        return out.reshape(hh, ww, 4)
    finally:
        if dimg:
            _h.heif_image_release(dimg)
        if handle:
            _h.heif_image_handle_release(handle)
        _h.heif_context_free(ctx)
