"""Tile compression codecs — gzip / zlib-raw / (zstd, brotli when available).

API mirrors versatiles_core/src/compression/functions.rs:54-230
(``compress`` / ``decompress`` / ``recompress`` / ``optimize_compression``).
Gzip uses fixed level 9 + mtime 0 so output bytes are deterministic
(required for golden byte-equality tests). Brotli/zstd resolve in order:
system shared library via ctypes (brotli_native.py — full-speed interop
with reference-produced containers), then the pure-python decoders
(brotli_dec.py RFC 7932 / zstd_dec.py RFC 8878, read side), then
spec-valid stored-mode streams (stored_codecs.py, write side).
"""

from __future__ import annotations

import gzip as _gzip
import zlib

from versatiles_rs_spark.functions import brotli_native as _native

UNCOMPRESSED = "none"
GZIP = "gzip"
BROTLI = "brotli"
ZSTD = "zstd"


def available_codecs() -> list[str]:
    """All four codecs are always writable: when the real brotli/zstd libs
    are absent, streams are emitted in spec-conformant STORED mode (valid
    per RFC 7932/8878 — any real decoder reads them; see stored_codecs.py).
    Reading an entropy-coded stream without the lib raises a clear error."""
    return [UNCOMPRESSED, GZIP, BROTLI, ZSTD]


def compress(data: bytes, codec: str) -> bytes:
    if codec == UNCOMPRESSED:
        return data
    if codec == GZIP:
        # mtime=0 => deterministic bytes across runs
        return _gzip.compress(data, compresslevel=9, mtime=0)
    if codec == BROTLI:
        if _native.HAS_BROTLI_ENC:
            return _native.brotli_compress_native(data)
        from versatiles_rs_spark.functions.stored_codecs import brotli_compress_stored

        return brotli_compress_stored(data)
    if codec == ZSTD:
        if _native.HAS_ZSTD:
            return _native.zstd_compress_native(data)
        from versatiles_rs_spark.functions.stored_codecs import zstd_compress_stored

        return zstd_compress_stored(data)
    raise ValueError(f"codec {codec!r} unavailable (have: {available_codecs()})")


def compress_gzip_fast(data: bytes) -> bytes:
    """Low-latency gzip (level 1, deterministic mtime 0) — the
    compress_gzip_fast variant (reference compression/methods/gzip.rs:52):
    serve-path recompression where response latency beats ratio. The
    default ``compress`` stays at level 9 (= the reference's
    Compression::best default), which the byte-golden tests pin."""
    return _gzip.compress(data, compresslevel=1, mtime=0)


def decompress(data: bytes, codec: str) -> bytes:
    if codec == UNCOMPRESSED:
        return data
    if codec == GZIP:
        return _gzip.decompress(data)
    if codec == BROTLI:
        if _native.HAS_BROTLI_DEC:
            return _native.brotli_decompress_native(data)
        from versatiles_rs_spark.functions.brotli_dec import brotli_decompress as _pp

        return _pp(data)  # pure-python full RFC 7932 decode
    if codec == ZSTD:
        if _native.HAS_ZSTD:
            return _native.zstd_decompress_native(data)
        from versatiles_rs_spark.functions.zstd_dec import zstd_decompress as _zpp

        return _zpp(data)  # pure-python full RFC 8878 decode
    raise ValueError(f"codec {codec!r} unavailable")


def recompress(data: bytes, src: str, dst: str) -> bytes:
    """functions.rs:176 — no-op when codecs match (lazy-decode parity)."""
    if src == dst:
        return data
    return compress(decompress(data, src), dst)


def _real_codecs() -> list[str]:
    """Codecs that actually shrink data (stored-mode fallbacks excluded —
    they are format-valid but inflate, so never PREFER them)."""
    out = [UNCOMPRESSED, GZIP]
    if _native.HAS_BROTLI_ENC:
        out.append(BROTLI)
    if _native.HAS_ZSTD:
        out.append(ZSTD)
    return out


def optimize_compression(data: bytes, codec: str, accepted: list[str]) -> tuple[bytes, str]:
    """functions.rs:54 — keep the current codec when the client accepts it,
    else recompress to the best accepted codec (first in preference order)."""
    if codec in accepted:
        return data, codec
    for pref in (BROTLI, ZSTD, GZIP, UNCOMPRESSED):
        if pref in accepted and (pref in _real_codecs()):
            return recompress(data, codec, pref), pref
    return decompress(data, codec), UNCOMPRESSED


def gzip_crc_ok(data: bytes) -> bool:
    """Cheap integrity probe used by the validation job."""
    try:
        zlib.decompress(data[10:], -zlib.MAX_WBITS)  # skip gzip header; raw inflate
        return True
    except zlib.error:
        try:
            _gzip.decompress(data)
            return True
        except OSError:
            return False
