"""Pure-python Zstandard decoder (functions/zstd_dec.py) conformance.

Ground truth: the system libzstd (Debian base install) encodes a corpus
at levels 1..22, with checksummed and concatenated frames; every stream
must decode byte-identically. Stored-mode frames from stored_codecs.py
and hand-built raw/RLE frames pin the framing layer.
"""

from __future__ import annotations

import ctypes
import struct

import numpy as np
import pytest

from versatiles_rs_spark.functions.stored_codecs import zstd_compress_stored
from versatiles_rs_spark.functions.zstd_dec import zstd_decompress


def _lib():
    try:
        return ctypes.CDLL("libzstd.so.1")
    except OSError:
        return None


_z = _lib()
needs_lib = pytest.mark.skipif(_z is None, reason="system libzstd not present")

if _z is not None:
    _z.ZSTD_compressBound.restype = ctypes.c_size_t
    _z.ZSTD_compress.restype = ctypes.c_size_t
    _z.ZSTD_isError.restype = ctypes.c_uint


def lib_compress(data: bytes, level: int = 3) -> bytes:
    bound = _z.ZSTD_compressBound(len(data))
    buf = ctypes.create_string_buffer(bound)
    r = _z.ZSTD_compress(buf, bound, data, len(data), level)
    assert not _z.ZSTD_isError(r)
    return buf.raw[:r]


def test_stored_mode_frames_decode():
    data = b"stored zstd frame" * 64
    assert zstd_decompress(zstd_compress_stored(data)) == data


def test_hand_built_raw_and_rle_blocks():
    # frame: magic, FHD single-segment + 1-byte FCS, raw block + RLE block
    payload_raw, rle_byte, rle_n = b"hand built", 0x41, 20
    total = len(payload_raw) + rle_n
    frame = struct.pack("<I", 0xFD2FB528)
    frame += bytes([0x20, total])  # FHD: single_segment, fcs 1 byte
    frame += struct.pack("<I", (len(payload_raw) << 3) | (0 << 1) | 0)[:3]
    frame += payload_raw
    frame += struct.pack("<I", (rle_n << 3) | (1 << 1) | 1)[:3]
    frame += bytes([rle_byte])
    assert zstd_decompress(frame) == payload_raw + bytes([rle_byte]) * rle_n


@needs_lib
@pytest.mark.parametrize("level", [1, 3, 6, 12, 19, 22])
def test_corpus_parity(level):
    rng = np.random.default_rng(1)
    corpus = [
        b"",
        b"hello world",
        b"a" * 1000,
        b"the quick brown fox jumps over the lazy dog. " * 1000,
        bytes(rng.integers(0, 256, 20000, dtype=np.uint8)),
        bytes(rng.integers(0, 4, 50000, dtype=np.uint8)),
        np.arange(0, 80000, 7, dtype="<u8").tobytes(),  # tile-index-like
        b"spark tile engine " * 20000,  # multi-block (> 128 KiB)
        "тест юникода ユニコード ".encode() * 2000,
    ]
    for payload in corpus:
        assert zstd_decompress(lib_compress(payload, level)) == payload


@needs_lib
def test_checksum_and_multiframe():
    z = _z
    z.ZSTD_createCCtx.restype = ctypes.c_void_p
    z.ZSTD_compress2.restype = ctypes.c_size_t
    z.ZSTD_CCtx_setParameter.restype = ctypes.c_size_t
    cctx = z.ZSTD_createCCtx()
    z.ZSTD_CCtx_setParameter(ctypes.c_void_p(cctx), 201, 1)  # checksumFlag
    payload = b"checksummed frame content " * 500
    bound = z.ZSTD_compressBound(len(payload))
    buf = ctypes.create_string_buffer(bound)
    r = z.ZSTD_compress2(ctypes.c_void_p(cctx), buf, bound, payload, len(payload))
    assert not z.ZSTD_isError(r)
    comp = buf.raw[:r]
    assert zstd_decompress(comp) == payload
    assert zstd_decompress(comp + comp) == payload + payload


def test_dictionary_frames_rejected():
    frame = struct.pack("<I", 0xFD2FB528) + bytes([0x21, 0x07, 0x00])
    with pytest.raises(ValueError, match="dictionary"):
        zstd_decompress(frame)


def test_fuzz_garbage_fails_cleanly():
    import random

    rng = random.Random(0)
    magic = struct.pack("<I", 0xFD2FB528)
    for trial in range(200):
        blob = magic + bytes(rng.randrange(256) for _ in range(rng.randrange(1, 200)))
        try:
            out = zstd_decompress(blob)
            assert len(out) < (1 << 26)
        except Exception:
            pass


@needs_lib
def test_truncated_real_stream_fails_cleanly():
    comp = lib_compress(b"the quick brown fox " * 500, 19)
    for cut in (5, 15, len(comp) // 2, len(comp) - 1):
        try:
            zstd_decompress(comp[:cut])
        except Exception:
            pass
