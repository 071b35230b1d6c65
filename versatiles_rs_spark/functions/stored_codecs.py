"""Pure-python brotli/zstd in STORED mode (no external codec libraries).

The container lacks brotli/zstandard, but the .versatiles container format
mandates Brotli-compressed indexes (versatiles_core/src/compression/methods/
{brotli,zstd}.rs; container/versatiles/types/tile_index.rs:64). Both formats
define *uncompressed* block types, so a spec-conformant stream can be
emitted with zero compression machinery:

- brotli (RFC 7932 §9): a sequence of non-last meta-blocks with
  ISUNCOMPRESSED=1 carrying raw bytes, closed by an empty ISLAST meta-block.
  ANY real brotli decoder (including the reference engine) decodes these
  streams byte-exactly.
- zstd (RFC 8878 §3): a single frame of Raw_Block blocks.

The decoders here handle ONLY the stored subset (enough to round-trip our
own containers); a really-compressed stream raises
``UnsupportedCompressedStream`` with a clear message. That is the honest
sandbox contract: WRITE paths are fully interoperable, READ paths accept
stored-mode + report real compression as unsupported.
"""

from __future__ import annotations


class UnsupportedCompressedStream(NotImplementedError):
    """Stream uses real entropy coding; no codec library in this sandbox."""


# ---------------------------------------------------------------------------
# bit I/O (brotli is LSB-first)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.bitpos = 0  # bits used in the last byte

    def write_bits(self, value: int, nbits: int) -> None:
        for i in range(nbits):
            bit = (value >> i) & 1
            if self.bitpos == 0:
                self.out.append(0)
            if bit:
                self.out[-1] |= 1 << self.bitpos
            self.bitpos = (self.bitpos + 1) % 8

    def align(self) -> None:
        self.bitpos = 0

    def write_bytes(self, data: bytes) -> None:
        assert self.bitpos == 0
        self.out.extend(data)

    def bytes(self) -> bytes:
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # absolute bit position

    def read_bits(self, nbits: int) -> int:
        v = 0
        for i in range(nbits):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("truncated brotli stream")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def read_bytes(self, n: int) -> bytes:
        assert self.pos % 8 == 0
        byte = self.pos >> 3
        if byte + n > len(self.data):
            raise ValueError("truncated brotli stream")
        self.pos += 8 * n
        return self.data[byte : byte + n]


# ---------------------------------------------------------------------------
# brotli stored mode (RFC 7932)
# ---------------------------------------------------------------------------

_BR_CHUNK = 1 << 24  # max MLEN encodable with 6 nibbles


def brotli_compress_stored(data: bytes) -> bytes:
    """data -> valid brotli stream of uncompressed meta-blocks."""
    w = _BitWriter()
    w.write_bits(0, 1)  # WBITS = 16 (single '0' bit, RFC 7932 §9.1)
    pos = 0
    n = len(data)
    while pos < n:
        m = min(_BR_CHUNK, n - pos)
        w.write_bits(0, 1)  # ISLAST = 0
        nib = 4 if m <= (1 << 16) else (5 if m <= (1 << 20) else 6)
        w.write_bits(nib - 4, 2)  # MNIBBLES code
        w.write_bits(m - 1, nib * 4)  # MLEN - 1
        w.write_bits(1, 1)  # ISUNCOMPRESSED
        w.align()
        w.write_bytes(data[pos : pos + m])
        pos += m
    w.write_bits(1, 1)  # ISLAST = 1
    w.write_bits(1, 1)  # ISLASTEMPTY = 1
    return w.bytes()


def brotli_decompress_stored(data: bytes) -> bytes:
    """Decode a stored-mode brotli stream (raises on entropy-coded input)."""
    r = _BitReader(data)
    if r.read_bits(1) != 0:
        raise UnsupportedCompressedStream(
            "brotli stream uses a non-16 window; only stored-mode streams "
            "written by this engine are decodable without a codec library"
        )
    out = bytearray()
    while True:
        islast = r.read_bits(1)
        if islast:
            if r.read_bits(1):  # ISLASTEMPTY
                break
            raise UnsupportedCompressedStream(
                "final brotli meta-block is entropy-coded; install a real "
                "brotli codec to read this container"
            )
        nib_code = r.read_bits(2)
        if nib_code == 3:
            raise UnsupportedCompressedStream("brotli metadata meta-block unsupported")
        nib = nib_code + 4
        mlen = r.read_bits(nib * 4) + 1
        if r.read_bits(1) != 1:  # ISUNCOMPRESSED
            raise UnsupportedCompressedStream(
                "brotli meta-block is entropy-coded; install a real brotli "
                "codec to read this container"
            )
        r.align()
        out.extend(r.read_bytes(mlen))
    return bytes(out)


# ---------------------------------------------------------------------------
# zstd raw-block mode (RFC 8878)
# ---------------------------------------------------------------------------

_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"
_ZSTD_CHUNK = (1 << 21) - 1  # block size field is 21 bits


def zstd_compress_stored(data: bytes) -> bytes:
    """data -> valid zstd frame of Raw_Block blocks (single-segment)."""
    out = bytearray(_ZSTD_MAGIC)
    n = len(data)
    # frame header descriptor: single_segment=1 (bit 5); FCS flag from size
    if n < 256:
        out.append(0x20)  # fcs 1 byte
        out += n.to_bytes(1, "little")
    elif n <= 0xFFFF + 256:
        out.append(0x60)  # fcs flag 1 -> 2 bytes, stored as n - 256
        out += (n - 256).to_bytes(2, "little")
    else:
        out.append(0xA0)  # fcs flag 2 -> 4 bytes
        out += n.to_bytes(4, "little")
    pos = 0
    if n == 0:
        out += (1).to_bytes(3, "little")  # last=1, type=raw, size=0
        return bytes(out)
    while pos < n:
        m = min(_ZSTD_CHUNK, n - pos)
        last = 1 if pos + m >= n else 0
        header = last | (0 << 1) | (m << 3)  # type 0 = Raw_Block
        out += header.to_bytes(3, "little")
        out += data[pos : pos + m]
        pos += m
    return bytes(out)


def zstd_decompress_stored(data: bytes) -> bytes:
    """Decode a raw-block zstd frame (raises on compressed blocks)."""
    if data[:4] != _ZSTD_MAGIC:
        raise ValueError("not a zstd frame")
    fhd = data[4]
    i = 5
    single_segment = (fhd >> 5) & 1
    if fhd & 0x03:
        raise UnsupportedCompressedStream("zstd dictionary frames unsupported")
    if not single_segment:
        i += 1  # window descriptor
    fcs_flag = fhd >> 6
    fcs_bytes = {0: 1 if single_segment else 0, 1: 2, 2: 4, 3: 8}[fcs_flag]
    i += fcs_bytes
    out = bytearray()
    while True:
        header = int.from_bytes(data[i : i + 3], "little")
        i += 3
        last = header & 1
        btype = (header >> 1) & 3
        size = header >> 3
        if btype != 0:
            raise UnsupportedCompressedStream(
                "zstd block is compressed; install a real zstd codec to read "
                "this container"
            )
        out.extend(data[i : i + size])
        i += size
        if last:
            break
    return bytes(out)
