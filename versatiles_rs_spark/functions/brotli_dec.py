"""Pure-python Brotli decoder (RFC 7932, decode-only).

Closes the round-2 interop gap: the reference engine writes .versatiles /
.pmtiles directories and tile payloads with real entropy-coded Brotli
(compression/methods/brotli.rs quality=10, lgwin=19;
container/versatiles/types/tile_index.rs:64), which the stored-subset
reader could not ingest. This module implements the full bitstream:
window header, uncompressed/metadata/compressed meta-blocks, simple and
complex prefix codes, block-switch commands for all three categories,
context modes (LSB6/MSB6/UTF8/Signed) with context maps (RLE + inverse
move-to-front), the distance ring buffer, and NPOSTFIX/NDIRECT distance
composition.

Static-dictionary references (§8) are fully supported: the 121 word
transforms are implemented here (appendix B data), and the 122 KB
dictionary blob is pulled from the system libbrotlicommon at first use
(it is spec data, not code — extracting it avoids vendoring 122 KB).
Without that library, only streams containing dictionary references
raise ``UnsupportedCompressedStream``; everything else decodes.

Everything here derives from the public RFC. Validation
(tests/test_brotli.py): byte-exact decode of the reference repo's
third-party ``static.tar.br``; a corpus encoded by the system libbrotli
at every quality 0..11 and window 10..24; hand-packed bit vectors
written directly from the RFC; and cross-checks of the embedded context
/ transform tables against the library's own.
"""

from __future__ import annotations

from versatiles_rs_spark.functions.stored_codecs import UnsupportedCompressedStream

# ---------------------------------------------------------------------------
# constants (RFC 7932)
# ---------------------------------------------------------------------------

# order in which code-length-code lengths are transmitted (§3.5)
_CL_ORDER = [1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15]
# static prefix code for the code-length alphabet {0..5}: lengths per symbol
_CL_STATIC_LENGTHS = [2, 4, 3, 2, 2, 4]

# insert-length codes 0..23: (extra bits, base)  (§5 table)
_INSERT_EXTRA = [0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9, 10, 12, 14, 24]
_INSERT_BASE = [0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34, 50, 66, 98, 130, 194,
                322, 578, 1090, 2114, 6210, 22594]
# copy-length codes 0..23
_COPY_EXTRA = [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9, 10, 24]
_COPY_BASE = [2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22, 30, 38, 54, 70, 102,
              134, 198, 326, 582, 1094, 2118]
# (insert range, copy range) start offsets per cmd>>6 cell after the
# distance-zero cells are folded (§5)
_INSERT_RANGE_LUT = [0, 0, 8, 8, 0, 16, 8, 16, 16]
_COPY_RANGE_LUT = [0, 8, 0, 8, 16, 0, 16, 8, 16]

# block-count codes 0..25: (extra bits, base) (§6)
_BLOCK_COUNT_EXTRA = [2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 6, 6,
                      7, 8, 9, 10, 11, 12, 13, 24]
_BLOCK_COUNT_BASE = [1, 5, 9, 13, 17, 25, 33, 41, 49, 65, 81, 97, 113, 145,
                     177, 209, 241, 305, 369, 497, 753, 1265, 2289, 4337,
                     8433, 16625]

# context lookup tables (§7.1 / appendix B). UTF8: CID = LUT0[p1] | LUT1[p2].
# Byte-for-byte the RFC's tables (cross-checked in tests against the system
# libbrotli's kBrotliContextLookupTable where the library is present).
_UTF8_LUT0 = bytes([
    0, 0, 0, 0, 0, 0, 0, 0, 0, 4, 4, 0, 0, 4, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    8, 12, 16, 12, 12, 20, 12, 16, 24, 28, 12, 12, 32, 12, 36, 12,
    44, 44, 44, 44, 44, 44, 44, 44, 44, 44, 32, 32, 24, 40, 28, 12,
    12, 48, 52, 52, 52, 48, 52, 52, 52, 48, 52, 52, 52, 52, 52, 48,
    52, 52, 52, 52, 52, 48, 52, 52, 52, 52, 52, 24, 12, 28, 12, 12,
    12, 56, 60, 60, 60, 56, 60, 60, 60, 56, 60, 60, 60, 60, 60, 56,
    60, 60, 60, 60, 60, 56, 60, 60, 60, 60, 60, 24, 12, 28, 12, 0,
    0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1,
    0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1,
    0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1,
    0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1,
    2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3,
    2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3,
    2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3,
    2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3,
])
_UTF8_LUT1 = bytes([
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1,
    1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1,
    1, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3,
    3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 1, 1, 1, 1, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
])

_SIGNED_LUT = bytearray(256)
for _i in range(256):
    if _i == 0:
        _SIGNED_LUT[_i] = 0
    elif _i <= 15:
        _SIGNED_LUT[_i] = 1
    elif _i <= 63:
        _SIGNED_LUT[_i] = 2
    elif _i <= 127:
        _SIGNED_LUT[_i] = 3
    elif _i <= 191:
        _SIGNED_LUT[_i] = 4
    elif _i <= 239:
        _SIGNED_LUT[_i] = 5
    elif _i <= 254:
        _SIGNED_LUT[_i] = 6
    else:
        _SIGNED_LUT[_i] = 7


# ---------------------------------------------------------------------------
# static dictionary (§8 / appendix A+B)
# ---------------------------------------------------------------------------

# words-per-length in bits, lengths 0..24 (appendix A: NDBITS)
_DICT_NDBITS = [0, 0, 0, 0, 10, 10, 11, 11, 10, 10, 10, 10, 10, 9, 9, 8,
                7, 7, 8, 7, 7, 6, 6, 5, 5]

# the 121 word transforms (appendix B): (prefix, kind, omit_count, suffix).
# kind: I=identity, OF=omit first N, OL=omit last N, UF=ferment first
# (uppercase-first, UTF8-aware), UA=ferment all. The table below is the
# RFC's list, cross-verified word-by-word against the system libbrotli's
# BrotliTransformDictionaryWord in tests/test_brotli.py.
_TRANSFORMS = [
    (b"", "I", 0, b""), (b"", "I", 0, b" "), (b" ", "I", 0, b" "),
    (b"", "OF", 1, b""), (b"", "UF", 0, b" "), (b"", "I", 0, b" the "),
    (b" ", "I", 0, b""), (b"s ", "I", 0, b" "), (b"", "I", 0, b" of "),
    (b"", "UF", 0, b""), (b"", "I", 0, b" and "), (b"", "OF", 2, b""),
    (b"", "OL", 1, b""), (b", ", "I", 0, b" "), (b"", "I", 0, b", "),
    (b" ", "UF", 0, b" "), (b"", "I", 0, b" in "), (b"", "I", 0, b" to "),
    (b"e ", "I", 0, b" "), (b"", "I", 0, b'"'), (b"", "I", 0, b"."),
    (b"", "I", 0, b'">'), (b"", "I", 0, b"\n"), (b"", "OL", 3, b""),
    (b"", "I", 0, b"]"), (b"", "I", 0, b" for "), (b"", "OF", 3, b""),
    (b"", "OL", 2, b""), (b"", "I", 0, b" a "), (b"", "I", 0, b" that "),
    (b" ", "UF", 0, b""), (b"", "I", 0, b". "), (b".", "I", 0, b""),
    (b" ", "I", 0, b", "), (b"", "OF", 4, b""), (b"", "I", 0, b" with "),
    (b"", "I", 0, b"'"), (b"", "I", 0, b" from "), (b"", "I", 0, b" by "),
    (b"", "OF", 5, b""), (b"", "OF", 6, b""), (b" the ", "I", 0, b""),
    (b"", "OL", 4, b""), (b"", "I", 0, b". The "), (b"", "UA", 0, b""),
    (b"", "I", 0, b" on "), (b"", "I", 0, b" as "), (b"", "I", 0, b" is "),
    (b"", "OL", 7, b""), (b"", "OL", 1, b"ing "), (b"", "I", 0, b"\n\t"),
    (b"", "I", 0, b":"), (b" ", "I", 0, b". "), (b"", "I", 0, b"ed "),
    (b"", "OF", 9, b""), (b"", "OF", 7, b""), (b"", "OL", 6, b""),
    (b"", "I", 0, b"("), (b"", "UF", 0, b", "), (b"", "OL", 8, b""),
    (b"", "I", 0, b" at "), (b"", "I", 0, b"ly "), (b" the ", "I", 0, b" of "),
    (b"", "OL", 5, b""), (b"", "OL", 9, b""), (b" ", "UF", 0, b", "),
    (b"", "UF", 0, b'"'), (b".", "I", 0, b"("), (b"", "UA", 0, b" "),
    (b"", "UF", 0, b'">'), (b"", "I", 0, b'="'), (b" ", "I", 0, b"."),
    (b".com/", "I", 0, b""), (b" the ", "I", 0, b" of the "),
    (b"", "UF", 0, b"'"), (b"", "I", 0, b". This "), (b"", "I", 0, b","),
    (b".", "I", 0, b" "), (b"", "UF", 0, b"("), (b"", "UF", 0, b"."),
    (b"", "I", 0, b" not "), (b" ", "I", 0, b'="'), (b"", "I", 0, b"er "),
    (b" ", "UA", 0, b" "), (b"", "I", 0, b"al "), (b" ", "UA", 0, b""),
    (b"", "I", 0, b"='"), (b"", "UA", 0, b'"'), (b"", "UF", 0, b". "),
    (b" ", "I", 0, b"("), (b"", "I", 0, b"ful "), (b" ", "UF", 0, b". "),
    (b"", "I", 0, b"ive "), (b"", "I", 0, b"less "), (b"", "UA", 0, b"'"),
    (b"", "I", 0, b"est "), (b" ", "UF", 0, b"."), (b"", "UA", 0, b'">'),
    (b" ", "I", 0, b"='"), (b"", "UF", 0, b","), (b"", "I", 0, b"ize "),
    (b"", "UA", 0, b"."), (b"\xc2\xa0", "I", 0, b""), (b" ", "I", 0, b","),
    (b"", "UF", 0, b'="'), (b"", "UA", 0, b'="'), (b"", "I", 0, b"ous "),
    (b"", "UA", 0, b", "), (b"", "UF", 0, b"='"), (b" ", "UF", 0, b","),
    (b" ", "UA", 0, b'="'), (b" ", "UA", 0, b", "), (b"", "UA", 0, b","),
    (b"", "UA", 0, b"("), (b"", "UA", 0, b". "), (b" ", "UA", 0, b"."),
    (b"", "UA", 0, b"='"), (b" ", "UA", 0, b". "), (b" ", "UF", 0, b'="'),
    (b" ", "UA", 0, b"='"), (b" ", "UF", 0, b"='"),
]


def _ferment(buf: bytearray, pos: int) -> int:
    """UTF8-aware uppercasing step (§8): returns bytes consumed."""
    c = buf[pos]
    if c < 192:
        if 97 <= c <= 122:
            buf[pos] ^= 32
        return 1
    if c < 224:
        if pos + 1 < len(buf):
            buf[pos + 1] ^= 32
        return 2
    if pos + 2 < len(buf):
        buf[pos + 2] ^= 5
    return 3


def _apply_transform(word: bytes, tid: int) -> bytes:
    prefix, kind, n, suffix = _TRANSFORMS[tid]
    if kind == "OF":
        w = bytearray(word[n:])
    elif kind == "OL":
        w = bytearray(word[:-n])
    else:
        w = bytearray(word)
        if kind == "UF":
            if w:
                _ferment(w, 0)
        elif kind == "UA":
            pos = 0
            while pos < len(w):
                pos += _ferment(w, pos)
    return prefix + bytes(w) + suffix


_DICT_CACHE: list = []


def _system_dictionary() -> tuple[bytes, list[int]] | None:
    """Extract the RFC 7932 static dictionary blob (122,784 bytes) from the
    system's libbrotlicommon via ctypes. The blob is spec data, not code;
    pulling it from the installed library avoids vendoring 122KB. Returns
    (data, offsets_by_length) or None when the library is absent."""
    if _DICT_CACHE:
        return _DICT_CACHE[0]
    result = None
    try:
        import ctypes

        class _BD(ctypes.Structure):
            _fields_ = [
                ("size_bits_by_length", ctypes.c_uint8 * 32),
                ("offsets_by_length", ctypes.c_uint32 * 32),
                ("data_size", ctypes.c_size_t),
                ("data", ctypes.POINTER(ctypes.c_uint8)),
            ]

        lib = ctypes.CDLL("libbrotlicommon.so.1")
        lib.BrotliGetDictionary.restype = ctypes.POINTER(_BD)
        d = lib.BrotliGetDictionary().contents
        if list(d.size_bits_by_length)[:25] != _DICT_NDBITS:
            raise ValueError("unexpected dictionary layout")
        data = bytes(
            ctypes.cast(d.data, ctypes.POINTER(ctypes.c_uint8 * d.data_size)).contents
        )
        result = (data, [d.offsets_by_length[i] for i in range(25)])
    except Exception:
        result = None
    _DICT_CACHE.append(result)
    return result


def _dict_word(copy_len: int, word_id: int) -> bytes:
    """Resolve a static-dictionary reference (§8): word_id splits into
    (transform_id, index) by the per-length dictionary size."""
    sysdict = _system_dictionary()
    if sysdict is None:
        raise UnsupportedCompressedStream(
            "brotli static dictionary reference, and libbrotlicommon is not "
            "available to supply the 122KB RFC 7932 dictionary blob"
        )
    data, offsets = sysdict
    ndbits = _DICT_NDBITS[copy_len]
    index = word_id & ((1 << ndbits) - 1)
    tid = word_id >> ndbits
    if tid >= len(_TRANSFORMS):
        raise ValueError(f"invalid dictionary transform {tid}")
    off = offsets[copy_len] + copy_len * index
    return _apply_transform(data[off : off + copy_len], tid)


# ---------------------------------------------------------------------------
# bit reader (LSB-first; prefix codes descend MSB-first like DEFLATE)
# ---------------------------------------------------------------------------

class _Reader:
    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.nbits = len(data) * 8

    def bits(self, n: int) -> int:
        if self.pos + n > self.nbits:
            raise ValueError("truncated brotli stream")
        v = 0
        p = self.pos
        d = self.data
        for i in range(n):
            v |= ((d[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
            self.pos += 1
        self.pos = p + n
        return v

    def bit(self) -> int:
        if self.pos >= self.nbits:
            raise ValueError("truncated brotli stream")
        v = (self.data[self.pos >> 3] >> (self.pos & 7)) & 1
        self.pos += 1
        return v

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def raw(self, n: int) -> bytes:
        assert self.pos % 8 == 0
        b = self.pos >> 3
        if b + n > len(self.data):
            raise ValueError("truncated brotli stream")
        self.pos += n * 8
        return self.data[b : b + n]


# ---------------------------------------------------------------------------
# prefix codes
# ---------------------------------------------------------------------------

class _Huff:
    """Canonical prefix decoder (DEFLATE-style assignment, §3.2): fast path
    is a single-level lookup table over the next ``root_bits`` LSB-first
    bits; longer codes fall back to the map walk."""

    __slots__ = ("map", "max_len", "table", "root_bits", "fixed")

    def __init__(self, lengths: list[int]) -> None:
        self.fixed: int | None = None  # zero-bit single-symbol code
        self.map: dict[tuple[int, int], int] = {}
        max_len = 0
        # canonical: codes assigned in order of (length, symbol)
        count: dict[int, int] = {}
        for ln in lengths:
            if ln:
                count[ln] = count.get(ln, 0) + 1
                max_len = max(max_len, ln)
        code = 0
        next_code: dict[int, int] = {}
        for ln in range(1, max_len + 1):
            code = (code + count.get(ln - 1, 0)) << 1
            next_code[ln] = code
        for sym, ln in enumerate(lengths):
            if ln:
                self.map[(ln, next_code[ln])] = sym
                next_code[ln] += 1
        self.max_len = max_len
        # build the flat table: for every pattern of root_bits stream bits
        # (LSB-first order), precompute (symbol, code_len) when the code
        # completes within root_bits
        self.root_bits = rb = min(max_len, 8) if max_len else 0
        table: list[tuple[int, int] | None] = [None] * (1 << rb)
        for (ln, code), sym in self.map.items():
            if ln > rb:
                continue
            # stream bits arrive MSB-of-code first; bit i of the stream is
            # code bit (ln-1-i). Expand the remaining rb-ln free bits.
            base = 0
            for i in range(ln):
                base |= ((code >> (ln - 1 - i)) & 1) << i
            for fill in range(1 << (rb - ln)):
                table[base | (fill << ln)] = (sym, ln)
        self.table = table

    def decode(self, br: _Reader) -> int:
        if self.fixed is not None:
            return self.fixed
        rb = self.root_bits
        pos = br.pos
        if rb and pos + rb <= br.nbits:
            d = br.data
            v = 0
            for i in range(rb):
                v |= ((d[(pos + i) >> 3] >> ((pos + i) & 7)) & 1) << i
            hit = self.table[v]
            if hit is not None:
                br.pos = pos + hit[1]
                return hit[0]
        # slow path: walk bit by bit
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.bit()
            sym = self.map.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix code in brotli stream")


_CL_HUFF = _Huff(_CL_STATIC_LENGTHS)


def _read_varlen_count(br: _Reader) -> int:
    """NBLTYPES / NTREES variable-length count, 1..256 (§9.2)."""
    if not br.bit():
        return 1
    n = br.bits(3)
    if n == 0:
        return 2
    return (1 << n) + 1 + br.bits(n)


def _read_prefix_code(br: _Reader, alphabet_size: int) -> _Huff:
    """§3.4 (simple) / §3.5 (complex) prefix-code descriptor."""
    hskip = br.bits(2)
    if hskip == 1:  # simple
        nsym = br.bits(2) + 1
        abits = max(1, (alphabet_size - 1).bit_length())
        syms = [br.bits(abits) for _ in range(nsym)]
        for s in syms:
            if s >= alphabet_size:
                raise ValueError("simple prefix symbol out of range")
        if len(set(syms)) != nsym:
            raise ValueError("duplicate symbols in simple prefix code")
        lengths = [0] * alphabet_size
        if nsym == 1:
            h = _Huff(lengths)
            h.fixed = syms[0]  # zero bits consumed per decode
            return h
        if nsym == 2:
            syms.sort()
            lengths[syms[0]] = lengths[syms[1]] = 1
        elif nsym == 3:
            if syms[1] > syms[2]:
                syms[1], syms[2] = syms[2], syms[1]
            lengths[syms[0]] = 1
            lengths[syms[1]] = lengths[syms[2]] = 2
        else:
            if br.bit():  # tree-select: lengths 1,2,3,3
                if syms[2] > syms[3]:
                    syms[2], syms[3] = syms[3], syms[2]
                lengths[syms[0]] = 1
                lengths[syms[1]] = 2
                lengths[syms[2]] = lengths[syms[3]] = 3
            else:
                syms.sort()
                for s in syms:
                    lengths[s] = 2
        return _Huff(lengths)

    # complex: read code-length-code lengths with the static code
    cl_lengths = [0] * 18
    space = 32
    num_codes = 0
    for sym in _CL_ORDER[hskip:]:
        ln = _CL_HUFF.decode(br)
        if ln:
            cl_lengths[sym] = ln
            num_codes += 1
            space -= 32 >> ln
            if space <= 0:
                break
    if num_codes != 1 and space != 0:
        raise ValueError("code-length code over/under-subscribed")
    if num_codes == 1:
        # a single code-length symbol decodes with zero bits (§3.5)
        cl_huff = _Huff([0] * 18)
        cl_huff.fixed = next(i for i, ln in enumerate(cl_lengths) if ln)
    else:
        cl_huff = _Huff(cl_lengths)

    lengths = [0] * alphabet_size
    symbol = 0
    space = 32768
    prev_len = 8
    repeat = 0
    repeat_len = 0
    while symbol < alphabet_size and space > 0:
        code = cl_huff.decode(br)
        if code < 16:
            repeat = 0
            lengths[symbol] = code
            symbol += 1
            if code:
                prev_len = code
                space -= 32768 >> code
        else:
            extra = 2 if code == 16 else 3
            new_len = prev_len if code == 16 else 0
            if repeat_len != new_len:
                repeat = 0
                repeat_len = new_len
            old = repeat
            if repeat > 0:
                repeat = (repeat - 2) << extra
            repeat += br.bits(extra) + 3
            delta = repeat - old
            if symbol + delta > alphabet_size:
                raise ValueError("repeat past end of alphabet")
            for _ in range(delta):
                lengths[symbol] = repeat_len
                symbol += 1
            if repeat_len:
                space -= delta * (32768 >> repeat_len)
    if space != 0:
        raise ValueError("prefix code over/under-subscribed")
    return _Huff(lengths)


def _read_context_map(br: _Reader, n_trees: int, size: int) -> bytes:
    """§7.3: RLE-of-zeros + prefix code + optional inverse MTF."""
    if n_trees == 1:
        return bytes(size)
    rlemax = (br.bits(4) + 1) if br.bit() else 0
    huff = _read_prefix_code(br, n_trees + rlemax)
    cmap = bytearray(size)
    i = 0
    while i < size:
        sym = huff.decode(br)
        if sym == 0:
            cmap[i] = 0
            i += 1
        elif sym <= rlemax:
            reps = (1 << sym) + br.bits(sym)
            if i + reps > size:
                raise ValueError("context map RLE overflow")
            i += reps  # zeros
        else:
            cmap[i] = sym - rlemax
            i += 1
    if br.bit():  # IMTF
        mtf = list(range(256))
        for j in range(size):
            v = cmap[j]
            cmap[j] = mtf[v]
            if v:
                mtf.insert(0, mtf.pop(v))
    return bytes(cmap)


class _BlockState:
    """Block-switch machinery for one category (§6)."""

    __slots__ = ("n", "btype", "prev", "blen", "type_huff", "count_huff")

    def __init__(self, br: _Reader) -> None:
        self.n = _read_varlen_count(br)
        self.btype = 0
        self.prev = 1
        if self.n >= 2:
            self.type_huff = _read_prefix_code(br, self.n + 2)
            self.count_huff = _read_prefix_code(br, 26)
            self.blen = self._count(br)
        else:
            self.type_huff = None
            self.count_huff = None
            self.blen = 1 << 28

    def _count(self, br: _Reader) -> int:
        sym = self.count_huff.decode(br)
        return _BLOCK_COUNT_BASE[sym] + br.bits(_BLOCK_COUNT_EXTRA[sym])

    def tick(self, br: _Reader) -> None:
        if self.blen == 0:
            sym = self.type_huff.decode(br)
            if sym == 0:
                new = self.prev
            elif sym == 1:
                new = (self.btype + 1) % self.n
            else:
                new = sym - 2
            self.prev = self.btype
            self.btype = new
            self.blen = self._count(br)
        self.blen -= 1


def _context_id(mode: int, p1: int, p2: int) -> int:
    if mode == 0:  # LSB6
        return p1 & 0x3F
    if mode == 1:  # MSB6
        return p1 >> 2
    if mode == 2:  # UTF8
        return _UTF8_LUT0[p1] | _UTF8_LUT1[p2]
    return (_SIGNED_LUT[p1] << 3) | _SIGNED_LUT[p2]


def brotli_decompress(data: bytes, dict_lookup=None) -> bytes:
    """Full RFC 7932 decode (minus the static dictionary — see module
    docstring).

    ``dict_lookup(copy_len, word_id) -> bytes`` resolves static-dictionary
    references (distance beyond the output window, §8); when None (the
    default) such a reference raises UnsupportedCompressedStream. The hook
    lets tests validate whole real-world streams by substituting known
    plaintext, and is the integration point if a dictionary blob is ever
    provided."""
    br = _Reader(data)
    # window size (§9.1)
    if br.bit() == 0:
        wbits = 16
    else:
        n = br.bits(3)
        if n != 0:
            wbits = 17 + n
        else:
            m = br.bits(3)
            if m == 0:
                wbits = 17
            elif m == 1:
                raise ValueError("invalid WBITS")
            else:
                wbits = 8 + m
    window = (1 << wbits) - 16

    out = bytearray()
    # §4: ring initialized to 16, 15, 11, 4 where the LAST (most recent
    # slot, rb[(idx-1) & 3]) is 4 and the second-to-last is 11 — verified
    # against the reference's real-world static.tar.br stream, whose
    # first zero-run copy uses "last - 3" to produce distance 1
    dist_rb = [16, 15, 11, 4]
    dist_idx = 0

    while True:
        islast = br.bit()
        if islast and br.bit():  # ISLASTEMPTY
            break
        mnib = br.bits(2)
        if mnib == 3:  # metadata meta-block
            if br.bit():
                raise ValueError("reserved bit set in metadata block")
            skip_bytes = br.bits(2)
            skip = 0
            if skip_bytes:
                skip = br.bits(8 * skip_bytes)
                if skip_bytes > 1 and (skip >> (8 * (skip_bytes - 1))) == 0:
                    raise ValueError("non-minimal MSKIPLEN encoding")
                skip += 1
            br.align()
            br.raw(skip)
            if islast:
                raise ValueError("metadata block cannot be last")
            continue
        mlen = br.bits(16 + 4 * mnib) + 1
        if not islast and br.bit():  # ISUNCOMPRESSED
            br.align()
            out += br.raw(mlen)
            continue

        lit = _BlockState(br)
        ins = _BlockState(br)
        dst = _BlockState(br)

        npostfix = br.bits(2)
        ndirect = br.bits(4) << npostfix
        postfix_mask = (1 << npostfix) - 1
        ctx_modes = [br.bits(2) for _ in range(lit.n)]

        ntrees_l = _read_varlen_count(br)
        cmap_l = _read_context_map(br, ntrees_l, 64 * lit.n)
        ntrees_d = _read_varlen_count(br)
        cmap_d = _read_context_map(br, ntrees_d, 4 * dst.n)

        lit_huffs = [_read_prefix_code(br, 256) for _ in range(ntrees_l)]
        cmd_huffs = [_read_prefix_code(br, 704) for _ in range(ins.n)]
        dist_alpha = 16 + ndirect + (48 << npostfix)
        dist_huffs = [_read_prefix_code(br, dist_alpha) for _ in range(ntrees_d)]

        while mlen > 0:
            ins.tick(br)
            cmd = cmd_huffs[ins.btype].decode(br)
            cell = cmd >> 6
            implicit_d0 = cell < 2
            if cell >= 2:
                cell -= 2
            icode = _INSERT_RANGE_LUT[cell] + ((cmd >> 3) & 7)
            ccode = _COPY_RANGE_LUT[cell] + (cmd & 7)
            ilen = _INSERT_BASE[icode] + br.bits(_INSERT_EXTRA[icode])
            clen = _COPY_BASE[ccode] + br.bits(_COPY_EXTRA[ccode])

            for _ in range(ilen):
                lit.tick(br)
                p1 = out[-1] if out else 0
                p2 = out[-2] if len(out) > 1 else 0
                cid = _context_id(ctx_modes[lit.btype], p1, p2)
                tree = lit_huffs[cmap_l[(lit.btype << 6) | cid]]
                out.append(tree.decode(br))
            mlen -= ilen
            if mlen <= 0:
                break

            pushable = False
            if implicit_d0:
                distance = dist_rb[(dist_idx - 1) & 3]
            else:
                dst.tick(br)
                dctx = min(clen - 2, 3)
                dcode = dist_huffs[cmap_d[(dst.btype << 2) | dctx]].decode(br)
                if dcode < 16:
                    if dcode < 4:
                        distance = dist_rb[(dist_idx - 1 - dcode) & 3]
                    else:
                        # codes 4..9 modify the last distance, 10..15 the
                        # second-to-last (§4)
                        ref = dist_rb[(dist_idx - 1) & 3] if dcode < 10 else dist_rb[(dist_idx - 2) & 3]
                        k = dcode - 4 if dcode < 10 else dcode - 10
                        delta = (k >> 1) + 1
                        distance = ref + (delta if (k & 1) else -delta)
                        if distance <= 0:
                            raise ValueError("non-positive ring-buffer distance")
                elif dcode < 16 + ndirect:
                    distance = dcode - 16 + 1
                else:
                    dx = dcode - ndirect - 16
                    ndistbits = 1 + (dx >> (npostfix + 1))
                    dextra = br.bits(ndistbits)
                    hcode = dx >> npostfix
                    lcode = dx & postfix_mask
                    offset = ((2 + (hcode & 1)) << ndistbits) - 4
                    distance = ((offset + dextra) << npostfix) + lcode + ndirect + 1
                pushable = dcode != 0

            maxd = min(len(out), window)
            if distance > maxd:
                # static dictionary reference (§8); the ring buffer is NOT
                # updated for dictionary references
                if not 4 <= clen <= 24:
                    raise ValueError(f"invalid dictionary copy length {clen}")
                lookup = dict_lookup if dict_lookup is not None else _dict_word
                word = lookup(clen, distance - maxd - 1)
                out += word
                mlen -= len(word)
            else:
                if pushable:
                    dist_rb[dist_idx & 3] = distance
                    dist_idx += 1
                start = len(out) - distance
                for i in range(clen):
                    out.append(out[start + i])
                mlen -= clen
        if mlen < 0:
            raise ValueError("meta-block length underflow")
        if islast:
            break
    return bytes(out)
