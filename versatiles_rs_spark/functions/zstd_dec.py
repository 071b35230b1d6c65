"""Pure-python Zstandard decoder (RFC 8878, decode-only).

Together with functions/brotli_dec.py this makes every codec the
container formats use readable without any native library: frames with
raw / RLE / compressed blocks; literals sections in all four forms
(raw, RLE, Huffman-compressed with direct or FSE-compressed weights,
treeless repeat); 1- and 4-stream Huffman with backward bit reading;
sequences with predefined / RLE / FSE-compressed / repeat table modes;
and full repeat-offset semantics. Content checksums are skipped (the
optional xxh64 field is parsed past, not verified).

Everything derives from the public RFC. Validation (tests/test_zstd.py):
corpora encoded by the system libzstd at levels 1..22 decode
byte-identically, plus hand-built raw/RLE-block frames pinning the
framing layer.

The system libzstd remains the fast path (functions/brotli_native.py);
this module is the portable fallback wired behind it in
functions/compression.py.
"""

from __future__ import annotations

import struct

_MAGIC = 0xFD2FB528
_SKIPPABLE_LO = 0x184D2A50
_SKIPPABLE_HI = 0x184D2A5F

# literals-length / match-length code tables (§3.1.1.3.2.1.1)
_LL_BASE = [
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024,
    2048, 4096, 8192, 16384, 32768, 65536,
]
_LL_BITS = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
]
_ML_BASE = [
    3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20,
    21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 37,
    39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051,
    4099, 8195, 16387, 32771, 65539,
]
_ML_BITS = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3,
    4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
]

# predefined FSE distributions (§3.1.1.3.2.2)
_LL_DEFAULT = ([
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1,
], 6)
_ML_DEFAULT = ([
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1,
], 6)
_OF_DEFAULT = ([
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1,
], 5)


class _BackBits:
    """Backward bitstream (§3.1.1.3.2.1.2): find the padding sentinel
    (highest set bit) in the LAST byte, then read bit groups moving toward
    the front; each group's bits are in normal LSB-first value order."""

    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes) -> None:
        if not data or data[-1] == 0:
            raise ValueError("zstd backward bitstream missing sentinel")
        self.data = data
        self.bitpos = (len(data) - 1) * 8 + data[-1].bit_length() - 1

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self.bitpos -= n
        p = self.bitpos
        d = self.data
        v = 0
        for i in range(n):
            bp = p + i
            if bp >= 0:
                v |= ((d[bp >> 3] >> (bp & 7)) & 1) << i
        return v


class _FwdBits:
    """Forward LSB-first bit reader (FSE table descriptions, Huffman
    weights header)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        v = 0
        p = self.pos
        d = self.data
        for i in range(n):
            bp = p + i
            v |= ((d[bp >> 3] >> (bp & 7)) & 1) << i
        self.pos = p + n
        return v

    def bytes_consumed(self) -> int:
        return (self.pos + 7) >> 3


# ---------------------------------------------------------------------------
# FSE (§4.1)
# ---------------------------------------------------------------------------


def _fse_read_ncount(br: _FwdBits, max_symbol: int) -> tuple[list[int], int]:
    """Read a normalized-count distribution -> (counts, accuracy_log).
    Mirrors the RFC's variable-threshold reading exactly."""
    alog = br.read(4) + 5
    if alog > 9:
        raise ValueError(f"FSE accuracy log {alog} > 9")
    remaining = (1 << alog) + 1
    threshold = 1 << alog
    nbits = alog + 1
    counts: list[int] = []
    previous0 = False
    while remaining > 1 and len(counts) <= max_symbol:
        if previous0:
            # runs of zero counts: 2-bit repeat flags, 3 = continue
            while True:
                rep = br.read(2)
                counts.extend([0] * rep)
                if rep != 3:
                    break
            previous0 = False
            continue
        maxv = (2 * threshold - 1) - remaining
        v = br.read(nbits - 1)
        if v < maxv:
            count = v
        else:
            extra = br.read(1)
            v |= extra << (nbits - 1)
            count = v
            if count >= threshold:
                count -= maxv
        count -= 1  # -1 encodes "less than one" probability
        remaining -= -count if count < 0 else count
        counts.append(count)
        previous0 = count == 0
        while remaining < threshold:
            nbits -= 1
            threshold >>= 1
    if remaining != 1:
        raise ValueError("FSE distribution does not sum to table size")
    while len(counts) <= max_symbol:
        counts.append(0)
    return counts, alog


def _fse_build_table(counts: list[int], alog: int):
    """§4.1.2 decoding table -> (symbols, nbits, baselines) per state."""
    size = 1 << alog
    symbols = [0] * size
    high = size - 1
    for s, c in enumerate(counts):
        if c == -1:
            symbols[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, c in enumerate(counts):
        for _ in range(max(c, 0)):
            symbols[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("FSE spread did not cycle back to zero")
    next_state = [c if c > 0 else 1 for c in counts]
    nbits_t = [0] * size
    base_t = [0] * size
    for state in range(size):
        s = symbols[state]
        ns = next_state[s]
        next_state[s] += 1
        nb = alog - (ns.bit_length() - 1)
        nbits_t[state] = nb
        base_t[state] = (ns << nb) - size
    return symbols, nbits_t, base_t


class _FseState:
    __slots__ = ("symbols", "nbits", "base", "state")

    def __init__(self, table, bits: _BackBits, alog: int) -> None:
        self.symbols, self.nbits, self.base = table
        self.state = bits.read(alog)

    def symbol(self) -> int:
        return self.symbols[self.state]

    def update(self, bits: _BackBits) -> None:
        st = self.state
        self.state = self.base[st] + bits.read(self.nbits[st])


# ---------------------------------------------------------------------------
# Huffman literals (§4.2)
# ---------------------------------------------------------------------------


def _huff_read_weights(data: bytes) -> tuple[list[int], int]:
    """Huffman tree description -> (weights incl. implied last, bytes used).
    headerByte < 128: FSE-compressed weights; else direct 4-bit pairs."""
    hb = data[0]
    if hb >= 128:
        n = hb - 127
        nbytes = 1 + (n + 1) // 2
        weights = []
        for i in range(n):
            b = data[1 + i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        used = nbytes
    else:
        comp = data[1 : 1 + hb]
        br = _FwdBits(comp)
        counts, alog = _fse_read_ncount(br, 255)
        table = _fse_build_table(counts, alog)
        stream = comp[br.bytes_consumed():]
        bits = _BackBits(stream)
        # two interleaved FSE states, alternating outputs until exhausted
        s1 = _FseState(table, bits, alog)
        s2 = _FseState(table, bits, alog)
        weights = []
        while True:
            weights.append(s1.symbol())
            if bits.bitpos < 0:
                break
            s1.update(bits)
            weights.append(s2.symbol())
            if bits.bitpos < 0:
                break
            s2.update(bits)
            if len(weights) > 255:
                raise ValueError("too many Huffman weights")
        used = 1 + hb
    # the LAST symbol's weight is implied: total must be a power of two
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("empty Huffman weight set")
    max_bits = (total - 1).bit_length() + 1
    left = (1 << (max_bits - 1)) - total
    # left must itself be a power of two = 1 << (last_weight - 1)
    if left <= 0 or left & (left - 1):
        raise ValueError("invalid Huffman weight remainder")
    weights.append(left.bit_length())
    return weights, used


class _HuffTable:
    """Canonical Huffman decode via flat lookup over max_bits (§4.2.1):
    weight w -> code length (max_bits + 1 - w); codes assigned from weight
    1 upward (longest codes first, value order within a weight)."""

    __slots__ = ("table", "max_bits")

    def __init__(self, weights: list[int]) -> None:
        total = sum((1 << (w - 1)) for w in weights if w > 0)
        max_bits = (total - 1).bit_length()
        self.max_bits = max_bits
        table: list[tuple[int, int]] = [None] * (1 << max_bits)  # type: ignore
        rank_start = 0
        # iterate weights ascending: each (symbol, weight>0) occupies
        # 2^(weight-1) consecutive slots
        order = sorted(
            (w, s) for s, w in enumerate(weights) if w > 0
        )
        for w, s in order:
            span = 1 << (w - 1)
            nbits = max_bits + 1 - w
            for i in range(rank_start, rank_start + span):
                table[i] = (s, nbits)
            rank_start += span
        if rank_start != (1 << max_bits):
            raise ValueError("Huffman table not full")
        self.table = table

    def decode(self, bits: _BackBits) -> int:
        # peek max_bits (MSB-first as a prefix index), consume nbits
        mb = self.max_bits
        bits.bitpos -= mb
        p = bits.bitpos
        d = bits.data
        v = 0
        for i in range(mb):
            bp = p + i
            if bp >= 0:
                v |= ((d[bp >> 3] >> (bp & 7)) & 1) << i
        sym, nb = self.table[v]
        bits.bitpos += mb - nb
        return sym


def _huff_decode_stream(table: _HuffTable, stream: bytes, n_out: int) -> bytearray:
    bits = _BackBits(stream)
    out = bytearray()
    while len(out) < n_out:
        out.append(table.decode(bits))
    return out


# ---------------------------------------------------------------------------
# block decoding
# ---------------------------------------------------------------------------


def _decode_literals(block: bytes, ctx: dict) -> tuple[bytes, int]:
    """§3.1.1.3.1 literals section -> (literals, bytes consumed)."""
    b0 = block[0]
    lit_type = b0 & 3
    size_format = (b0 >> 2) & 3
    if lit_type in (0, 1):  # Raw / RLE
        if size_format in (0, 2):  # 1 byte (size_format 0b?0)
            rsize = b0 >> 3
            hdr = 1
        elif size_format == 1:
            rsize = (b0 >> 4) | (block[1] << 4)
            hdr = 2
        else:
            rsize = (b0 >> 4) | (block[1] << 4) | (block[2] << 12)
            hdr = 3
        if lit_type == 0:
            return bytes(block[hdr : hdr + rsize]), hdr + rsize
        return bytes([block[hdr]]) * rsize, hdr + 1

    # Compressed (2) or Treeless (3)
    if size_format == 0:  # single stream, 10-bit sizes
        regen = (b0 >> 4) | ((block[1] & 0x3F) << 4)
        comp = (block[1] >> 6) | (block[2] << 2)
        hdr = 3
        four = False
    elif size_format == 1:  # 4 streams, 10-bit sizes
        regen = (b0 >> 4) | ((block[1] & 0x3F) << 4)
        comp = (block[1] >> 6) | (block[2] << 2)
        hdr = 3
        four = True
    elif size_format == 2:  # 4 streams, 14-bit sizes
        regen = (b0 >> 4) | (block[1] << 4) | ((block[2] & 3) << 12)
        comp = (block[2] >> 2) | (block[3] << 6)
        hdr = 4
        four = True
    else:  # 4 streams, 18-bit sizes
        regen = (b0 >> 4) | (block[1] << 4) | ((block[2] & 0x3F) << 12)
        comp = (block[2] >> 6) | (block[3] << 2) | (block[4] << 10)
        hdr = 5
        four = True

    payload = block[hdr : hdr + comp]
    if lit_type == 2:
        weights, used = _huff_read_weights(payload)
        ctx["huff"] = _HuffTable(weights)
        payload = payload[used:]
    elif "huff" not in ctx:
        raise ValueError("treeless literals with no previous Huffman table")
    table: _HuffTable = ctx["huff"]

    if not four:
        return bytes(_huff_decode_stream(table, payload, regen)), hdr + comp
    # 4 streams: 3 x u16le jump table, sizes of streams 1-3
    s1, s2, s3 = struct.unpack_from("<HHH", payload, 0)
    body = payload[6:]
    sizes = [s1, s2, s3, len(body) - s1 - s2 - s3]
    outs = []
    off = 0
    per = (regen + 3) // 4
    lens = [per, per, per, regen - 3 * per]
    for i in range(4):
        outs.append(_huff_decode_stream(table, body[off : off + sizes[i]], lens[i]))
        off += sizes[i]
    return bytes(b"".join(outs)), hdr + comp


_SEQ_TABLE_CACHE: dict = {}


def _predef_table(which: str):
    if which not in _SEQ_TABLE_CACHE:
        dist, alog = {"ll": _LL_DEFAULT, "ml": _ML_DEFAULT, "of": _OF_DEFAULT}[which]
        _SEQ_TABLE_CACHE[which] = (_fse_build_table(dist, alog), alog)
    return _SEQ_TABLE_CACHE[which]


def _read_seq_table(mode: int, data: bytes, pos: int, which: str, max_sym: int, ctx: dict):
    """§3.1.1.3.2.1: per-sequence-section FSE table by compression mode.
    Returns ((table, alog), new_pos)."""
    key = f"seq_{which}"
    if mode == 0:  # predefined
        t = _predef_table(which)
        ctx[key] = t
        return t, pos
    if mode == 1:  # RLE: one byte, a single symbol with zero bits
        sym = data[pos]
        t = (([sym], [0], [0]), 0)
        ctx[key] = t
        return t, pos + 1
    if mode == 2:  # FSE-compressed description
        br = _FwdBits(data[pos:])
        counts, alog = _fse_read_ncount(br, max_sym)
        t = (_fse_build_table(counts, alog), alog)
        ctx[key] = t
        return t, pos + br.bytes_consumed()
    if key not in ctx:  # repeat
        raise ValueError(f"repeat mode for {which} with no previous table")
    return ctx[key], pos


def _decode_sequences(block: bytes, pos: int, literals: bytes, out: bytearray, ctx: dict) -> None:
    """§3.1.1.3.2 + §3.1.1.4 sequence decoding and execution."""
    b0 = block[pos]
    if b0 < 128:
        n_seq = b0
        pos += 1
    elif b0 < 255:
        n_seq = ((b0 - 128) << 8) + block[pos + 1]
        pos += 2
    else:
        n_seq = block[pos + 1] + (block[pos + 2] << 8) + 0x7F00
        pos += 3
    if n_seq == 0:
        out += literals
        return

    modes = block[pos]
    pos += 1
    if modes & 3:
        raise ValueError("reserved sequence mode bits set")
    ll_t, pos = _read_seq_table((modes >> 6) & 3, block, pos, "ll", 35, ctx)
    of_t, pos = _read_seq_table((modes >> 4) & 3, block, pos, "of", 31, ctx)
    ml_t, pos = _read_seq_table((modes >> 2) & 3, block, pos, "ml", 52, ctx)

    bits = _BackBits(block[pos:])
    ll_s = _FseState(ll_t[0], bits, ll_t[1])
    of_s = _FseState(of_t[0], bits, of_t[1])
    ml_s = _FseState(ml_t[0], bits, ml_t[1])

    rep = ctx.setdefault("rep", [1, 4, 8])
    lit_pos = 0
    for i in range(n_seq):
        of_code = of_s.symbol()
        ml_code = ml_s.symbol()
        ll_code = ll_s.symbol()
        if of_code > 31:
            raise ValueError("offset code too large")
        offset_value = (1 << of_code) + bits.read(of_code)
        ml = _ML_BASE[ml_code] + bits.read(_ML_BITS[ml_code])
        ll = _LL_BASE[ll_code] + bits.read(_LL_BITS[ll_code])

        # repeat-offset resolution (§3.1.1.5)
        if offset_value > 3:
            offset = offset_value - 3
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        else:
            idx = offset_value - 1 if ll != 0 else offset_value
            if idx == 0:
                offset = rep[0]
            elif idx == 1:
                offset = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            elif idx == 2:
                offset = rep[2]
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            else:  # idx == 3: rep[0] - 1 (ll == 0, offset_value == 3)
                offset = rep[0] - 1
                if offset == 0:
                    raise ValueError("zero offset")
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset

        out += literals[lit_pos : lit_pos + ll]
        lit_pos += ll
        if offset > len(out):
            raise ValueError("zstd match offset beyond output start")
        start = len(out) - offset
        for k in range(ml):
            out.append(out[start + k])

        if i < n_seq - 1:  # states are not updated after the last sequence
            ll_s.update(bits)
            ml_s.update(bits)
            of_s.update(bits)
    out += literals[lit_pos:]


def zstd_decompress(data: bytes) -> bytes:
    """Decode a (possibly multi-frame) zstd payload."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        magic = struct.unpack_from("<I", data, pos)[0]
        pos += 4
        if _SKIPPABLE_LO <= magic <= _SKIPPABLE_HI:
            size = struct.unpack_from("<I", data, pos)[0]
            pos += 4 + size
            continue
        if magic != _MAGIC:
            raise ValueError(f"bad zstd magic {magic:#x}")
        fhd = data[pos]
        pos += 1
        dict_flag = fhd & 3
        checksum = (fhd >> 2) & 1
        single_seg = (fhd >> 5) & 1
        fcs_code = fhd >> 6
        if not single_seg:
            pos += 1  # window descriptor (we keep the whole output anyway)
        if dict_flag:
            pos += (0, 1, 2, 4)[dict_flag]
            raise ValueError("zstd dictionary frames not supported")
        fcs_len = (1 if single_seg else 0, 2, 4, 8)[fcs_code]
        pos += fcs_len

        ctx: dict = {}
        while True:
            hdr = data[pos] | (data[pos + 1] << 8) | (data[pos + 2] << 16)
            pos += 3
            last = hdr & 1
            btype = (hdr >> 1) & 3
            bsize = hdr >> 3
            if btype == 0:  # raw
                out += data[pos : pos + bsize]
                pos += bsize
            elif btype == 1:  # RLE
                out += bytes([data[pos]]) * bsize
                pos += 1
            elif btype == 2:  # compressed
                block = data[pos : pos + bsize]
                pos += bsize
                literals, used = _decode_literals(block, ctx)
                _decode_sequences(block, used, literals, out, ctx)
            else:
                raise ValueError("reserved block type")
            if last:
                break
        if checksum:
            pos += 4  # xxh64 low 32 bits — parsed past, not verified
    return bytes(out)
