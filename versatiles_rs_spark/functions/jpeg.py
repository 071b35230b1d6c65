"""Baseline JPEG codec in pure python + numpy (ITU-T T.81 / JFIF).

The reference treats JPEG as a first-class raster tile format
(versatiles_image/src/format/jpeg.rs); this container ships no JPEG
library, so the codec is implemented from the public spec:

- ``jpeg_encode``: 8-bit baseline sequential, 4:4:4 (no subsampling),
  Annex-K quantization tables scaled by ``quality`` and Annex-K standard
  Huffman tables. Deterministic bytes for a given (image, quality).
- ``jpeg_decode``: baseline sequential decoder — DQT/SOF0/DHT/SOS/DRI
  parsing, per-component sampling factors (4:4:4, 4:2:2, 4:2:0), restart
  markers, Huffman + dequantize + IDCT + YCbCr->RGB. Progressive (SOF2)
  and arithmetic coding raise ``ValueError``.

DCT/IDCT are exact float64 matrix products (the 8x8 DCT-II basis), so the
codec round-trips with ordinary baseline-JPEG accuracy; tests assert
per-pixel error bounds, not byte equality with other encoders.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables (ITU T.81 Annex K)
# ---------------------------------------------------------------------------

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])
_UNZIGZAG = np.argsort(_ZIGZAG)

_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K Huffman specs: (bits[1..16], values)
_DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# 8x8 DCT-II orthonormal basis
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16.0)
_ALPHA = np.full(8, np.sqrt(2.0 / 8.0))
_ALPHA[0] = np.sqrt(1.0 / 8.0)
_DCT_M = _ALPHA[:, None] * _C  # forward: D = M @ block @ M.T


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    t = np.clip((q * s + 50) // 100, 1, 255)
    return t.astype(np.int32)


def _build_huff_codes(spec) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 Annex C canonical assignment."""
    bits, values = spec
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitW:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size, bits) per T.81 F.1.2.1 (one's-complement negatives)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(bw_writer: _BitW, block: np.ndarray, prev_dc: int, dc_t, ac_t) -> int:
    """Entropy-code one zigzagged quantized block; returns its DC value."""
    diff = int(block[0]) - prev_dc
    size, bits = _magnitude(diff)
    code, ln = dc_t[size]
    bw_writer.write(code, ln)
    if size:
        bw_writer.write(bits, size)
    nz = np.nonzero(block[1:])[0]
    last_nz = nz[-1] + 1 if len(nz) else 0
    run = 0
    for k in range(1, last_nz + 1):
        v = int(block[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_t[0xF0]  # ZRL
            bw_writer.write(code, ln)
            run -= 16
        size, bits = _magnitude(v)
        code, ln = ac_t[(run << 4) | size]
        bw_writer.write(code, ln)
        bw_writer.write(bits, size)
        run = 0
    if last_nz < 63:
        code, ln = ac_t[0x00]  # EOB
        bw_writer.write(code, ln)
    return int(block[0])


def jpeg_encode(img: np.ndarray, quality: int = 85, subsampling: str = "444") -> bytes:
    """(H, W[, 1|3|4]) uint8 -> baseline JFIF bytes (Annex-K tables).
    ``subsampling``: "444" (default) or "420" (2x2 chroma). An alpha channel
    is dropped (JPEG has none)."""
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.shape[2] == 4:
        img = img[:, :, :3]
    h, w, nch = img.shape
    gray = nch == 1
    f = img.astype(np.float64)
    if gray:
        planes = [f[:, :, 0]]
    else:
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    sub = 2 if (subsampling == "420" and not gray) else 1
    samp = [(sub, sub)] + [(1, 1)] * (len(planes) - 1)  # luma gets the factor
    if sub == 2:
        # box-downsample chroma 2x2 (pad odd dims by edge first)
        for ci in (1, 2):
            p = planes[ci]
            ph, pw = (p.shape[0] + 1) // 2 * 2, (p.shape[1] + 1) // 2 * 2
            p = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
            planes[ci] = (p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2]) / 4.0

    ql = _quality_scale(_Q_LUMA, quality).reshape(8, 8)
    qc = _quality_scale(_Q_CHROMA, quality).reshape(8, 8)
    dc_l = _build_huff_codes(_DC_LUMA_SPEC)
    ac_l = _build_huff_codes(_AC_LUMA_SPEC)
    dc_c = _build_huff_codes(_DC_CHROMA_SPEC)
    ac_c = _build_huff_codes(_AC_CHROMA_SPEC)

    mcux = (w + 8 * sub - 1) // (8 * sub)
    mcuy = (h + 8 * sub - 1) // (8 * sub)
    coefs = []
    for ci, plane in enumerate(planes):
        hi, vi = samp[ci]
        tw, th = mcux * 8 * hi, mcuy * 8 * vi
        padded = np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        ) - 128.0
        bh_c, bw_c = th // 8, tw // 8
        blocks = padded.reshape(bh_c, 8, bw_c, 8).transpose(0, 2, 1, 3)
        d = np.einsum("ij,abjk,lk->abil", _DCT_M, blocks, _DCT_M)
        q = ql if ci == 0 else qc
        coefs.append(np.round(d / q).astype(np.int32))

    bw_writer = _BitW()
    prev_dc = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(len(planes)):
                hi, vi = samp[ci]
                dc_t = dc_l if ci == 0 else dc_c
                ac_t = ac_l if ci == 0 else ac_c
                for v_ in range(vi):
                    for h_ in range(hi):
                        blk = coefs[ci][my * vi + v_, mx * hi + h_].ravel()[_ZIGZAG]
                        prev_dc[ci] = _encode_block(bw_writer, blk, prev_dc[ci], dc_t, ac_t)
    bw_writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in ((0, ql), (1, qc))[: 1 if gray else 2]:
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(
            int(v) for v in q.ravel()[_ZIGZAG]
        )
    nf = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nf, 8, h, w, nf)
    for ci in range(nf):
        hi, vi = samp[ci]
        out += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    specs = [(0x00, _DC_LUMA_SPEC), (0x10, _AC_LUMA_SPEC)]
    if not gray:
        specs += [(0x01, _DC_CHROMA_SPEC), (0x11, _AC_CHROMA_SPEC)]
    for tc_id, (bits, values) in specs:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values)) + bytes([tc_id])
        out += bytes(bits) + bytes(values)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nf, nf)
    for ci in range(nf):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"
    out += bw_writer.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _HuffTable:
    """Canonical Huffman decode via (length -> first code, symbol offset)."""

    def __init__(self, bits: list[int], values: list[int]) -> None:
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        self.values = values
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.val_ptr[length] = k
                self.min_code[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.max_code[length] = code - 1
            code <<= 1

    def decode(self, br: "_BitR") -> int:
        code = br.read_bit()
        length = 1
        while code > self.max_code[length]:
            length += 1
            if length > 16:
                raise ValueError("bad huffman code")
            code = (code << 1) | br.read_bit()
        return self.values[self.val_ptr[length] + code - self.min_code[length]]


class _BitR:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                elif 0xD0 <= nxt <= 0xD7:
                    raise _RestartMarker()
                else:
                    raise ValueError(f"unexpected marker 0xff{nxt:02x} in scan")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Skip to just past the next RSTn marker and clear bit state."""
        self.n = 0
        while True:
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


class _RestartMarker(Exception):
    pass


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def jpeg_decode(blob: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (H, W, 3) uint8 (or (H, W, 1) grayscale)."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    i = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    scan_pos = None
    scan_comps: list[dict] = []
    while i < len(blob):
        if blob[i] != 0xFF:
            i += 1
            continue
        marker = blob[i + 1]
        i += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        seg_len = struct.unpack_from(">H", blob, i)[0]
        seg = blob[i + 2 : i + seg_len]
        if marker == 0xDB:
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0xF
                j += 1
                if pq:
                    vals = np.frombuffer(seg[j : j + 128], dtype=">u2").astype(np.int32)
                    j += 128
                else:
                    vals = np.frombuffer(seg[j : j + 64], dtype=np.uint8).astype(np.int32)
                    j += 64
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = vals
                qt[tq] = tbl.reshape(8, 8)
        elif marker == 0xC4:
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0xF
                bits = list(seg[j + 1 : j + 17])
                n = sum(bits)
                values = list(seg[j + 17 : j + 17 + n])
                huff[(tc, th)] = _HuffTable(bits, values)
                j += 17 + n
        elif marker == 0xC0 or marker == 0xC1:
            _prec, h, w, nf = struct.unpack_from(">BHHB", seg, 0)
            comps = []
            for k in range(nf):
                cid, hv, tq = seg[6 + 3 * k : 9 + 3 * k]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG SOF marker 0xff{marker:02x} (not baseline)")
        elif marker == 0xDD:
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:
            ns = seg[0]
            scan_comps = []
            for k in range(ns):
                cs, tt = seg[1 + 2 * k], seg[2 + 2 * k]
                comp = next(c for c in comps if c["id"] == cs)
                comp["dc"] = huff[(0, tt >> 4)]
                comp["ac"] = huff[(1, tt & 0xF)]
                scan_comps.append(comp)
            scan_pos = i + seg_len
            break
        i += seg_len
    if scan_pos is None:
        raise ValueError("no SOS in JPEG")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))

    br = _BitR(blob, scan_pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.sync_restart()
                pred = [0] * len(comps)
            try:
                for ci, c in enumerate(scan_comps):
                    q = qt[c["tq"]]
                    for v_ in range(c["v"]):
                        for h_ in range(c["h"]):
                            zz = np.zeros(64, dtype=np.int32)
                            t = c["dc"].decode(br)
                            diff = _extend(br.read_bits(t), t) if t else 0
                            pred[ci] += diff
                            zz[0] = pred[ci]
                            k = 1
                            while k < 64:
                                rs = c["ac"].decode(br)
                                r, s = rs >> 4, rs & 0xF
                                if s == 0:
                                    if r == 15:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    raise ValueError("AC run past block end")
                                zz[k] = _extend(br.read_bits(s), s)
                                k += 1
                            block = np.zeros(64, dtype=np.float64)
                            block[_ZIGZAG] = zz
                            block = block.reshape(8, 8) * q
                            pix = _DCT_M.T @ block @ _DCT_M + 128.0
                            y0 = (my * c["v"] + v_) * 8
                            x0 = (mx * c["h"] + h_) * 8
                            planes[comps.index(c)][y0 : y0 + 8, x0 : x0 + 8] = pix
            except _RestartMarker:
                raise ValueError("restart marker inside MCU (corrupt stream)") from None
            mcu_count += 1

    # upsample to full size and color-convert
    full = []
    for c, p in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)
