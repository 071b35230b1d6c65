"""WebM / Matroska (EBML) container demuxer — pure bytes, no codec.

Companion to :mod:`versatiles_rs_spark.multimodal.mp4`: the *container*
layer is real (EBML element walk, segment info, track entries with codec
id + dimensions, cluster/SimpleBlock traversal yielding each frame's
exact byte range and timestamp), while pixel decode stays honestly
stubbed (no VP8/VP9/AV1 codec in this container). Frame sampling at
100 TB needs exactly this: seek ranges from the index walk, never a
stream decode.

EBML basics (RFC 8794): every element is (vint id, vint size, payload);
ids keep their length-marker bit, sizes strip it. ``encode_minimal_webm``
writes a deterministic one-video-track file — one Cluster, one
SimpleBlock per frame — so the round-trip test proves the traversal math
against payloads actually embedded in the file.
"""

from __future__ import annotations

import struct

# element ids (with marker bits, as they appear on the wire)
EBML_HEADER = 0x1A45DFA3
DOCTYPE = 0x4282
SEGMENT = 0x18538067
INFO = 0x1549A966
TIMECODE_SCALE = 0x2AD7B1
DURATION = 0x4489
TRACKS = 0x1654AE6B
TRACK_ENTRY = 0xAE
TRACK_NUMBER = 0xD7
TRACK_TYPE = 0x83
CODEC_ID = 0x86
VIDEO = 0xE0
PIXEL_WIDTH = 0xB0
PIXEL_HEIGHT = 0xBA
CLUSTER = 0x1F43B675
CLUSTER_TIMECODE = 0xE7
SIMPLE_BLOCK = 0xA3

_CONTAINERS = {SEGMENT, INFO, TRACKS, TRACK_ENTRY, VIDEO, CLUSTER}


def _read_vint(buf: bytes, i: int, keep_marker: bool) -> tuple[int, int]:
    """EBML variable-length integer at offset i -> (value, next offset)."""
    if i >= len(buf):
        raise ValueError("EBML vint past end")
    first = buf[i]
    if first == 0:
        raise ValueError("invalid EBML vint (zero lead byte)")
    length = 1
    mask = 0x80
    while not (first & mask):
        mask >>= 1
        length += 1
    if i + length > len(buf):
        raise ValueError("EBML vint truncated")
    val = first if keep_marker else (first & (mask - 1))
    for b in buf[i + 1 : i + length]:
        val = (val << 8) | b
    return val, i + length


def _iter_elements(buf: bytes, start: int, end: int):
    """Yield (id, payload_start, payload_end) for sibling EBML elements."""
    i = start
    while i < end:
        eid, i = _read_vint(buf, i, keep_marker=True)
        size, i = _read_vint(buf, i, keep_marker=False)
        if i + size > end:
            raise ValueError(f"EBML element 0x{eid:X} overruns parent")
        yield eid, i, i + size
        i += size


def _uint(buf: bytes, s: int, e: int) -> int:
    v = 0
    for b in buf[s:e]:
        v = (v << 8) | b
    return v


def parse_webm(blob: bytes) -> dict:
    """Parse a WebM/Matroska file into {doctype, timecode_scale_ns,
    duration_s, tracks:[...], frames:[(track, t_ms, offset, size)]}."""
    top = list(_iter_elements(blob, 0, len(blob)))
    if not top or top[0][0] != EBML_HEADER:
        raise ValueError("not an EBML/WebM file")
    out = {
        "doctype": None,
        "timecode_scale_ns": 1_000_000,
        "duration_s": None,
        "tracks": [],
        "frames": [],
    }
    hs, he = top[0][1], top[0][2]
    for eid, s, e in _iter_elements(blob, hs, he):
        if eid == DOCTYPE:
            out["doctype"] = blob[s:e].rstrip(b"\0").decode("latin-1")
    seg = next(((s, e) for eid, s, e in top if eid == SEGMENT), None)
    if seg is None:
        raise ValueError("EBML file missing Segment")
    raw_duration = None
    for eid, s, e in _iter_elements(blob, *seg):
        if eid == INFO:
            for eid2, s2, e2 in _iter_elements(blob, s, e):
                if eid2 == TIMECODE_SCALE:
                    out["timecode_scale_ns"] = _uint(blob, s2, e2)
                elif eid2 == DURATION:
                    raw_duration = struct.unpack(
                        ">f" if e2 - s2 == 4 else ">d", blob[s2:e2]
                    )[0]
        elif eid == TRACKS:
            for eid2, s2, e2 in _iter_elements(blob, s, e):
                if eid2 != TRACK_ENTRY:
                    continue
                tr = {"number": None, "type": None, "codec": None, "width": None, "height": None}
                for eid3, s3, e3 in _iter_elements(blob, s2, e2):
                    if eid3 == TRACK_NUMBER:
                        tr["number"] = _uint(blob, s3, e3)
                    elif eid3 == TRACK_TYPE:
                        tr["type"] = _uint(blob, s3, e3)
                    elif eid3 == CODEC_ID:
                        tr["codec"] = blob[s3:e3].rstrip(b"\0").decode("latin-1")
                    elif eid3 == VIDEO:
                        for eid4, s4, e4 in _iter_elements(blob, s3, e3):
                            if eid4 == PIXEL_WIDTH:
                                tr["width"] = _uint(blob, s4, e4)
                            elif eid4 == PIXEL_HEIGHT:
                                tr["height"] = _uint(blob, s4, e4)
                out["tracks"].append(tr)
        elif eid == CLUSTER:
            cluster_tc = 0
            for eid2, s2, e2 in _iter_elements(blob, s, e):
                if eid2 == CLUSTER_TIMECODE:
                    cluster_tc = _uint(blob, s2, e2)
                elif eid2 == SIMPLE_BLOCK:
                    track, j = _read_vint(blob, s2, keep_marker=False)
                    rel_tc = struct.unpack(">h", blob[j : j + 2])[0]
                    # j+2 is the flags byte; frame data follows
                    out["frames"].append(
                        (
                            track,
                            (cluster_tc + rel_tc) * out["timecode_scale_ns"] // 1_000_000,
                            j + 3,
                            e2 - (j + 3),
                        )
                    )
    if raw_duration is not None:
        out["duration_s"] = raw_duration * out["timecode_scale_ns"] / 1e9
    return out


def _vint_size(val: int) -> bytes:
    """Encode a size vint (marker in the lead byte), smallest width."""
    for length in range(1, 9):
        if val < (1 << (7 * length)) - 1:
            out = val | (1 << (7 * length))
            return out.to_bytes(length, "big")
    raise ValueError("size too large")


def _elem(eid: int, payload: bytes) -> bytes:
    id_bytes = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    return id_bytes + _vint_size(len(payload)) + payload


def _uint_bytes(v: int) -> bytes:
    return v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")


def encode_minimal_webm(
    frames: list[bytes],
    width: int = 64,
    height: int = 48,
    fps: int = 10,
    codec: str = "V_VP8",
) -> bytes:
    """Deterministic one-video-track WebM: one Cluster, one SimpleBlock
    per frame, 1 ms timecode scale."""
    header = _elem(
        EBML_HEADER,
        _elem(0x4286, b"\x01")  # EBMLVersion
        + _elem(0x42F7, b"\x01")  # EBMLReadVersion
        + _elem(0x42F2, b"\x04")  # EBMLMaxIDLength
        + _elem(0x42F3, b"\x08")  # EBMLMaxSizeLength
        + _elem(DOCTYPE, b"webm")
        + _elem(0x4287, b"\x02")  # DocTypeVersion
        + _elem(0x4285, b"\x02"),  # DocTypeReadVersion
    )
    step_ms = 1000 // fps
    info = _elem(
        INFO,
        _elem(TIMECODE_SCALE, _uint_bytes(1_000_000))
        + _elem(DURATION, struct.pack(">d", float(step_ms * len(frames)))),
    )
    video = _elem(
        VIDEO, _elem(PIXEL_WIDTH, _uint_bytes(width)) + _elem(PIXEL_HEIGHT, _uint_bytes(height))
    )
    entry = _elem(
        TRACK_ENTRY,
        _elem(TRACK_NUMBER, b"\x01")
        + _elem(0x73C5, b"\x01")  # TrackUID
        + _elem(TRACK_TYPE, b"\x01")
        + _elem(CODEC_ID, codec.encode())
        + video,
    )
    tracks = _elem(TRACKS, entry)
    blocks = b""
    for i, f in enumerate(frames):
        body = b"\x81" + struct.pack(">h", i * step_ms) + b"\x80" + f
        blocks += _elem(SIMPLE_BLOCK, body)
    cluster = _elem(CLUSTER, _elem(CLUSTER_TIMECODE, b"\x00") + blocks)
    segment = _elem(SEGMENT, info + tracks + cluster)
    return header + segment
