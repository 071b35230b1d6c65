"""Ogg container demuxer (RFC 3533) — pure bytes, no codec.

Page-level parse: capture pattern, granule position, serial, sequence,
lacing table -> packet reassembly (segments of 255 continue, < 255
terminate). Identification headers of the two codecs Ogg carries in the
wild are decoded for metadata — Vorbis (``\\x01vorbis``: channels, sample
rate) and Opus (``OpusHead``) — while audio sample decode stays honestly
stubbed (no codec in this container). ``encode_minimal_ogg`` writes a
deterministic fixture (id-header page + one page per packet) so packet
reassembly is proven against embedded payloads, including the 255-byte
lacing continuation case.
"""

from __future__ import annotations

import struct


def _iter_pages(blob: bytes):
    """Yield (granule, serial, seq, packets_closed, segments) per page."""
    i = 0
    while i < len(blob):
        if blob[i : i + 4] != b"OggS":
            raise ValueError(f"bad Ogg capture pattern at {i}")
        if i + 27 > len(blob):
            raise ValueError("truncated Ogg page header")
        version, htype = blob[i + 4], blob[i + 5]
        if version != 0:
            raise ValueError(f"unsupported Ogg version {version}")
        granule = struct.unpack_from("<q", blob, i + 6)[0]
        serial = struct.unpack_from("<I", blob, i + 14)[0]
        seq = struct.unpack_from("<I", blob, i + 18)[0]
        nseg = blob[i + 26]
        lacing = blob[i + 27 : i + 27 + nseg]
        if len(lacing) != nseg:
            raise ValueError("truncated Ogg lacing table")
        body = i + 27 + nseg
        segs = []
        off = body
        for lv in lacing:
            segs.append((off, lv))
            off += lv
        if off > len(blob):
            raise ValueError("Ogg page body overruns file")
        yield granule, serial, seq, htype, lacing, segs
        i = off


def parse_ogg(blob: bytes) -> dict:
    """Parse an Ogg stream: {codec, channels, sample_rate, n_packets,
    packets: [(offset, size) first-segment ranges], duration_s (from the
    last granule for known codecs)}."""
    packets: list[bytes] = []
    ranges: list[tuple[int, int]] = []
    cur = bytearray()
    cur_start = None
    last_granule = 0
    n_pages = 0
    for granule, serial, seq, htype, lacing, segs in _iter_pages(blob):
        n_pages += 1
        if granule > 0:
            last_granule = granule
        for (off, lv) in segs:
            if cur_start is None:
                cur_start = off
            cur += blob[off : off + lv]
            if lv < 255:  # packet terminates
                packets.append(bytes(cur))
                ranges.append((cur_start, len(cur)))
                cur = bytearray()
                cur_start = None
    if n_pages == 0:
        raise ValueError("no Ogg pages")
    out = {
        "codec": None,
        "channels": None,
        "sample_rate": None,
        "n_packets": len(packets),
        "packets": ranges,
        "duration_s": None,
    }
    if packets:
        head = packets[0]
        if head.startswith(b"\x01vorbis"):
            out["codec"] = "vorbis"
            out["channels"] = head[11]
            out["sample_rate"] = struct.unpack_from("<I", head, 12)[0]
        elif head.startswith(b"OpusHead"):
            out["codec"] = "opus"
            out["channels"] = head[9]
            out["sample_rate"] = 48000  # Opus always decodes at 48 kHz
    if out["sample_rate"] and last_granule > 0:
        out["duration_s"] = last_granule / out["sample_rate"]
    return out


def _page(serial: int, seq: int, granule: int, packet: bytes, htype: int = 0) -> bytes:
    lacing = bytes([255] * (len(packet) // 255) + [len(packet) % 255])
    hdr = (
        b"OggS\x00" + bytes([htype])
        + struct.pack("<q", granule)
        + struct.pack("<I", serial)
        + struct.pack("<I", seq)
        + b"\x00\x00\x00\x00"  # CRC zeroed (deterministic fixture)
        + bytes([len(lacing)])
        + lacing
    )
    return hdr + packet


def encode_minimal_ogg(
    packets: list[bytes], sample_rate: int = 44100, channels: int = 2
) -> bytes:
    """Deterministic Vorbis-identified Ogg: id-header page then one page
    per packet, final granule = 1000 samples per packet."""
    ident = (
        b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
        + struct.pack("<I", sample_rate) + b"\x00" * 16 + b"\x01"
    )
    out = _page(0xC0FFEE, 0, 0, ident, htype=2)  # BOS
    for k, p in enumerate(packets):
        granule = (k + 1) * 1000
        htype = 4 if k == len(packets) - 1 else 0  # EOS on the last page
        out += _page(0xC0FFEE, k + 1, granule, p, htype=htype)
    return out
