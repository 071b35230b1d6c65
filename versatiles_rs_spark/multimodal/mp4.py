"""MP4 / ISO BMFF (ISO 14496-12) container demuxer — pure bytes, no codec.

Video *decoding* stays honestly stubbed (no codec library in this
container), but the *container* layer is real: box walk, movie/track
headers, and the full sample-table resolution (stsd codec fourcc,
stts timing, stsc sample→chunk mapping, stsz sizes, stco/co64 chunk
offsets) that yields each sample's exact byte range in the file — the
demux math a frame-sampling pipeline actually needs, since at 100 TB you
seek to the k-th keyframe's byte range, you never decode the stream to
count frames.

``encode_minimal_mp4`` writes a deterministic single-track fixture whose
frame payloads live in ``mdat`` at the offsets the tables declare, so the
round-trip test proves the table math (not just symmetry).
"""

from __future__ import annotations

import struct


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for sibling boxes."""
    i = start
    while i + 8 <= end:
        size = struct.unpack_from(">I", buf, i)[0]
        btype = buf[i + 4 : i + 8].decode("latin-1")
        hdr = 8
        if size == 1:  # 64-bit largesize
            size = struct.unpack_from(">Q", buf, i + 8)[0]
            hdr = 16
        elif size == 0:  # to end of file
            size = end - i
        if size < hdr or i + size > end:
            raise ValueError(f"malformed box {btype!r} at {i}")
        yield btype, i + hdr, i + size
        i += size


def _find(buf: bytes, start: int, end: int, btype: str):
    for t, s, e in _iter_boxes(buf, start, end):
        if t == btype:
            return s, e
    return None


_CONTAINERS = {"moov", "trak", "mdia", "minf", "stbl"}


def parse_mp4(blob: bytes) -> dict:
    """Parse an MP4 into {brand, timescale, duration_s, tracks:[...]}.

    Each track carries handler type, codec fourcc, width/height (video),
    sample count, per-sample sizes, chunk offsets, and the stsc runs —
    everything ``sample_byte_ranges`` needs.
    """
    top = list(_iter_boxes(blob, 0, len(blob)))
    types = [t for t, _, _ in top]
    if not types or types[0] != "ftyp":
        raise ValueError("not an MP4: missing leading ftyp box")
    fs, fe = next((s, e) for t, s, e in top if t == "ftyp")
    brand = blob[fs : fs + 4].decode("latin-1")
    moov = next(((s, e) for t, s, e in top if t == "moov"), None)
    if moov is None:
        raise ValueError("MP4 missing moov box")

    out = {"brand": brand, "timescale": None, "duration_s": None, "tracks": []}
    mvhd = _find(blob, *moov, "mvhd")
    if mvhd:
        s, _ = mvhd
        version = blob[s]
        if version == 1:
            ts = struct.unpack_from(">I", blob, s + 20)[0]
            dur = struct.unpack_from(">Q", blob, s + 24)[0]
        else:
            ts = struct.unpack_from(">I", blob, s + 12)[0]
            dur = struct.unpack_from(">I", blob, s + 16)[0]
        out["timescale"] = ts
        out["duration_s"] = dur / ts if ts else None

    for t, s, e in _iter_boxes(blob, *moov):
        if t != "trak":
            continue
        out["tracks"].append(_parse_trak(blob, s, e))
    return out


def _parse_trak(blob: bytes, start: int, end: int) -> dict:
    track: dict = {
        "handler": None, "codec": None, "width": None, "height": None,
        "timescale": None, "duration_s": None, "n_samples": 0,
        "sample_sizes": [], "chunk_offsets": [], "stsc_runs": [],
        "stts_runs": [],
    }
    tkhd = _find(blob, start, end, "tkhd")
    if tkhd:
        s, e = tkhd
        version = blob[s]
        # width/height are the last two 16.16 fixed-point fields
        w, h = struct.unpack_from(">II", blob, e - 8)
        if w or h:
            track["width"], track["height"] = w >> 16, h >> 16
    mdia = _find(blob, start, end, "mdia")
    if not mdia:
        return track
    mdhd = _find(blob, *mdia, "mdhd")
    if mdhd:
        s, _ = mdhd
        version = blob[s]
        if version == 1:
            ts = struct.unpack_from(">I", blob, s + 20)[0]
            dur = struct.unpack_from(">Q", blob, s + 24)[0]
        else:
            ts = struct.unpack_from(">I", blob, s + 12)[0]
            dur = struct.unpack_from(">I", blob, s + 16)[0]
        track["timescale"] = ts
        track["duration_s"] = dur / ts if ts else None
    hdlr = _find(blob, *mdia, "hdlr")
    if hdlr:
        s, _ = hdlr
        track["handler"] = blob[s + 8 : s + 12].decode("latin-1")
    minf = _find(blob, *mdia, "minf")
    if not minf:
        return track
    stbl = _find(blob, *minf, "stbl")
    if not stbl:
        return track

    stsd = _find(blob, *stbl, "stsd")
    if stsd:
        s, e = stsd
        n_entries = struct.unpack_from(">I", blob, s + 4)[0]
        if n_entries >= 1 and s + 16 <= e:
            track["codec"] = blob[s + 12 : s + 16].decode("latin-1")

    stsz = _find(blob, *stbl, "stsz")
    if stsz:
        s, _ = stsz
        fixed, count = struct.unpack_from(">II", blob, s + 4)
        track["n_samples"] = count
        if fixed:
            track["sample_sizes"] = [fixed] * count
        else:
            track["sample_sizes"] = list(
                struct.unpack_from(f">{count}I", blob, s + 12)
            )

    stco = _find(blob, *stbl, "stco")
    if stco:
        s, _ = stco
        count = struct.unpack_from(">I", blob, s + 4)[0]
        track["chunk_offsets"] = list(struct.unpack_from(f">{count}I", blob, s + 8))
    else:
        co64 = _find(blob, *stbl, "co64")
        if co64:
            s, _ = co64
            count = struct.unpack_from(">I", blob, s + 4)[0]
            track["chunk_offsets"] = list(struct.unpack_from(f">{count}Q", blob, s + 8))

    stsc = _find(blob, *stbl, "stsc")
    if stsc:
        s, _ = stsc
        count = struct.unpack_from(">I", blob, s + 4)[0]
        for k in range(count):
            first, per, _desc = struct.unpack_from(">III", blob, s + 8 + 12 * k)
            track["stsc_runs"].append((first, per))

    stts = _find(blob, *stbl, "stts")
    if stts:
        s, _ = stts
        count = struct.unpack_from(">I", blob, s + 4)[0]
        for k in range(count):
            n, delta = struct.unpack_from(">II", blob, s + 8 + 8 * k)
            track["stts_runs"].append((n, delta))
    return track


def sample_byte_ranges(track: dict) -> list[tuple[int, int]]:
    """Resolve the sample tables to one (file_offset, size) per sample —
    the seek plan a demuxer executes. stsc runs are expanded per spec:
    entry k applies from its first_chunk until entry k+1's first_chunk."""
    sizes = track["sample_sizes"]
    chunks = track["chunk_offsets"]
    runs = track["stsc_runs"] or [(1, len(sizes) or 1)]
    per_chunk: list[int] = []
    for k, (first, per) in enumerate(runs):
        last = runs[k + 1][0] - 1 if k + 1 < len(runs) else len(chunks)
        per_chunk.extend([per] * (last - first + 1))
    out: list[tuple[int, int]] = []
    si = 0
    for ci, coff in enumerate(chunks):
        off = coff
        for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
            if si >= len(sizes):
                break
            out.append((off, sizes[si]))
            off += sizes[si]
            si += 1
    return out


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def encode_minimal_mp4(
    frames: list[bytes],
    width: int = 64,
    height: int = 48,
    fps: int = 10,
    codec: bytes = b"mp4v",
) -> bytes:
    """Deterministic single-video-track MP4: one chunk per 2 samples, real
    stts/stsc/stsz/stco tables, frame payloads verbatim in mdat."""
    timescale = 1000
    delta = timescale // fps
    duration = delta * len(frames)

    mvhd = _box(
        b"mvhd",
        struct.pack(">B3xIIII", 0, 0, 0, timescale, duration)
        + struct.pack(">iH2x8x", 0x00010000, 0x0100)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">6I", 0, 0, 0, 0, 0, 0)
        + struct.pack(">I", 2),
    )
    tkhd = _box(
        b"tkhd",
        struct.pack(">I", 7)  # version 0, flags: enabled|in_movie|in_preview
        + struct.pack(">IIII", 0, 0, 1, 0)  # created, modified, track_id, reserved
        + struct.pack(">I8x", duration)
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer, alt_group, volume, reserved
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _box(b"mdhd", struct.pack(">B3xIIIIHH", 0, 0, 0, timescale, duration, 0x55C4, 0))
    hdlr = _box(b"hdlr", struct.pack(">B3xI", 0, 0) + b"vide" + b"\0" * 12 + b"v\0")
    # standard 86-byte visual sample entry
    entry = (
        struct.pack(">6xH", 1)  # reserved + data_reference_index
        + struct.pack(">HH12x", 0, 0)
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)
        + b"\0" * 32
        + struct.pack(">Hh", 24, -1)
    )
    stsd = _box(b"stsd", struct.pack(">B3xI", 0, 1) + _box(codec, entry))
    stts = _box(b"stts", struct.pack(">B3xIII", 0, 1, len(frames), delta))
    # one chunk per 2 samples (last chunk may hold 1) — exercises stsc math
    n_chunks = (len(frames) + 1) // 2
    if len(frames) % 2 == 0 or len(frames) == 1:
        stsc_payload = struct.pack(">B3xIIII", 0, 1, 1, 2 if len(frames) > 1 else 1, 1)
    else:
        stsc_payload = struct.pack(">B3xI", 0, 2) + struct.pack(
            ">III", 1, 2, 1
        ) + struct.pack(">III", n_chunks, 1, 1)
    stsc = _box(b"stsc", stsc_payload)
    stsz = _box(
        b"stsz",
        struct.pack(">B3xII", 0, 0, len(frames))
        + struct.pack(f">{len(frames)}I", *[len(f) for f in frames]),
    )

    # assemble with a placeholder stco to learn the mdat payload offset
    def _moov(chunk_offsets: list[int]) -> bytes:
        stco = _box(
            b"stco",
            struct.pack(">B3xI", 0, len(chunk_offsets))
            + struct.pack(f">{len(chunk_offsets)}I", *chunk_offsets),
        )
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = _box(b"minf", _box(b"vmhd", struct.pack(">B3x8x", 0)) + stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", tkhd + mdia)
        return _box(b"moov", mvhd + trak)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    placeholder = _moov([0] * n_chunks)
    mdat_payload_start = len(ftyp) + len(placeholder) + 8
    offsets = []
    pos = mdat_payload_start
    for ci in range(n_chunks):
        offsets.append(pos)
        for f in frames[ci * 2 : ci * 2 + 2]:
            pos += len(f)
    moov = _moov(offsets)
    assert len(moov) == len(placeholder)
    mdat = _box(b"mdat", b"".join(frames))
    return ftyp + moov + mdat
