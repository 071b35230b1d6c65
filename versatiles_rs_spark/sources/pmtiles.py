"""PMTiles v3 container ingest + export (pure stdlib; gzip internals).

Format parity with the public PMTiles v3 spec and the reference's
pmtiles reader/writer (versatiles_container/src/container/pmtiles/
reader.rs:74-105 Hilbert directory walk, writer.rs Hilbert-ordered
assembly):

- 127-byte little-endian header (magic "PMTiles", version 3, section
  offset/length table, tile/internal compression, tile type, zoom range,
  e7 bbox + center).
- tile_id = (4^z - 1)/3 + hilbert_d(z, x, y) — identical to the engine's
  ``hilbert_index_np`` clustering key (tile_hilbert_index.rs:85-160).
- directories: varint-encoded columns (delta tile_ids, run lengths,
  lengths, offsets with the 0="previous offset+length" shorthand),
  compressed with internal_compression (gzip here — universally readable).
  Entries with run_length 0 are leaf-directory pointers; leaves are built
  whenever the root would exceed the spec's 16 KiB budget.
- clustered=1: tile data is written in tile_id order, so offsets are
  monotone and the run-length/offset shorthands reach their best case.

Scale design: INGEST reads header + directories on the driver (the
directory is ~1/1000th of the data; the reference holds it resident too),
then distributes contiguous entry ranges — each executor task reads its
byte slice of the tile-data section. EXPORT streams tiles through the
driver in Hilbert order (toLocalIterator; one partition in memory).
"""

from __future__ import annotations

import gzip
import json
import os
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from versatiles_rs_spark.sources.ranged_io import is_url, open_ranged

_MAGIC = b"PMTiles"
_HDR = 127
_ROOT_BUDGET = 16384 - _HDR

_TILE_TYPE = {"mvt": 1, "png": 2, "jpg": 3, "webp": 4, "avif": 5}
_TILE_TYPE_INV = {v: k for k, v in _TILE_TYPE.items()}
_COMP = {"unknown": 0, "none": 1, "gzip": 2, "brotli": 3, "zstd": 4}
_COMP_INV = {v: k for k, v in _COMP.items()}


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = out = 0
    while True:
        b = buf[i]
        out |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return out, i
        shift += 7


def _serialize_dir(entries: list[tuple[int, int, int, int]]) -> bytes:
    """entries: [(tile_id, offset, length, run_length)] sorted by tile_id."""
    out = bytearray(_varint(len(entries)))
    last_id = 0
    for tid, _, _, _ in entries:
        out += _varint(tid - last_id)
        last_id = tid
    for _, _, _, rl in entries:
        out += _varint(rl)
    for _, _, ln, _ in entries:
        out += _varint(ln)
    prev_off = prev_len = None
    for _, off, ln, _ in entries:
        if prev_off is not None and off == prev_off + prev_len:
            out += _varint(0)
        else:
            out += _varint(off + 1)
        prev_off, prev_len = off, ln
    return bytes(out)


def _parse_dir(buf: bytes) -> list[tuple[int, int, int, int]]:
    n, i = _read_varint(buf, 0)
    ids = []
    last = 0
    for _ in range(n):
        d, i = _read_varint(buf, i)
        last += d
        ids.append(last)
    runs = []
    for _ in range(n):
        r, i = _read_varint(buf, i)
        runs.append(r)
    lens = []
    for _ in range(n):
        ln, i = _read_varint(buf, i)
        lens.append(ln)
    offs = []
    for k in range(n):
        o, i = _read_varint(buf, i)
        if o == 0:
            offs.append(offs[k - 1] + lens[k - 1])
        else:
            offs.append(o - 1)
    return list(zip(ids, offs, lens, runs))


def read_pmtiles_header(path: str) -> dict:
    with open_ranged(path) as f:
        buf = f.read(_HDR)
    if buf[:7] != _MAGIC or buf[7] != 3:
        raise ValueError("not a PMTiles v3 file")
    (root_off, root_len, meta_off, meta_len, leaf_off, leaf_len,
     data_off, data_len, n_addressed, n_entries, n_contents) = struct.unpack_from("<11Q", buf, 8)
    clustered, internal_c, tile_c, tile_t, zmin, zmax = buf[96:102]
    min_lon, min_lat, max_lon, max_lat = struct.unpack_from("<4i", buf, 102)
    center_z = buf[118]
    center_lon, center_lat = struct.unpack_from("<2i", buf, 119)
    return {
        "root": (root_off, root_len), "meta": (meta_off, meta_len),
        "leaves": (leaf_off, leaf_len), "data": (data_off, data_len),
        "addressed_tiles": n_addressed, "tile_entries": n_entries,
        "tile_contents": n_contents, "clustered": bool(clustered),
        "internal_compression": _COMP_INV[internal_c],
        "tile_compression": _COMP_INV[tile_c],
        "tile_type": _TILE_TYPE_INV.get(tile_t, "bin"),
        "zoom_min": zmin, "zoom_max": zmax,
        "bbox": [min_lon / 1e7, min_lat / 1e7, max_lon / 1e7, max_lat / 1e7],
        "center": (center_z, center_lon / 1e7, center_lat / 1e7),
    }


def _internal_decompress(data: bytes, codec: str) -> bytes:
    if codec == "none":
        return data
    if codec == "gzip":
        return gzip.decompress(data)
    from versatiles_rs_spark.functions.compression import decompress

    return decompress(data, codec)


def read_pmtiles(spark: SparkSession, path: str) -> DataFrame:
    """.pmtiles -> tile table DataFrame; entry ranges scanned in parallel."""
    from versatiles_rs_spark.operators.convert import TILE_SCHEMA
    from versatiles_rs_spark.tile_math.hilbert import hilbert_to_coord_np

    path = path if is_url(path) else os.path.abspath(path)
    head = read_pmtiles_header(path)
    ic = head["internal_compression"]
    with open_ranged(path) as f:
        f.seek(head["root"][0])
        root = _parse_dir(_internal_decompress(f.read(head["root"][1]), ic))
        entries: list[tuple[int, int, int, int]] = []
        for tid, off, ln, rl in root:
            if rl == 0:  # leaf pointer: offset is relative to the leaf section
                f.seek(head["leaves"][0] + off)
                entries.extend(_parse_dir(_internal_decompress(f.read(ln), ic)))
            else:
                entries.append((tid, off, ln, rl))
    if not entries:
        return spark.createDataFrame([], TILE_SCHEMA)
    fmt = head["tile_type"]
    comp = head["tile_compression"]
    data_off = head["data"][0]

    # expand run-lengths, then split into contiguous chunks per task
    rows = []
    for tid, off, ln, rl in entries:
        for k in range(max(rl, 1)):
            rows.append((tid + k, off, ln))
    pdf = pd.DataFrame(rows, columns=["tile_id", "off", "len"])
    n_slices = max(1, min(len(pdf), spark.sparkContext.defaultParallelism * 2))
    pdf["slice"] = (np.arange(len(pdf)) * n_slices) // len(pdf)
    edf = spark.createDataFrame(pdf).repartition(n_slices, "slice")

    def scan(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with open_ranged(path) as f:
            for b in it:
                if b.empty:
                    continue
                z, x, y = hilbert_to_coord_np(b["tile_id"].values.astype(np.int64))
                blobs = []
                for off, ln in zip(b["off"].values, b["len"].values):
                    f.seek(data_off + int(off))
                    blobs.append(f.read(int(ln)))
                yield pd.DataFrame(
                    {
                        "z": z.astype(np.int32), "x": x, "y": y,
                        "format": fmt, "compression": comp,
                        "tile": blobs, "n_features": 0,
                    }
                )

    return edf.mapInPandas(scan, TILE_SCHEMA)


def lookup_tile(path: str, z: int, x: int, y: int,
                accepted: list[str] | None = None) -> tuple[bytes, str] | None:
    """PMTiles point lookup — the reference's serve/read path
    (reader.rs:74-105): binary-search the root directory by tile_id,
    follow at most one leaf pointer, read one byte range. O(log n_entries)
    with three bounded reads; never scans the container."""
    import bisect

    from versatiles_rs_spark.functions.compression import optimize_compression
    from versatiles_rs_spark.tile_math.hilbert import hilbert_index_np

    if not (0 <= x < (1 << z) and 0 <= y < (1 << z)):
        return None
    head = read_pmtiles_header(path)
    ic = head["internal_compression"]
    tid = int(hilbert_index_np(z, np.array([x]), np.array([y]))[0])

    def find(entries, target):
        keys = [e[0] for e in entries]
        i = bisect.bisect_right(keys, target) - 1
        return entries[i] if i >= 0 else None

    with open_ranged(path) as f:
        f.seek(head["root"][0])
        root = _parse_dir(_internal_decompress(f.read(head["root"][1]), ic))
        hit = find(root, tid)
        if hit is None:
            return None
        e_tid, off, ln, rl = hit
        if rl == 0:  # leaf directory pointer
            f.seek(head["leaves"][0] + off)
            leaf = _parse_dir(_internal_decompress(f.read(ln), ic))
            hit = find(leaf, tid)
            if hit is None:
                return None
            e_tid, off, ln, rl = hit
        if not (e_tid <= tid < e_tid + max(rl, 1)):
            return None
        f.seek(head["data"][0] + off)
        blob = f.read(ln)
    comp = head["tile_compression"]
    if accepted is not None:
        blob, comp = optimize_compression(blob, comp, accepted)
    return blob, comp


def write_pmtiles(tiles: DataFrame, path: str, metadata: dict | None = None) -> dict:
    """Tile table -> .pmtiles (clustered, Hilbert-ordered, gzip internals).

    Returns {"tiles": n, "entries": m, "leaves": k}."""
    from versatiles_rs_spark.tile_math.hilbert import hilbert_index_np

    first = tiles.select("format", "compression").first()
    if first is None:
        raise ValueError("write_pmtiles: empty tile table")
    fmt, comp = first["format"], first["compression"]
    if fmt not in _TILE_TYPE:
        raise ValueError(f"unsupported tile format {fmt!r} for pmtiles")
    stats = tiles.agg(
        F.min("z").alias("zmin"), F.max("z").alias("zmax"),
        F.countDistinct("format", "compression").alias("n_combos"),
    ).first()
    if stats["n_combos"] != 1:
        raise ValueError("write_pmtiles: all tiles must share one format+compression")

    def add_tid(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in it:
            out = b.copy()
            tids = np.empty(len(b), dtype=np.int64)
            for z in np.unique(b["z"].values):
                m = b["z"].values == z
                tids[m] = hilbert_index_np(int(z), b["x"].values[m], b["y"].values[m])
            out["tile_id"] = tids
            yield out

    from pyspark.sql.types import LongType, StructField, StructType

    base = tiles.select("z", "x", "y", "tile")
    schema = StructType(list(base.schema.fields) + [StructField("tile_id", LongType())])
    ordered = base.mapInPandas(add_tid, schema).orderBy("tile_id")

    tile_buf = bytearray()
    entries: list[tuple[int, int, int, int]] = []  # tid, off, len, run
    dedup: dict[bytes, tuple[int, int]] = {}
    n_tiles = 0
    n_contents = 0
    bbox = None
    for r in ordered.toLocalIterator():
        tid = int(r["tile_id"])
        blob = bytes(r["tile"])
        n_tiles += 1
        hit = dedup.get(blob)
        if hit is None:
            off, ln = len(tile_buf), len(blob)
            tile_buf += blob
            n_contents += 1
            if len(blob) < 1000:
                dedup[blob] = (off, ln)
        else:
            off, ln = hit
        if entries and entries[-1][0] + entries[-1][3] == tid and \
                entries[-1][1] == off and entries[-1][2] == ln:
            last = entries[-1]
            entries[-1] = (last[0], last[1], last[2], last[3] + 1)
        else:
            entries.append((tid, off, ln, 1))

    root_raw = _serialize_dir(entries)
    root_blob = gzip.compress(root_raw, 9, mtime=0)
    leaves_blob = b""
    n_leaves = 0
    if len(root_blob) > _ROOT_BUDGET:
        # split into leaves of equal entry count; root points at each leaf
        per_leaf = 4096
        leaf_ptrs = []
        parts = []
        off = 0
        for i in range(0, len(entries), per_leaf):
            chunk = entries[i : i + per_leaf]
            blob = gzip.compress(_serialize_dir(chunk), 9, mtime=0)
            leaf_ptrs.append((chunk[0][0], off, len(blob), 0))
            parts.append(blob)
            off += len(blob)
        leaves_blob = b"".join(parts)
        n_leaves = len(parts)
        root_blob = gzip.compress(_serialize_dir(leaf_ptrs), 9, mtime=0)

    meta = {"name": "versatiles-rs-spark export"}
    meta.update(metadata or {})
    meta_blob = gzip.compress(json.dumps(meta, sort_keys=True).encode(), 9, mtime=0)

    # bbox from tile coverage at max zoom
    from versatiles_rs_spark.tile_math.coords import tile_geo_bbox_np

    zmax = int(stats["zmax"])
    ext = tiles.filter(F.col("z") == zmax).agg(
        F.min("x").alias("x0"), F.max("x").alias("x1"),
        F.min("y").alias("y0"), F.max("y").alias("y1"),
    ).first()
    w, s, _, _ = tile_geo_bbox_np(zmax, np.array([ext["x0"]]), np.array([ext["y1"]]))
    _, _, e, n = tile_geo_bbox_np(zmax, np.array([ext["x1"]]), np.array([ext["y0"]]))
    bbox = [float(w[0]), float(s[0]), float(e[0]), float(n[0])]

    root_off = _HDR
    meta_off = root_off + len(root_blob)
    leaf_off = meta_off + len(meta_blob)
    data_off = leaf_off + len(leaves_blob)

    header = bytearray()
    header += _MAGIC
    header.append(3)
    header += struct.pack(
        "<11Q",
        root_off, len(root_blob), meta_off, len(meta_blob),
        leaf_off, len(leaves_blob), data_off, len(tile_buf),
        n_tiles, len(entries), n_contents,
    )
    header.append(1)  # clustered
    header.append(_COMP["gzip"])  # internal compression
    header.append(_COMP.get(comp, 0))
    header.append(_TILE_TYPE[fmt])
    header.append(int(stats["zmin"]))
    header.append(zmax)
    header += struct.pack(
        "<4i",
        round(bbox[0] * 1e7), round(bbox[1] * 1e7),
        round(bbox[2] * 1e7), round(bbox[3] * 1e7),
    )
    header.append(int(stats["zmin"]))  # center zoom
    header += struct.pack(
        "<2i",
        round((bbox[0] + bbox[2]) / 2 * 1e7), round((bbox[1] + bbox[3]) / 2 * 1e7),
    )
    assert len(header) == _HDR, len(header)
    with open(path, "wb") as f:
        f.write(header)
        f.write(root_blob)
        f.write(meta_blob)
        f.write(leaves_blob)
        f.write(tile_buf)
    return {"tiles": n_tiles, "entries": len(entries), "leaves": n_leaves}