""".versatiles container ingest + export (the reference's own format).

Byte-level parity with versatiles_container/src/container/versatiles:
- file header (types/file_header.rs:13-130): 66 bytes BE — magic
  ``versatiles_v02``, tile-type byte, compression byte, zoom range, bbox as
  i32 degrees*1e7, then (offset,length) u64 pairs for the metadata blob and
  the block index.
- block index (types/block_index.rs:15): concatenated 33-byte block
  definitions (types/block_definition.rs:60-140), brotli-compressed.
- block definition: u8 level, u32 block x/y (tile coords / 256), u8
  block-relative coverage x_min/y_min/x_max/y_max, u64 absolute tiles
  offset, u64 tiles length, u32 index length (tile index follows the tile
  data contiguously).
- tile index (types/tile_index.rs:14): per covered coordinate in row-major
  order, u64 offset RELATIVE to the block's tile segment + u32 length,
  brotli-compressed; (0,0) = absent tile.
- small tiles (< 1000 bytes) deduplicate within a block by content
  (types/block_builder.rs:103-110).
- metadata = TileJSON compressed with the file's TILE compression
  (writer.rs:168-177); indexes are always brotli.

Codec note (round 3): indexes are real brotli both ways. Writes use the
system libbrotli when present (q10/lgwin19, the reference's settings)
with spec-valid stored-mode as fallback; reads accept ANY brotli stream —
entropy-coded reference-produced indexes decode through the system lib or
the pure-python RFC 7932 decoder (functions/brotli_dec.py). The round-2
``UnsupportedCompressedStream`` on reference-produced containers is gone.

Scale design: INGEST distributes by block — the driver reads only the 66-
byte header and the (small) block index; each executor task opens the file,
reads its block's contiguous tile segment in one IO, and slices per tile.
EXPORT is a single-file sequential assembly (like the reference): tiles
stream through the driver sorted by (z, block, row-major), one block at a
time in memory.
"""

from __future__ import annotations

import json
import os
import struct
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from versatiles_rs_spark.functions.compression import BROTLI, compress, decompress

from versatiles_rs_spark.sources.ranged_io import is_url, open_ranged

_MAGIC = b"versatiles_v02"
_HEADER_LEN = 66
_BBOX_SCALE = 10_000_000.0

_TYPE_BYTE = {
    "bin": 0x00,
    "png": 0x10, "jpg": 0x11, "webp": 0x12, "avif": 0x13, "svg": 0x14,
    "mvt": 0x20, "geojson": 0x21, "topojson": 0x22, "json": 0x23,
}
_TYPE_NAME = {v: k for k, v in _TYPE_BYTE.items()}
_COMP_BYTE = {"none": 0, "gzip": 1, "brotli": 2, "zstd": 3}
_COMP_NAME = {v: k for k, v in _COMP_BYTE.items()}


@dataclass
class _Block:
    level: int
    bx: int
    by: int
    x_min: int  # block-relative coverage
    y_min: int
    x_max: int
    y_max: int
    tiles_offset: int  # absolute
    tiles_length: int
    index_offset: int
    index_length: int

    @property
    def width(self) -> int:
        return self.x_max - self.x_min + 1

    def count(self) -> int:
        return self.width * (self.y_max - self.y_min + 1)


def _parse_header(buf: bytes) -> dict:
    if buf[:14] != _MAGIC:
        raise ValueError("not a versatiles_v02 container")
    tile_type, comp, zmin, zmax = buf[14], buf[15], buf[16], buf[17]
    bbox = struct.unpack(">4i", buf[18:34])
    meta_off, meta_len, blocks_off, blocks_len = struct.unpack(">4Q", buf[34:66])
    if tile_type not in _TYPE_NAME:
        raise ValueError(f"unknown tile type byte 0x{tile_type:02x}")
    return {
        "format": _TYPE_NAME[tile_type],
        "compression": _COMP_NAME[comp],
        "zoom_min": zmin,
        "zoom_max": zmax,
        "bbox": [b / _BBOX_SCALE for b in bbox],
        "meta_range": (meta_off, meta_len),
        "blocks_range": (blocks_off, blocks_len),
    }


def _parse_block_index(raw: bytes) -> list[_Block]:
    if len(raw) % 33 != 0:
        raise ValueError("block index length not a multiple of 33")
    blocks = []
    for i in range(0, len(raw), 33):
        level, x, y = struct.unpack(">BII", raw[i : i + 9])
        x_min, y_min, x_max, y_max = raw[i + 9 : i + 13]
        offset, tiles_len = struct.unpack(">QQ", raw[i + 13 : i + 29])
        index_len = struct.unpack(">I", raw[i + 29 : i + 33])[0]
        blocks.append(
            _Block(level, x, y, x_min, y_min, x_max, y_max,
                   offset, tiles_len, offset + tiles_len, index_len)
        )
    return blocks


def read_versatiles_header(path: str) -> dict:
    with open_ranged(path) as f:
        head = _parse_header(f.read(_HEADER_LEN))
        moff, mlen = head["meta_range"]
        if mlen:
            f.seek(moff)
            head["tilejson"] = json.loads(
                decompress(f.read(mlen), head["compression"]).decode("utf-8")
            )
    return head


def read_versatiles(spark: SparkSession, path: str) -> DataFrame:
    """.versatiles -> tile table DataFrame; one executor task per block."""
    from versatiles_rs_spark.operators.convert import TILE_SCHEMA

    path = path if is_url(path) else os.path.abspath(path)
    head = read_versatiles_header(path)
    fmt, comp = head["format"], head["compression"]
    boff, blen = head["blocks_range"]
    if blen == 0:
        return spark.createDataFrame([], TILE_SCHEMA)
    with open_ranged(path) as f:
        f.seek(boff)
        blocks = _parse_block_index(decompress(f.read(blen), BROTLI))
    rows = [
        (b.level, b.bx, b.by, b.x_min, b.y_min, b.x_max, b.y_max,
         b.tiles_offset, b.tiles_length, b.index_offset, b.index_length)
        for b in blocks
    ]
    bdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=[
            "level", "bx", "by", "x_min", "y_min", "x_max", "y_max",
            "tiles_offset", "tiles_length", "index_offset", "index_length",
        ])
    ).repartition(max(1, min(len(rows), spark.sparkContext.defaultParallelism * 2)))

    def scan(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with open_ranged(path) as f:
            for pdf in it:
                for _, r in pdf.iterrows():
                    f.seek(int(r["index_offset"]))
                    idx = decompress(f.read(int(r["index_length"])), BROTLI)
                    f.seek(int(r["tiles_offset"]))
                    seg = f.read(int(r["tiles_length"]))
                    width = int(r["x_max"]) - int(r["x_min"]) + 1
                    out = []
                    for i in range(0, len(idx), 12):
                        off, ln = struct.unpack(">QI", idx[i : i + 12])
                        if ln == 0:
                            continue
                        k = i // 12
                        x = int(r["bx"]) * 256 + int(r["x_min"]) + k % width
                        y = int(r["by"]) * 256 + int(r["y_min"]) + k // width
                        out.append(
                            (int(r["level"]), x, y, fmt, comp, seg[off : off + ln], 0)
                        )
                    if out:
                        yield pd.DataFrame(
                            out,
                            columns=["z", "x", "y", "format", "compression", "tile", "n_features"],
                        )

    return bdf.mapInPandas(scan, TILE_SCHEMA)


def lookup_tile(path: str, z: int, x: int, y: int,
                accepted: list[str] | None = None) -> tuple[bytes, str] | None:
    """The `versatiles serve` point-lookup path (SURVEY §3.3): header ->
    block index -> the ONE covering block's tile index -> the ONE tile's
    byte range. Three bounded reads + two seeks, independent of container
    size — O(1) like the reference's serve handler, never a scan.

    Returns (tile_bytes, compression) or None for an absent tile. When
    ``accepted`` (Accept-Encoding analog) is given, the blob is
    recompressed to the best accepted codec via optimize_compression
    (compression/functions.rs:54 semantics)."""
    from versatiles_rs_spark.functions.compression import optimize_compression

    head = read_versatiles_header(path)
    boff, blen = head["blocks_range"]
    if blen == 0:
        return None
    with open_ranged(path) as f:
        f.seek(boff)
        blocks = _parse_block_index(decompress(f.read(blen), BROTLI))
        bx, by = x >> 8, y >> 8
        blk = next(
            (b for b in blocks if b.level == z and b.bx == bx and b.by == by), None
        )
        if blk is None:
            return None
        lx, ly = x & 255, y & 255
        if not (blk.x_min <= lx <= blk.x_max and blk.y_min <= ly <= blk.y_max):
            return None
        width = blk.x_max - blk.x_min + 1
        k = (ly - blk.y_min) * width + (lx - blk.x_min)
        f.seek(blk.index_offset)
        idx = decompress(f.read(blk.index_length), BROTLI)
        off, ln = struct.unpack(">QI", idx[12 * k : 12 * k + 12])
        if ln == 0:
            return None
        f.seek(blk.tiles_offset + off)
        blob = f.read(ln)
    comp = head["compression"]
    if accepted is not None:
        blob, comp = optimize_compression(blob, comp, accepted)
    return blob, comp


def write_versatiles(tiles: DataFrame, path: str, tilejson: dict | None = None) -> dict:
    """Tile table -> .versatiles container. Returns {"tiles": n, "blocks": m}.

    Tiles stream through the driver sorted by (z, block, row-major); one
    block (<= 256x256 tile ranges + its blob bytes) is in memory at a time.
    """
    from versatiles_rs_spark.tile_math.coords import tile_geo_bbox_np

    import numpy as np

    first = tiles.select("format", "compression").first()
    if first is None:
        raise ValueError("write_versatiles: empty tile table")
    fmt, comp = first["format"], first["compression"]
    if fmt not in _TYPE_BYTE:
        raise ValueError(f"unsupported tile format {fmt!r}")
    if comp not in _COMP_BYTE:
        raise ValueError(f"unsupported compression {comp!r}")

    stats = tiles.agg(
        F.min("z").alias("zmin"), F.max("z").alias("zmax"),
        F.countDistinct("format", "compression").alias("n_combos"),
        F.min("x").alias("xmin"), F.max("x").alias("xmax"),
        F.min("y").alias("ymin"), F.max("y").alias("ymax"),
    ).first()
    if stats["n_combos"] != 1:
        raise ValueError("write_versatiles: all tiles must share one format+compression")

    # geographic bbox from the max-zoom coverage
    zmax = int(stats["zmax"])
    ext = tiles.filter(F.col("z") == zmax).agg(
        F.min("x").alias("x0"), F.max("x").alias("x1"),
        F.min("y").alias("y0"), F.max("y").alias("y1"),
    ).first()
    w, s, _, _ = tile_geo_bbox_np(zmax, np.array([ext["x0"]]), np.array([ext["y1"]]))
    _, _, e, n = tile_geo_bbox_np(zmax, np.array([ext["x1"]]), np.array([ext["y0"]]))
    bbox = [float(w[0]), float(s[0]), float(e[0]), float(n[0])]

    tj = {"tilejson": "3.0.0", "type": "baselayer"}
    tj.update(tilejson or {})
    meta_blob = compress(json.dumps(tj, sort_keys=True).encode(), comp)

    ordered = tiles.select("z", "x", "y", "tile").orderBy(
        "z",
        F.call_function("div", F.col("x"), F.lit(256).cast("bigint")),
        F.call_function("div", F.col("y"), F.lit(256).cast("bigint")),
        "y", "x",
    )

    n_tiles = 0
    block_defs: list[bytes] = []
    with open(path, "wb") as f:
        f.write(b"\x00" * _HEADER_LEN)  # placeholder header
        meta_off = f.tell()
        f.write(meta_blob)

        cur_key = None
        positions: list[tuple[int, int, int, int]] = []  # x, y, rel_off, len
        block_start = 0
        dedup: dict[bytes, tuple[int, int]] = {}

        def flush() -> None:
            nonlocal positions, dedup
            if not positions:
                return
            z, bx, by = cur_key
            x0 = min(p[0] for p in positions); x1 = max(p[0] for p in positions)
            y0 = min(p[1] for p in positions); y1 = max(p[1] for p in positions)
            width = x1 - x0 + 1
            count = width * (y1 - y0 + 1)
            idx = bytearray(b"\x00" * 12 * count)
            for x, y, off, ln in positions:
                k = (y - y0) * width + (x - x0)
                struct.pack_into(">QI", idx, 12 * k, off, ln)
            tiles_len = f.tell() - block_start
            index_blob = compress(bytes(idx), BROTLI)
            f.write(index_blob)
            block_defs.append(
                struct.pack(
                    ">BII4BQQI",
                    z, bx, by,
                    x0 - bx * 256, y0 - by * 256, x1 - bx * 256, y1 - by * 256,
                    block_start, tiles_len, len(index_blob),
                )
            )
            positions = []
            dedup = {}

        for r in ordered.toLocalIterator():
            z, x, y = int(r["z"]), int(r["x"]), int(r["y"])
            key = (z, x // 256, y // 256)
            if key != cur_key:
                flush()
                cur_key = key
                block_start = f.tell()
            blob = bytes(r["tile"])
            if len(blob) < 1000 and blob in dedup:
                off, ln = dedup[blob]
            else:
                off = f.tell() - block_start
                ln = len(blob)
                f.write(blob)
                if len(blob) < 1000:
                    dedup[blob] = (off, ln)
            positions.append((x, y, off, ln))
            n_tiles += 1
        flush()

        blocks_off = f.tell()
        blocks_blob = compress(b"".join(block_defs), BROTLI)
        f.write(blocks_blob)

        header = bytearray()
        header += _MAGIC
        header.append(_TYPE_BYTE[fmt])
        header.append(_COMP_BYTE[comp])
        header.append(int(stats["zmin"]))
        header.append(zmax)
        header += struct.pack(">4i", *(round(v * _BBOX_SCALE) for v in bbox))
        header += struct.pack(">QQ", meta_off, len(meta_blob))
        header += struct.pack(">QQ", blocks_off, len(blocks_blob))
        assert len(header) == _HEADER_LEN
        f.seek(0)
        f.write(header)
    return {"tiles": n_tiles, "blocks": len(block_defs)}