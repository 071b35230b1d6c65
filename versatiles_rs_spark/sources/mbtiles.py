"""MBTiles (SQLite) container ingest + export — stdlib ``sqlite3`` only.

Reference parity (versatiles_container/src/container/mbtiles):
- reader.rs:354-380 — tiles are stored in TMS row order; XYZ <-> TMS via
  ``tile_row = 2^z - 1 - y``.
- reader.rs:158-216 — format/compression derive from the ``format`` metadata
  key per the MBTiles 1.3 spec: png/jpg/webp are uncompressed, pbf is
  gzipped MVT; missing/unknown format is an error.
- writer.rs:85-121 — schema ``metadata(name, value)`` +
  ``tiles(zoom_level, tile_column, tile_row, tile_data)`` with a unique
  coordinate index; inserts flip XYZ -> TMS.

Scale design: an .mbtiles file is a single SQLite database, so INGEST
parallelizes by rowid range — the driver reads only min/max rowid, then
each executor task opens the file read-only and scans its slice (SQLite
readers don't block each other). EXPORT is inherently single-file; the
writer streams partitions through the driver with ``toLocalIterator`` (one
partition in memory at a time) inside batched transactions — the same
"sequential final assembly" the reference performs, without ever
materializing the full tile set.
"""

from __future__ import annotations

import json
import os
import sqlite3
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# MBTiles 1.3 `format` metadata -> (engine format, transport compression)
_FORMAT_IN = {
    "png": ("png", "none"),
    "jpg": ("jpg", "none"),
    "webp": ("webp", "none"),
    "pbf": ("mvt", "gzip"),
}
_FORMAT_OUT = {v: k for k, v in _FORMAT_IN.items()}


def read_mbtiles_metadata(path: str) -> dict[str, str]:
    """The raw ``metadata`` table as a dict (reader.rs:150)."""
    with sqlite3.connect(f"file:{os.path.abspath(path)}?mode=ro", uri=True) as conn:
        rows = conn.execute("SELECT name, value FROM metadata").fetchall()
    return {k: v for k, v in rows}


def mbtiles_tilejson(path: str) -> dict:
    """Metadata merged into a TileJSON-style dict (reader.rs:158-216)."""
    meta = read_mbtiles_metadata(path)
    tj: dict = {"tilejson": "3.0.0"}
    for key in ("name", "attribution", "description", "version", "type", "license", "author"):
        if key in meta:
            tj[key] = meta[key]
    if "bounds" in meta:
        tj["bounds"] = [float(v) for v in meta["bounds"].split(",")]
    if "center" in meta:
        tj["center"] = [float(v) for v in meta["center"].split(",")]
    if "minzoom" in meta:
        tj["minzoom"] = int(meta["minzoom"])
    if "maxzoom" in meta:
        tj["maxzoom"] = int(meta["maxzoom"])
    if "json" in meta:
        embedded = json.loads(meta["json"])
        if "vector_layers" in embedded:
            tj["vector_layers"] = embedded["vector_layers"]
    return tj


def read_mbtiles(spark: SparkSession, path: str, slices_per_core: int = 4) -> DataFrame:
    """.mbtiles -> tile table DataFrame (z, x, y, format, compression, tile,
    n_features), XYZ coordinates (TMS y-flip applied, reader.rs:354-358).

    Distributed: N rowid slices scanned in parallel, each task opening the
    SQLite file read-only. The driver touches only ``metadata`` and the
    min/max rowid."""
    from versatiles_rs_spark.operators.convert import TILE_SCHEMA

    path = os.path.abspath(path)
    meta = read_mbtiles_metadata(path)
    if "format" not in meta:
        raise ValueError(f"mbtiles file {path} does not specify tile format")
    if meta["format"] not in _FORMAT_IN:
        raise ValueError(f"unknown tile format '{meta['format']}' in mbtiles metadata")
    fmt, compression = _FORMAT_IN[meta["format"]]

    with sqlite3.connect(f"file:{path}?mode=ro", uri=True) as conn:
        row = conn.execute("SELECT min(rowid), max(rowid) FROM tiles").fetchone()
    lo, hi = row
    if lo is None:
        return spark.createDataFrame([], TILE_SCHEMA)

    n_slices = max(1, spark.sparkContext.defaultParallelism * slices_per_core)
    span = (hi - lo + 1 + n_slices - 1) // n_slices
    bounds = [(lo + i * span, min(hi, lo + (i + 1) * span - 1)) for i in range(n_slices)]
    bounds = [(a, b) for a, b in bounds if a <= b]
    ranges = spark.createDataFrame(pd.DataFrame(bounds, columns=["lo", "hi"])).repartition(
        len(bounds)
    )

    def scan(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        conn = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
        try:
            for pdf in it:
                for _, r in pdf.iterrows():
                    rows = conn.execute(
                        "SELECT zoom_level, tile_column, tile_row, tile_data "
                        "FROM tiles WHERE rowid >= ? AND rowid <= ?",
                        (int(r["lo"]), int(r["hi"])),
                    ).fetchall()
                    if not rows:
                        continue
                    out = pd.DataFrame(rows, columns=["z", "x", "tms_y", "tile"])
                    out["y"] = (2 ** out["z"].astype("int64")) - 1 - out["tms_y"]  # TMS -> XYZ
                    out["format"] = fmt
                    out["compression"] = compression
                    out["n_features"] = 0
                    yield out[
                        ["z", "x", "y", "format", "compression", "tile", "n_features"]
                    ]
        finally:
            conn.close()

    return ranges.mapInPandas(scan, TILE_SCHEMA)


def lookup_tile(path: str, z: int, x: int, y: int,
                accepted: list[str] | None = None) -> tuple[bytes, str] | None:
    """MBTiles point lookup (serve path): one indexed SQLite SELECT with
    the XYZ->TMS flip — O(log n) via the tiles table index, no scan."""
    from versatiles_rs_spark.functions.compression import optimize_compression

    meta = read_mbtiles_metadata(path)
    _fmt, comp = _FORMAT_IN[meta["format"]]
    tms_y = (1 << z) - 1 - y
    with sqlite3.connect(f"file:{os.path.abspath(path)}?mode=ro", uri=True) as conn:
        row = conn.execute(
            "SELECT tile_data FROM tiles WHERE zoom_level=? AND tile_column=? AND tile_row=?",
            (z, x, tms_y),
        ).fetchone()
    if row is None:
        return None
    blob = bytes(row[0])
    if accepted is not None:
        blob, comp = optimize_compression(blob, comp, accepted)
    return blob, comp


def write_mbtiles(
    tiles: DataFrame,
    path: str,
    metadata: dict[str, str] | None = None,
    batch_rows: int = 10_000,
) -> dict:
    """Tile table -> .mbtiles (writer.rs:85-121 schema + XYZ->TMS flip).

    All tiles must share one (format, compression) pair supported by the
    spec. Streams partitions through the driver (toLocalIterator) in
    batched transactions; peak driver memory is one partition.
    Returns {"tiles": n, "format": mbtiles_format}."""
    first = tiles.select("format", "compression").first()
    if first is None:
        raise ValueError("write_mbtiles: empty tile table")
    key = (first["format"], first["compression"])
    if key not in _FORMAT_OUT:
        raise ValueError(
            f"combination of format ({key[0]}) and compression ({key[1]}) is not "
            "supported. MBTiles supports only uncompressed jpg/png/webp or gzipped pbf"
        )
    mb_format = _FORMAT_OUT[key]

    stats = tiles.agg(
        F.count("*").alias("n"),
        F.min("z").alias("minz"),
        F.max("z").alias("maxz"),
        F.countDistinct("format", "compression").alias("n_combos"),
    ).first()
    if stats["n_combos"] != 1:
        raise ValueError("write_mbtiles: all tiles must share one format+compression")

    if os.path.exists(path):
        os.remove(path)
    conn = sqlite3.connect(path)
    try:
        conn.executescript(
            "CREATE TABLE metadata (name TEXT, value TEXT, UNIQUE (name));"
            "CREATE TABLE tiles (zoom_level INTEGER, tile_column INTEGER, "
            "tile_row INTEGER, tile_data BLOB, "
            "UNIQUE (zoom_level, tile_column, tile_row));"
            "CREATE UNIQUE INDEX tile_index on tiles "
            "(zoom_level, tile_column, tile_row);"
        )
        meta = {
            "format": mb_format,
            "type": "baselayer",
            "version": "3.0",
            "minzoom": str(stats["minz"]),
            "maxzoom": str(stats["maxz"]),
        }
        meta.update(metadata or {})
        conn.executemany(
            "INSERT OR REPLACE INTO metadata (name, value) VALUES (?, ?)",
            sorted(meta.items()),
        )
        batch: list[tuple] = []
        n = 0
        for r in tiles.select("z", "x", "y", "tile").toLocalIterator():
            z, x, y = int(r["z"]), int(r["x"]), int(r["y"])
            batch.append((z, x, (1 << z) - 1 - y, bytes(r["tile"])))  # XYZ -> TMS
            if len(batch) >= batch_rows:
                conn.executemany(
                    "INSERT INTO tiles (zoom_level, tile_column, tile_row, tile_data) "
                    "VALUES (?, ?, ?, ?)",
                    batch,
                )
                conn.commit()
                n += len(batch)
                batch = []
        if batch:
            conn.executemany(
                "INSERT INTO tiles (zoom_level, tile_column, tile_row, tile_data) "
                "VALUES (?, ?, ?, ?)",
                batch,
            )
            conn.commit()
            n += len(batch)
    finally:
        conn.close()
    return {"tiles": n, "format": mb_format}
