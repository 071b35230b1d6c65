"""Tar tile-container ingest + export (container/tar/{reader,sink}.rs).

Entries named ``{z}/{x}/{y}.<format>[.<compression>]`` become tile rows
(tar/reader.rs:73-92 path grammar). The driver scans only the tar INDEX
(member name + offset + size — tarfile reads headers, not data); executors
then read their member byte ranges directly from the (decompressed) tar.

A ``.tar.gz``/``.tgz`` archive is decompressed once to a scratch file
first: gzip streams don't support random access, and the reference reads
tars fully on one node too — the win here is that the tile BYTES are read
by executors in parallel afterwards.
"""

from __future__ import annotations

import gzip
import os
import shutil
import tarfile
import tempfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_EXT_FORMAT = {
    "png": ("png", "none"), "jpg": ("jpg", "none"), "jpeg": ("jpg", "none"),
    "webp": ("webp", "none"), "avif": ("avif", "none"),
    "pbf": ("mvt", "none"), "mvt": ("mvt", "none"),
    "json": ("json", "none"), "geojson": ("geojson", "none"),
}
_EXT_COMPRESSION = {"gz": "gzip", "br": "brotli", "zst": "zstd"}


def _parse_tile_name(name: str) -> tuple[int, int, int, str, str] | None:
    """{z}/{x}/{y}.<format>[.<compression>] -> (z, x, y, fmt, codec)."""
    parts = name.strip("/").split("/")
    if len(parts) != 3:
        return None
    try:
        z, x = int(parts[0]), int(parts[1])
    except ValueError:
        return None
    fname = parts[2].split(".")
    if len(fname) < 2:
        return None
    codec = "none"
    ext = fname[-1].lower()
    if ext in _EXT_COMPRESSION and len(fname) >= 3:
        codec = _EXT_COMPRESSION[ext]
        ext = fname[-2].lower()
    if ext not in _EXT_FORMAT:
        return None
    fmt, default_codec = _EXT_FORMAT[ext]
    try:
        y = int(fname[0])
    except ValueError:
        return None
    return z, x, y, fmt, (codec if codec != "none" else default_codec)


def read_tar(spark: SparkSession, path: str, scratch_dir: str | None = None) -> DataFrame:
    """tar / tar.gz of z/x/y.<ext> entries -> tile table DataFrame."""
    from versatiles_rs_spark.operators.convert import TILE_SCHEMA

    path = os.path.abspath(path)
    plain = path
    if path.endswith((".tar.gz", ".tgz")):
        fd, plain = tempfile.mkstemp(
            suffix=".tar", dir=scratch_dir or tempfile.gettempdir()
        )
        with os.fdopen(fd, "wb") as out, gzip.open(path, "rb") as src:
            shutil.copyfileobj(src, out)
    elif path.endswith(".tar.br"):
        # brotli-compressed archives (the reference ships static.tar.br):
        # decodable since round 3 via the full RFC 7932 reader
        from versatiles_rs_spark.functions.compression import decompress

        fd, plain = tempfile.mkstemp(
            suffix=".tar", dir=scratch_dir or tempfile.gettempdir()
        )
        with open(path, "rb") as src, os.fdopen(fd, "wb") as out:
            out.write(decompress(src.read(), "brotli"))

    index = []
    with tarfile.open(plain, "r:") as tf:
        for m in tf:
            if not m.isfile():
                continue
            parsed = _parse_tile_name(m.name)
            if parsed is None:
                continue
            z, x, y, fmt, codec = parsed
            index.append((z, x, y, fmt, codec, m.offset_data, m.size))
    if not index:
        return spark.createDataFrame([], TILE_SCHEMA)
    idf = spark.createDataFrame(
        pd.DataFrame(index, columns=["z", "x", "y", "format", "compression", "off", "size"])
    ).repartition(max(1, min(len(index), spark.sparkContext.defaultParallelism)))

    def scan(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with open(plain, "rb") as f:
            for pdf in it:
                blobs = []
                for off, size in zip(pdf["off"].values, pdf["size"].values):
                    f.seek(int(off))
                    blobs.append(f.read(int(size)))
                out = pdf[["z", "x", "y", "format", "compression"]].copy()
                out["tile"] = blobs
                out["n_features"] = 0
                yield out

    return idf.mapInPandas(scan, TILE_SCHEMA)


def write_tar(tiles: DataFrame, path: str) -> dict:
    """Tile table -> tar of z/x/y.<ext> entries (container/tar/sink.rs).
    MVT tiles get the conventional .pbf name; gzip transport keeps a .gz
    suffix so the reader round-trips the codec. A .tar.gz/.tgz/.tar.br
    path compresses the archive (gzip mtime 0 / real brotli) after the
    deterministic plain write."""
    outer = None
    final_path = path
    if path.endswith((".tar.gz", ".tgz")):
        outer = "gzip"
    elif path.endswith(".tar.br"):
        outer = "brotli"
    if outer:
        fd, path = tempfile.mkstemp(suffix=".tar")
        os.close(fd)
    fmt_ext = {"mvt": "pbf"}
    n = 0
    with tarfile.open(path, "w") as tf:
        for r in tiles.select("z", "x", "y", "format", "compression", "tile").toLocalIterator():
            ext = fmt_ext.get(r["format"], r["format"])
            name = f"{int(r['z'])}/{int(r['x'])}/{int(r['y'])}.{ext}"
            if r["compression"] == "gzip":
                name += ".gz"
            blob = bytes(r["tile"])
            info = tarfile.TarInfo(name)
            info.size = len(blob)
            info.mtime = 0  # deterministic bytes
            import io

            tf.addfile(info, io.BytesIO(blob))
            n += 1
    if outer:
        from versatiles_rs_spark.functions.compression import compress

        with open(path, "rb") as f:
            raw = f.read()
        os.unlink(path)
        with open(final_path, "wb") as f:
            f.write(compress(raw, outer))
    return {"tiles": n}
